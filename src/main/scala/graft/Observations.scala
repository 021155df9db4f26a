package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Shared observe()-metric capture for the bench mains (Bench and
  * BenchOne). Metrics arrive on the ASYNC listener bus, possibly
  * after the triggering action returns and possibly more than once
  * (the noop write and any untimed count() both execute the observed
  * subtree), so correct capture needs all three disciplines Bench
  * evolved — round-13 review: BenchOne had re-implemented this with
  * none of them:
  *   - entries tagged by observe SOURCE name, and a drain that keeps
  *     only the sources DECLARED for the current query, so a late
  *     stray from the previous query is dropped, never misattributed;
  *   - the bounded wait short-circuits when a query declares no
  *     sources (no blind 2 s stall per undeclared query) and
  *     otherwise waits until every declared source has landed, not
  *     just the first arrival;
  *   - Number-only, null-skipping extraction (an observe() aggregate
  *     over zero rows yields null; a "k=null" record would poison
  *     the A/B parsers).
  */
object Observations {

  /** observe() sources each declared query emits. Queries absent here
    * drain instantly to an empty metric list.
    */
  val expected: Map[String, Set[String]] = Map(
    "llm_corpus_pipeline" -> Set("graft.corpus_in", "graft.corpus_out"),
    "llm_minhash_neardup" -> Set("graft.minhash_lsh"),
    "llm_dedup_clusters" -> Set("graft.minhash_lsh"),
    "llm_simhash_neardup" -> Set("graft.simhash_lsh", "graft.simhash_verify"),
    "llm_simhash_neardup_tight" ->
      Set("graft.simhash_lsh", "graft.simhash_verify"))

  /** Registers a listener on construction; one instance per main. */
  final class Capture(spark: SparkSession) {
    private val observed =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Any)]()

    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (obsName, row) =>
          row.schema.fieldNames.zip(row.toSeq).foreach { case (k, v) =>
            observed.add((obsName, k, v))
          }
        }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })

    /** Call before running a query so strays cannot carry over. */
    def clear(): Unit = observed.clear()

    /** Bounded wait (2 s) for every source `name` declares, then the
      * declared-source-only, Number-only metric list as
      * (field, value-string) pairs.
      */
    def drainFor(name: String): Seq[(String, String)] = {
      val want = expected.getOrElse(name, Set.empty)
      val deadline = System.nanoTime() + 2000000000L
      while (want.nonEmpty && System.nanoTime() < deadline && {
          val have = observed.iterator()
          val seen = scala.collection.mutable.Set[String]()
          while (have.hasNext) seen += have.next()._1
          !want.subsetOf(seen)
        }) Thread.sleep(20)
      val it = observed.iterator()
      val buf = scala.collection.mutable.ListBuffer[(String, String)]()
      while (it.hasNext) it.next() match {
        case (obs, k, v: Number) if want.contains(obs) =>
          buf += (k -> v.toString)
        case _ => ()
      }
      buf.toSeq.distinct
    }
  }
}
