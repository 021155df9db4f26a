package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as raw ns longs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: the first job in a fresh JVM pays ~4-6 s of
    // classloading/codegen that would otherwise be billed to whichever
    // query sorts first (a10 absorbed it in rounds 2-4). One tiny scan
    // plus one tiny shuffle moves that cost out of every per-query
    // number.
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count().count()
    // Collect observe() metrics (QueryExecutionListener delivers them
    // on the async listener bus, possibly AFTER the action returns —
    // the drain below poll-waits only for queries known to emit).
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[(String, Any)]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (_, row) =>
          row.schema.fieldNames.zip(row.toSeq).foreach { case (k, v) =>
            observed.add((k, v))
          }
        }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    // queries that carry observe() metrics worth waiting for, and the
    // metric fields they emit (poll-wait bounded at 2 s)
    val observedFields = Map(
      "llm_corpus_pipeline" -> Set("docs_in", "docs_out"))
    // (name, seconds, ok, stages) — a failed query must NOT masquerade
    // as a fast timing (round-1 verdict "What's wrong" #4).
    // Materialize via the noop sink, NOT count(): under count() the
    // optimizer column-prunes the final projection, so projection-only
    // queries (f6_polar_stereo, llm_quality_score, ...) would be timed
    // as bare row-count scans with all their computed work elided.
    // The noop write evaluates every output column and discards rows.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      Stages.drain() // isolate this query's stage timers
      observed.clear()
      // settle the JVM between queries: eagerly-checkpointed
      // intermediates of the PREVIOUS query are only weakly
      // referenced, and their lazy cleanup otherwise lands as GC debt
      // on whichever query runs next (measured at sf1: llm_text_stats
      // read 69 s after the 63M-row simhash distinct vs 5.5 s in
      // isolation)
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      val want = observedFields.getOrElse(name, Set.empty)
      val deadline = System.nanoTime() + 2000000000L
      while (want.nonEmpty && System.nanoTime() < deadline && {
          val have = observed.iterator()
          val seen = scala.collection.mutable.Set[String]()
          while (have.hasNext) seen += have.next()._1
          !want.subsetOf(seen)
        }) Thread.sleep(20)
      val stages: Seq[(String, String)] =
        Stages.drain().map { case (k, v) =>
          k -> "%.3f".formatLocal(java.util.Locale.ROOT, v)
        } ++ {
          val it = observed.iterator()
          val buf = scala.collection.mutable.ListBuffer[(String, String)]()
          while (it.hasNext) { val (k, v) = it.next(); buf += (k -> v.toString) }
          buf.toSeq
        }
      (name, secs, ok, stages)
    }
    // The harness keeps only a ~4 KB tail of this process's output, so the
    // JSON line must stay well under that or it is truncated mid-line and
    // unparseable (rounds 1-4 all recorded parsed:null). Millisecond
    // precision + listing only FAILED names keeps ~70 queries under ~2.5 KB.
    def ms(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val failedNames = results.collect { case (k, _, false, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val failed = results.count(!_._3)
    val total = results.map(_._2).sum
    // per-stage diagnostics (timers from graft.Stages barriers +
    // observe() counters) for the queries that emit them — a couple
    // hundred bytes, kept inside the harness's ~4 KB output tail
    val stages = results.collect { case (k, _, _, st) if st.nonEmpty =>
      "\"" + k + "\":" + st.map { case (sk, sv) => "\"" + sk + "\":" + sv }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"failed":$failed,"failed_names":$failedNames,"stages":$stages,"sf":"$sfDir"}""")
    spark.stop()
  }
}
