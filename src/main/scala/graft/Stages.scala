package graft

import scala.collection.mutable

/** Wall-clock stage registry for pipeline diagnostics.
  *
  * The pipeline queries (lake_finder_pipeline, llm_corpus_pipeline)
  * execute through a handful of EAGER materialization barriers
  * (`localCheckpoint(true)` inside Dbscan/LakeFinder) — wrapping
  * those barriers with [[time]] yields true per-stage wall times with
  * zero added barriers. [[graft.Bench]] drains the registry after
  * each query and attaches the stage map to its JSON line, so a
  * driver-vs-builder timing spread is attributable to a stage from
  * the bench record alone.
  *
  * Thread-safety: timers may fire from the driver thread only (all
  * wrapped sites are driver-side constructions); the map is still
  * synchronized so a stray parallel caller cannot corrupt it.
  */
object Stages {
  private val acc = mutable.LinkedHashMap[String, Double]()

  /** Run `body`, adding its wall time (seconds) under `name`. */
  def time[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally synchronized {
      acc(name) = acc.getOrElse(name, 0.0) + (System.nanoTime() - t0) / 1e9
    }
  }

  /** Record an externally-measured value under `name` (seconds for
    * timings; plain counts ride the same channel — the bench record
    * formats all values with 3 decimals). Used by the streaming
    * runner to attach micro-batch / state-store attribution from
    * `StreamingQueryProgress`, the streaming analogue of the DBSCAN
    * stage timers.
    */
  def add(name: String, value: Double): Unit = synchronized {
    acc(name) = acc.getOrElse(name, 0.0) + value
  }

  /** Return and clear all accumulated stage times, insertion-ordered. */
  def drain(): Seq[(String, Double)] = synchronized {
    val r = acc.toSeq
    acc.clear()
    r
  }
}
