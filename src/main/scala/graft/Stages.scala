package graft

import scala.collection.mutable

/** Wall-clock + process-CPU stage registry for pipeline diagnostics.
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
  * [[time]] also records the stage's PROCESS-CPU delta under
  * `<name>_cpu`: stages are sequential driver-side barriers in a
  * single local-mode JVM, so the process-CPU delta across a stage
  * body bills that stage's executor threads (plus any concurrent
  * GC/JIT — which is the point: the r14 driver record's
  * lake_finder_pipeline tripled CPU vs a clean sweep of the SAME
  * binary, and wall alone could not say WHICH stage burned it). A
  * stage whose cpu/wall ratio collapses relative to its clean-run
  * ratio names itself as the ambient-contention victim; a stage whose
  * cpu grows with wall genuinely recomputed or recompiled — the
  * tk_* task counters in the bench record split those two.
  *
  * Thread-safety: timers may fire from the driver thread only (all
  * wrapped sites are driver-side constructions); the map is still
  * synchronized so a stray parallel caller cannot corrupt it.
  */
object Stages {
  private val acc = mutable.LinkedHashMap[String, Double]()
  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  /** Run `body`, adding its wall time (seconds) under `name` and its
    * process-CPU time (seconds, all threads) under `<name>_cpu`.
    */
  def time[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val c0 = osBean.getProcessCpuTime
    try body
    finally synchronized {
      val c1 = osBean.getProcessCpuTime
      acc(name) = acc.getOrElse(name, 0.0) + (System.nanoTime() - t0) / 1e9
      // getProcessCpuTime returns -1 where unsupported; skip the cpu
      // row rather than record garbage
      if (c0 >= 0 && c1 >= 0) {
        val k = name + "_cpu"
        acc(k) = acc.getOrElse(k, 0.0) + (c1 - c0) / 1e9
      }
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
