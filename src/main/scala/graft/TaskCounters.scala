package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated, SparkListenerTaskEnd, SparkListenerUnpersistRDD}
import org.apache.spark.storage.RDDBlockId

/** Per-query task / storage / JIT counters for the bench record — the
  * missing half of self-adjudication.
  *
  * The r14 driver record's lake_finder_pipeline row carried wall=79 s
  * cpu=906 s against a clean same-binary sweep at 27 s / 281 s: CPU
  * tripled WITH wall, so the "ambient load = inflated wall, flat cpu"
  * rule could not fire, and nothing in the record could say whether
  * the JVM (a) re-executed work (evicted cache → lineage recompute),
  * (b) re-read serialized blocks demoted to disk, (c) burned the
  * extra cycles in JIT recompilation storms, or (d) genuinely ran the
  * same work slower under memory-bandwidth/SMT contention. These
  * counters split those four:
  *
  *  - `tk_tasks` / `tk_in_mb` / `tk_sh_mb`: a recompute executes MORE
  *    tasks and re-reads input/shuffle bytes — same task count and
  *    bytes as the clean run rules (a) out.
  *  - `tk_cpu`: sum of task `executorCpuTime`. Compare with the
  *    query-level process-CPU: a gap (process ≫ task cpu) is
  *    driver-side burn — GC, JIT compiler threads, planner — while
  *    task-cpu inflation at equal task count is per-task slowdown
  *    (contention or deopt'd code), not extra work.
  *  - `tk_disk`: RDD block updates landing with a disk component —
  *    storage-pressure demotions (MEMORY_AND_DISK evicts to disk,
  *    not to recompute) plus deliberate _SER-to-disk writes; a
  *    driver-run row spiking here while the clean row is ~0 names
  *    repeated disk/deser traffic (b).
  *  - `tk_drop` / `tk_evict`: RDD blocks dropped from storage as
  *    reported by `SparkListenerBlockUpdated(level=NONE)`. Explicit
  *    unpersists travel the RemoveRdd RPC and post NO per-block
  *    updates (pinned by TaskCountersSpec), so these only fire on
  *    block-manager-initiated removals; `tk_evict` additionally
  *    excludes any rdd id seen in an unpersist event, as a second
  *    guard. A nonzero tk_evict is therefore an ACTUAL eviction,
  *    named and numbered (the r15 verdict ask).
  *  - `tk_spill_mb`: execution-memory spills (sort/agg/join).
  *  - `tk_jit` (Bench-level, from `CompilationMXBean`): JIT
  *    compilation-time delta — (c) shows up here and in the
  *    process-vs-task CPU gap.
  *
  * Listener events are delivered async; [[settle]] polls until the
  * task counter is stable so a drain cannot under-read the last stage.
  * All adders are thread-safe; reset() is only called between queries
  * when no job is running.
  */
final class TaskCounters extends SparkListener {
  private val tasks = new LongAdder
  private val cpuNs = new LongAdder
  private val bytesRead = new LongAdder
  private val shuffleBytes = new LongAdder
  private val spillBytes = new LongAdder
  private val diskWrites = new LongAdder
  // dropped-block rdd ids are QUEUED, not classified at event time:
  // an explicit unpersist posts its SparkListenerBlockUpdated(NONE)
  // events (from the block-manager master during removeRdd) BEFORE
  // the SparkListenerUnpersistRDD event, so classifying a drop when
  // it arrives would misread every explicit unpersist as an eviction.
  // snapshot() runs after settle() — with the unpersist set complete —
  // and classifies then.
  private val droppedRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
  private val unpersisted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  private val jitBean =
    java.lang.management.ManagementFactory.getCompilationMXBean
  private def jitMillis(): Long =
    if (jitBean != null && jitBean.isCompilationTimeMonitoringSupported)
      jitBean.getTotalCompilationTime
    else -1L
  @volatile private var jit0 = jitMillis()

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    tasks.increment()
    val m = e.taskMetrics
    if (m != null) {
      cpuNs.add(m.executorCpuTime)
      bytesRead.add(m.inputMetrics.bytesRead)
      shuffleBytes.add(m.shuffleReadMetrics.remoteBytesRead +
        m.shuffleReadMetrics.localBytesRead +
        m.shuffleWriteMetrics.bytesWritten)
      spillBytes.add(m.memoryBytesSpilled + m.diskBytesSpilled)
    }
  }

  override def onUnpersistRDD(e: SparkListenerUnpersistRDD): Unit = {
    unpersisted.add(e.rddId)
    ()
  }

  override def onBlockUpdated(e: SparkListenerBlockUpdated): Unit = {
    val info = e.blockUpdatedInfo
    info.blockId match {
      case RDDBlockId(rddId, _) =>
        if (!info.storageLevel.isValid) droppedRdds.add(rddId)
        else if (info.storageLevel.useDisk && info.diskSize > 0)
          diskWrites.increment()
      case _ => ()
    }
  }

  def reset(): Unit = {
    tasks.reset(); cpuNs.reset(); bytesRead.reset(); shuffleBytes.reset()
    spillBytes.reset(); diskWrites.reset(); droppedRdds.clear()
    unpersisted.clear()
    jit0 = jitMillis()
  }

  /** Poll until the async listener bus has delivered the window's
    * task-end events (two stable reads 100 ms apart), bounded at ~1 s.
    * Called AFTER the query's timer stops — drain lag is untimed.
    */
  def settle(): Unit = {
    var prev = -1L
    var spins = 0
    while (spins < 10 && tasks.sum() != prev) {
      prev = tasks.sum()
      Thread.sleep(100)
      spins += 1
    }
  }

  /** Counter snapshot as bench stage-map rows (values already
    * formatted — counts as integers-in-doubles, bytes as MB).
    */
  def snapshot(): Seq[(String, String)] = {
    def mb(b: Long): String =
      "%.1f".formatLocal(java.util.Locale.ROOT, b / 1048576.0)
    import scala.jdk.CollectionConverters._
    val droppedNow = droppedRdds.iterator().asScala.toSeq
    val evicted = droppedNow.count(id => !unpersisted.contains(id))
    Seq(
      "tk_tasks" -> tasks.sum().toString,
      "tk_cpu" -> "%.3f".formatLocal(java.util.Locale.ROOT, cpuNs.sum() / 1e9),
      "tk_in_mb" -> mb(bytesRead.sum()),
      "tk_sh_mb" -> mb(shuffleBytes.sum()),
      "tk_spill_mb" -> mb(spillBytes.sum()),
      "tk_disk" -> diskWrites.sum().toString,
      "tk_drop" -> droppedNow.size.toString,
      "tk_evict" -> evicted.toString) ++ {
      // JIT compiler-thread burn since reset() — recompile storms are
      // billed to process CPU but not to any task; this row plus the
      // (process cpu − tk_cpu) gap names them (failure mode (c))
      val j1 = jitMillis()
      if (jit0 >= 0 && j1 >= 0)
        Seq("tk_jit" -> "%.3f".formatLocal(java.util.Locale.ROOT,
          (j1 - jit0) / 1e3))
      else Seq.empty
    }
  }
}
