package graft

/** Contracts of the bench-record adjudication counters ([[TaskCounters]])
  * and the per-stage CPU rows ([[Stages.time]]) — the machinery the
  * driver record uses to split "recomputed work" from "ambient
  * contention" without a builder cross-sweep.
  */
class TaskCountersSpec extends SparkSpec {

  test("Stages.time records wall AND a process-cpu row per stage") {
    Stages.drain()
    val r = Stages.time("probe_stage") {
      // burn a measurable slice of cpu so the _cpu row is nonzero
      var acc = 0L
      var i = 0
      while (i < 20000000) { acc += i * 31; i += 1 }
      acc
    }
    assert(r != 0L)
    val m = Stages.drain().toMap
    assert(m.contains("probe_stage"), s"wall row missing: $m")
    assert(m.contains("probe_stage_cpu"), s"cpu row missing: $m")
    assert(m("probe_stage") > 0.0)
    assert(m("probe_stage_cpu") > 0.0,
      "a cpu-bound stage must bill process cpu")
  }

  test("task counters: a real job bills tasks + task cpu; settle terminates") {
    val c = new TaskCounters
    spark.sparkContext.addSparkListener(c)
    try {
      c.reset()
      spark.range(0, 1000000, 1, 8)
        .selectExpr("sum(id * 3) as s").collect()
      c.settle()
      val m = c.snapshot().toMap
      assert(m("tk_tasks").toLong >= 8,
        s"8-partition job must bill >= 8 tasks: $m")
      assert(m("tk_cpu").toDouble >= 0.0)
      // no caching in this job: zero storage churn
      assert(m("tk_drop") == "0" && m("tk_evict") == "0", m.toString)
    } finally spark.sparkContext.removeSparkListener(c)
  }

  test("explicit unpersist is invisible to tk_drop/tk_evict (no false evictions)") {
    // measured contract this counter design rests on: removeRdd goes
    // through the RemoveRdd RPC, which does NOT post per-block
    // SparkListenerBlockUpdated events — only block-manager-initiated
    // status changes (storage-pressure evictions, disk demotions) do.
    // So a nonzero tk_evict in a bench record is a REAL eviction, not
    // the operator's own cache hygiene; the unpersisted-rdd-id
    // exclusion in snapshot() is a second guard on top.
    val c = new TaskCounters
    spark.sparkContext.addSparkListener(c)
    try {
      c.reset()
      val df = spark.range(0, 100000, 1, 4).selectExpr("id", "id * 2 as y")
        .persist()
      df.count()
      df.unpersist(true) // blocking: removal completes before settle
      c.settle()
      Thread.sleep(300) // let any trailing bus events land
      val m = c.snapshot().toMap
      assert(m("tk_drop") == "0",
        s"explicit unpersist must not surface as dropped blocks: $m")
      assert(m("tk_evict") == "0",
        s"an EXPLICIT unpersist must never read as an eviction: $m")
      // the cached blocks DID exist: the job billed tasks and the
      // memory write was visible as a block update (level valid)
      assert(m("tk_tasks").toLong >= 4, m.toString)
    } finally spark.sparkContext.removeSparkListener(c)
  }
}
