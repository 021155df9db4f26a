package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time a single declared query (args: name [name...]) on
  * SPARK_GRAFT_SF_DIR — for isolating per-query regressions without a
  * full Bench sweep.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shared hardened config (UTC, explainMode=simple, nanosAsLong,
    // shuffle partitions = worker threads) — see GraftSession
    val b = GraftSession.builder(s"local[$cpus]", cpus.toInt)
    // dev knob for partition-count experiments (see PERF.md)
    val spark = sys.env.get("SPARK_GRAFT_INIT_PARTS")
      .fold(b)(n => b.config(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_WARM=1: run Bench's untimed heavy-dataflow warmup
    // first — for A/B-ing cold-fork JIT cost against the warmed path
    if (sys.env.get("SPARK_GRAFT_WARM").contains("1")) {
      Bench.heavyWarmup(spark)
      Stages.drain()
    }
    val show = sys.env.get("SPARK_GRAFT_SHOW").contains("1")
    // capture observe() metrics so single-query probes report the same
    // candidate_pairs/key_blocks/dropped_* numbers as suite records —
    // via the SHARED [[Observations]] machinery (declared-source
    // filtering, no blind wait on undeclared queries, Number-only
    // extraction), not a re-implementation (round-13 review)
    val observations = new Observations.Capture(spark)
    // same task/storage adjudication rows as the full Bench (probes
    // at sf10 need to tell recompute/demotion from ambient load too)
    val counters = new TaskCounters
    spark.sparkContext.addSparkListener(counters)
    args.foreach { name =>
      observations.clear()
      counters.reset()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      // noop sink evaluates every output column (count() would let the
      // optimizer prune projection-only work — see Bench)
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      counters.settle()
      val tk = counters.snapshot().map { case (k, v) => s"$k=$v" }.mkString(" ")
      val obs = observations.drainFor(name)
        .map { case (k, v) => s"$k=$v" }.mkString(" ")
      val n = df.count() // untimed; after the drain so its re-run of
                         // the observed subtree cannot double-deliver
      val stages = Stages.drain()
        .map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
      println(f"BENCHONE $name $secs%.2f sec rows=$n $stages $tk $obs")
      if (show) df.show(100, false)
    }
    spark.stop()
  }
}
