package graft

/** Scratch dev probe (round 15): per-STEP wall of BpeTrain.train's
  * internal loop, reconstructed by running train(k) for k = 1..N and
  * differencing — used to localize the incremental-pair-count
  * regression. Deleted or kept as a dev tool; not part of any gate.
  */
object TrainStepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val maxK = args.lift(1).map(_.toInt).getOrElse(12)
    val b = GraftSession.builder("local[8]", 8)
      .appName("train-step-probe")
    val spark = sys.env.get("SPARK_GRAFT_EXCLUDE_RULES")
      .fold(b)(r => b.config("spark.sql.optimizer.excludedRules", r))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir, "documents")
    graft.ops.BpeTrain.train(docs, "text", steps = 1).collect() // warm
    var prev = 0.0
    (1 to maxK).foreach { k =>
      val t0 = System.nanoTime()
      graft.ops.BpeTrain.train(docs, "text", steps = k).collect()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"k=$k%3d total=$s%7.2f s  last-step=${s - prev}%7.2f s")
      prev = s
    }
    spark.stop()
  }
}
