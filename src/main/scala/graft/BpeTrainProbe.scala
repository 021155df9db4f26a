package graft

/** Dev probe (round 14): demonstrate that BPE training's per-merge
  * cost is FLAT in the step index now that train() cuts lineage with
  * an eager localCheckpoint every 8 merges. Without the cut, step t
  * re-evaluates t-1 stacked interpreted aggregate() folds over the
  * vocab, so cumulative wall for K steps is O(K^2); with it, marginal
  * cost per step is O(1) folds and cumulative wall is linear in K.
  *
  * Measures train(k) end-to-end for increasing k and prints the
  * marginal seconds-per-step of each segment — the number that must
  * stay flat. (Per-step hooks inside train() would be an API wart;
  * cumulative-linear measured across segments is the same statement.)
  *
  * Usage: runMain graft.BpeTrainProbe [sfDir] [maxSteps]
  */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxSteps = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = GraftSession.builder("local[32]", 32)
      .appName("bpe-train-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir, "documents")
    // untimed warmup: codegen + the word-count scan path
    graft.ops.BpeTrain.train(docs, "text", steps = 2).collect()
    val ks = Seq(1, 8, 16, 32, 48, 64, 96, 128).filter(_ <= maxSteps)
    val points = ks.map { k =>
      val t0 = System.nanoTime()
      val rows = graft.ops.BpeTrain.train(docs, "text", steps = k)
        .collect().length
      val s = (System.nanoTime() - t0) / 1e9
      require(rows == k, s"train($k) returned $rows merges")
      println(f"steps=$k%4d  wall=$s%8.2f s")
      (k, s)
    }
    println("marginal cost per step between consecutive probe points" +
      " (flat == lineage bounded):")
    points.sliding(2).foreach {
      case Seq((k0, s0), (k1, s1)) =>
        println(f"  steps $k0%4d -> $k1%4d: ${(s1 - s0) / (k1 - k0)}%7.3f s/step")
      case _ =>
    }
    spark.stop()
  }
}
