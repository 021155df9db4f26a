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
    // synth:N — a deterministic synthetic vocab (md5-hex words) with
    // effectively unbounded pair diversity: the driver fixtures share
    // word templates and exhaust mergeable pairs at step 90, so the
    // train(512)+ engine-cost demonstration needs a corpus whose pair
    // space doesn't run dry. Hex words give 256 base pairs and a
    // combinatorial multi-char pair space — engine cost per step is
    // what's measured, not corpus linguistics.
    val docs =
      if (sfDir.startsWith("synth:")) {
        import org.apache.spark.sql.functions._
        spark.range(0, sfDir.stripPrefix("synth:").toLong, 1, 32)
          .select(md5(col("id").cast("string")).as("text"))
      } else Tables(spark, sfDir, "documents")
    // untimed warmup: codegen + the word-count scan path
    graft.ops.BpeTrain.train(docs, "text", steps = 2).collect()
    // extended past 128 in round 15 (verdict task #3): the r14 curve
    // stopped at train(64); the 4096 cap needs the flat-marginal claim
    // demonstrated through at least 512 steps
    // extended past 128 in round 15 (verdict task #3): the r14 curve
    // stopped at train(64); the 4096 cap needs the flat-marginal claim
    // demonstrated through at least 512 steps. Small corpora exhaust
    // their pair diversity first (sf0.01 dies at step 90 — train()'s
    // designed loud stop); the probe records the exhaustion point and
    // reports the curve up to it instead of crashing.
    val ks = Seq(1, 8, 16, 32, 48, 64, 96, 128, 192, 256, 384, 512,
      768, 1024).filter(_ <= maxSteps)
    // CPU per point alongside wall: the probe hosts are shared, so a
    // wall-only marginal can read ambient load as per-step creep; the
    // process-CPU marginal is the load-independent statement
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val points = ks.iterator.map { k =>
      val t0 = System.nanoTime()
      val c0 = osBean.getProcessCpuTime
      try {
        val rows = graft.ops.BpeTrain.train(docs, "text", steps = k)
          .collect().length
        val s = (System.nanoTime() - t0) / 1e9
        val c = (osBean.getProcessCpuTime - c0) / 1e9
        require(rows == k, s"train($k) returned $rows merges")
        println(f"steps=$k%4d  wall=$s%8.2f s  cpu=$c%8.2f s")
        Some((k, s, c))
      } catch {
        case e: IllegalArgumentException
            if e.getMessage.contains("no pairs left") =>
          println(s"steps=$k: corpus pair diversity EXHAUSTED (${e.getMessage})")
          None
      }
    }.takeWhile(_.isDefined).flatten.toSeq
    println("marginal cost per step between consecutive probe points" +
      " (flat == lineage bounded):")
    points.sliding(2).foreach {
      case Seq((k0, s0, c0), (k1, s1, c1)) =>
        println(f"  steps $k0%4d -> $k1%4d: ${(s1 - s0) / (k1 - k0)}%7.3f s/step" +
          f"  ${(c1 - c0) / (k1 - k0)}%7.3f cpu-s/step")
      case _ =>
    }
    spark.stop()
  }
}
