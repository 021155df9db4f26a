package graft

import org.apache.spark.sql.functions._

import graft.Lineage.CutSyntax
import graft.ops.{ConvexHull, Dbscan, SpatioTemporal}

/** Dev tool: substage attribution for lake_finder_pipeline's
  * hulls_rings_gate stage (VERDICT r15 item 4 — 4.05 s of the 12.6 s
  * warm pipeline, never broken down). Reproduces the LakeQueries
  * fixture + LakeFinder steps 4-7 with an eager barrier per substage:
  * label join, size guard, per-lake hull/attr aggregate, ring
  * candidate join + kernel, outer median, outer MAD, final assembly.
  * Numbers are upper bounds (the barriers themselves add work) but
  * the RATIO names the expensive substage.
  */
object LakeStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .appName("lake-stage-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def t[T](name: String)(b: => T): T = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = b
      println(f"PROBE $name%-16s wall=${(System.nanoTime() - t0) / 1e9}%7.2f s " +
        f"cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%7.2f s")
      r
    }
    Bench.heavyWarmup(spark)
    (1 to (if (args.isEmpty) 2 else args(0).toInt)).foreach { round =>
      println(s"--- round $round ---")
      // === fixture construction (duplicated from LakeQueries.lakePipeline)
      val li = Tables(spark, sfDir, "lineitem")
      val base = li
        .withColumn("blob", (col("l_suppkey") % 5).cast("int"))
        .withColumn("is_bg", col("l_orderkey") % 7 === 0)
        .withColumn("is_ring", !col("is_bg") && col("l_orderkey") % 53 === 1)
        .withColumn("px",
          when(col("is_bg"), (col("blob") * 50000L) + 1100L + col("l_orderkey") % 300)
            .when(col("is_ring"), (col("blob") * 50000L) + 1500L + (col("l_orderkey") % 4) * 60L)
            .otherwise(col("blob") * 50000L + col("l_orderkey") % 997))
        .withColumn("py",
          when(col("is_ring"), col("blob") * 20000L + (col("l_partkey") % 4) * 250L)
            .otherwise(col("blob") * 20000L + col("l_partkey") % 997))
        .select(col("px"), col("py"), col("blob"), col("is_bg"), col("is_ring"))
        .distinct()
      val pts = base
        .withColumn("id", col("px") * 10000000L + col("py"))
        .withColumn("x", col("px").cast("double"))
        .withColumn("y", col("py").cast("double"))
        .withColumn("dhdt",
          when(col("is_bg"), lit(0.05))
            .when(col("is_ring"), lit(0.108) + (col("py") % 7).cast("double") / 1000.0)
            .otherwise((when(col("blob") < 3, -1.0).otherwise(1.0)) *
              (lit(0.2) + (col("px") % 50).cast("double") / 100.0)))
        .withColumn("basin", (col("blob") % 2).cast("int"))
        .withColumn("track",
          concat(lpad((col("py") % 40).cast("string"), 4, "0"), lit("_pt1")))
        .select("id", "x", "y", "dhdt", "basin", "track")
      val ptsP = t("eps_estimate") { pts.lineageCut() }
      val nClustered = ptsP.filter(abs(col("dhdt")) > 0.105).count()
      val rho = (nClustered / 5.0) / (997.0 * 997.0)
      val eps = math.sqrt(25.0 / (math.Pi * rho))
      // === findLakes body (duplicated), barriers per substage
      val noiseFloor = 0.105; val minPts = 5
      val minBasinPoints = 100L; val minLakePoints = 20L; val bufferDist = 1000.0
      val stats = ptsP.agg(avg(col("dhdt")).as("mu"),
        stddev_samp(col("dhdt")).as("sigma"))
      val candidates = ptsP
        .filter(abs(col("dhdt")) > noiseFloor)
        .crossJoin(broadcast(stats))
        .withColumn("dhdt_c",
          greatest(least(col("dhdt"), col("mu") + lit(3) * col("sigma")),
            col("mu") - lit(3) * col("sigma")))
        .drop("mu", "sigma")
      val cand = t("candidates") { candidates.lineageCut() }
      val bigBasins = cand.groupBy(col("basin")).count()
        .filter(col("count") >= minBasinPoints).select("basin")
      val inBasins = cand.join(broadcast(bigBasins), "basin")
        .withColumn("sign", when(col("dhdt_c") < 0, -1).otherwise(1))
      val salted = inBasins.withColumn("sid",
        col("id") * 2 + when(col("sign") < 0, 0).otherwise(1))
      val clustered = t("dbscan") {
        Dbscan.dbscan(
          salted.withColumn("y_salt",
            col("y") + when(col("sign") < 0, lit(0.0)).otherwise(lit(1e9))),
          "sid", Seq("x", "y_salt"), eps, minPts, includeNoise = false)
      }
      val labeled = t("label_join") {
        val l = salted.join(clustered, "sid")
          .withColumn("lake_label", col("cluster") * col("sign"))
          .persist()
        l.count(); l
      }
      val bigLakes = labeled.groupBy(col("lake_label")).count()
        .filter(col("count") >= minLakePoints).select(col("lake_label"))
      val lakePts = labeled.join(broadcast(bigLakes), "lake_label")
      val lakes = t("hull_agg") {
        val lk = lakePts.groupBy(col("lake_label"))
          .agg(
            min(col("basin")).as("basin"),
            min(col("sign")).as("sign"),
            count(lit(1)).as("n_points"),
            ConvexHull.convex_hull(col("x"), col("y")).as("hull"),
            concat_ws("|", sort_array(collect_set(col("track")))).as("refgtracks"),
            max(abs(col("dhdt_c"))).as("maxabsdhdt"),
            median(col("dhdt_c")).as("inner_med"))
          .withColumn("xs", transform(col("hull"), p => p.getField("x")))
          .withColumn("ys", transform(col("hull"), p => p.getField("y")))
          .persist()
        lk.count(); lk
      }
      val bboxed = lakes.select(col("lake_label"), col("basin"), col("xs"), col("ys"),
        (array_min(col("xs")) - bufferDist).as("_bx0"),
        (array_max(col("xs")) + bufferDist).as("_bx1"),
        (array_min(col("ys")) - bufferDist).as("_by0"),
        (array_max(col("ys")) + bufferDist).as("_by1"))
      val ringPts = t("ring_kernel") {
        val r = cand.join(broadcast(bboxed), "basin")
          .filter(col("x") >= col("_bx0") && col("x") <= col("_bx1") &&
            col("y") >= col("_by0") && col("y") <= col("_by1"))
          .join(lakePts.select(col("lake_label"), col("id")),
            Seq("lake_label", "id"), "left_anti")
          .filter(SpatioTemporal.inBufferRing(col("xs"), col("ys"),
            col("x"), col("y"), bufferDist))
          .select(col("lake_label"), col("dhdt_c").as("dhdt"))
          .persist()
        r.count(); r
      }
      val outer = t("outer_median") {
        val o = ringPts.groupBy(col("lake_label"))
          .agg(median(col("dhdt")).as("outer_med"), count(lit(1)).as("n_ring"))
          .persist()
        o.count(); o
      }
      val outerMad = t("outer_mad") {
        val m = ringPts
          .join(broadcast(outer.select(col("lake_label").as("ll"), col("outer_med"))),
            col("lake_label") === col("ll"))
          .groupBy(col("lake_label"))
          .agg(median(abs(col("dhdt") - col("outer_med"))).as("outer_mad"))
          .persist()
        m.count(); m
      }
      t("final_assembly") {
        lakes
          .join(outer, Seq("lake_label"), "left")
          .join(outerMad.select(col("lake_label"), col("outer_mad")),
            Seq("lake_label"), "left")
          .withColumn("is_active",
            col("outer_med").isNull ||
              abs(col("inner_med") - col("outer_med")) >= lit(3) * col("outer_mad"))
          .write.format("noop").mode("overwrite").save()
      }
      Seq(labeled, lakes, ringPts, outer, outerMad).foreach(_.unpersist(true))
      spark.catalog.clearCache(); System.gc(); Thread.sleep(300)
    }
    spark.stop()
  }
}
