package graft

import org.apache.spark.sql.functions._

/** Dev tool: stage-attribute llm_hybrid_rrf (VERDICT r15 item 2 — the
  * slowest row of the clean 8-core r15 record at 24.7 s wall /
  * 79.4 cpu-s ≈ 3.2 of 8 cores busy). Times the lexical (BM25) leg,
  * the dense (cosine) leg and the fused query separately, warm, so the
  * serial/parallel split and any repeated-subtree cost shows up as
  * leg-sum vs fused-total. Also reports per-phase process CPU.
  */
object HybridProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .appName("hybrid-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def t[T](name: String)(b: => T): T = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = b
      val w = (System.nanoTime() - t0) / 1e9
      val c = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"PROBE $name%-12s wall=$w%7.2f s cpu=$c%7.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // untimed JVM warmup (same discipline as Bench)
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count().count()
    (1 to 3).foreach { i =>
      val queries = Seq(
        (0L, "spark window agg"),
        (1L, "hash join merge batch"),
        (2L, "fast scan filter value"),
        (3L, "customer order line")).toDF("query_id", "query_text")
      t(s"lex_$i") {
        noop(graft.ops.Text.bm25TopK(Tables(spark, sfDir, "documents"),
          queries, k = 20))
      }
      val e = Tables(spark, sfDir, "embeddings")
      val probes = e.filter(col("vec_id") < 4)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      t(s"dense_$i") {
        noop(graft.ops.Embeddings.bruteForceTopK(
          e, probes, "vec_id", "embedding", "qid", "qvec", k = 20))
      }
      t(s"full_$i") { noop(SparkEntry.queries("llm_hybrid_rrf")(spark, sfDir)) }
      t(s"bm25q_$i") { noop(SparkEntry.queries("llm_bm25_topk")(spark, sfDir)) }
    }
    spark.stop()
  }
}
