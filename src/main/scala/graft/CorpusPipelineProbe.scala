package graft

import org.apache.spark.sql.functions._

import graft.ops.Text

/** Dev tool (round 15, verdict task #6): attribute llm_corpus_pipeline's
  * wall time at probe scales (sf1/sf10) to its stages by timing nested
  * PREFIXES of the same dataflow — the pipeline itself is one
  * barrier-free dataflow (by design: two scan-speed filters, one hash
  * shuffle, one join, one sort), so in-query Stages.time wrappers would
  * ADD the very barriers the plan avoids. Prefix deltas attribute cost
  * without touching the declared query:
  *   scan+filters → +dedup groupBy → +join-back → +orderBy (full).
  * Each prefix is forced with a noop-equivalent count over all columns
  * (agg over hashed projection) so column pruning cannot elide work.
  */
object CorpusPipelineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .appName("corpus-pipeline-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = f
      println(f"PHASE $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%8.2f s")
      r
    }
    // the exact same dataflow as the declared query (LlmQueries
    // llm_corpus_pipeline), prefix by prefix
    val base = graft.queries.LlmQueries.docsWithPlanted(spark, sfDir)
    val d = base.unionByName(
      Tables(spark, sfDir, "documents").filter(col("doc_id") % 73 === 0)
        .withColumn("doc_id", col("doc_id") + lit(200000L)))
    def scored = d
      .withColumn("lang", Text.langId(col("text")))
      .withColumn("quality", Text.qualityScore(col("text")))
      .filter(col("lang") === "en")
      .filter(col("quality") >= 0.6)
    def canon = scored
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
    def joined = scored.join(canon, "doc_id")
      .select(col("doc_id"),
        Text.tokenCount(col("text")).as("n_tokens"),
        round(col("quality"), 6).as("quality"))
    // untimed warmup: run the FULL pipeline once so whole-stage
    // codegen + JIT compilation happen before any timed prefix (the
    // first sf1 run showed the cost: the `filters` prefix billed 20 s
    // cold vs <7.5 s inside the immediately-following warm prefix)
    time("warmup_full") {
      joined.orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    // prefix 0: raw scan + union (the IO floor)
    time("scan_union") { d.agg(count(lit(1))).collect() }
    // prefix 1: + language/quality gates (scan-speed filters)
    time("filters") {
      scored.agg(count(lit(1)), sum(length(col("text")))).collect()
    }
    // prefix 2: + exact-dedup groupBy (the one hash shuffle)
    time("dedup_groupby") { canon.agg(count(lit(1))).collect() }
    // prefix 3: + join-back and final projection
    time("join_back") {
      joined.agg(count(lit(1)), sum(col("n_tokens"))).collect()
    }
    // full: + global orderBy, materialized like the bench (noop write)
    time("full_with_sort") {
      joined.orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
