package graft

import org.apache.spark.sql.functions._

import graft.ops.{NearDup, Text}

/** Dev tool (round 14): attribute llm_simhash_neardup's wall time at
  * probe scales to its three phases — signature fold (corpus scan),
  * banded candidate generation (LSH joins), exact-Jaccard verify —
  * by timing nested prefixes of the pipeline. Each phase is an eager
  * action, so the deltas are real stage costs, not plan shuffling.
  */
object SimhashPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.LlmQueries.docsWithPlanted(spark, sfDir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // 0. corpus scan + tokenize only (the floor every phase pays)
    time("tokenize_count") {
      docs.select(size(Text.tokens(col("text"))).as("n")).agg(sum("n")).collect()
    }
    // 1. + the 64-bit signature fold (mod before sum: full 64-bit
    // signatures overflow a long sum under ANSI)
    time("signature_fold") {
      docs.select((NearDup.simhash64(Text.tokens(col("text"))) % 97).as("s"))
        .agg(sum("s")).collect()
    }
    // 2. + banding joins (candidate pairs, eager via the internal
    //    localCheckpoint)
    val pairs = time("banded_candidates") {
      NearDup.simhashPairs(docs, "doc_id", "text", maxDist = 12)
    }
    println(s"  candidate rows (hamming<=12, distinct): ${pairs.count()}")
    // 3. + exact shingle-Jaccard verify (the declared query)
    val full = time("full_verified") {
      NearDup.simhashNearDuplicates(docs, "doc_id", "text",
        threshold = 0.8, maxDist = 12)
    }
    println(s"  verified pairs: ${full.count()}")
    spark.stop()
  }
}
