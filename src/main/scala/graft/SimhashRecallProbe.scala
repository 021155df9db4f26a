package graft

import org.apache.spark.sql.functions._

import graft.ops.NearDup

/** Dev tool: A/B the adaptive band-key width against the fixed r=2
  * geometry on SPARK_GRAFT_SF_DIR — prints the VERIFIED near-dup pair
  * sets' sizes and their symmetric difference, i.e. exactly what the
  * key-width change costs (or doesn't) in end-to-end recall at a
  * scale the oracle gate doesn't reach. Precision is 1.0 on both
  * sides by construction (exact-Jaccard verify), so any diff is
  * banding recall.
  */
object SimhashRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.LlmQueries.docsWithPlanted(spark, sfDir)
    def pairs(kb: Int) = NearDup.simhashNearDuplicates(
        docs, "doc_id", "text", threshold = 0.8, maxDist = 12, keyBlocks = kb)
      .select("id1", "id2")
    val fixed = pairs(2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adaptive = pairs(0).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"PROBE fixed_r2=${fixed.size} adaptive=${adaptive.size} " +
      s"missed_by_adaptive=${fixed.diff(adaptive).size} " +
      s"extra_in_adaptive=${adaptive.diff(fixed).size}")
    fixed.diff(adaptive).take(20).foreach(p => println(s"MISSED $p"))
    spark.stop()
  }
}
