package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = Tables(spark, sf001, "documents")
    .withColumn("media", col("text").cast("binary"))
    .select("doc_id", "media")

  test("byteFeatures: size and hash match the string view") {
    val d = Tables(spark, sf001, "documents")
      .withColumn("media", col("text").cast("binary"))
    val bad = Multimodal.byteFeatures(d, "media")
      .filter(col("n_bytes") =!= length(col("text")) ||
        col("content_md5") =!= md5(col("text")))
    assert(bad.count() == 0)
  }

  test("sampleFrames: fixed-size hex frames at the expected strides") {
    val one = media.filter(col("doc_id") === 0)
      .select(Multimodal.sampleFrames(col("media"), 4, 32, 5).as("f"))
      .head().getSeq[String](0)
    assert(one.nonEmpty && one.length <= 5)
    assert(one.forall(_.length == 8), "4 bytes -> 8 hex chars")
  }

  test("decodeFeaturesStub: deterministic 8-dim features, schema appended") {
    val out1 = Multimodal.decodeFeaturesStub(media, "media")
    assert(out1.schema.fieldNames.toSeq == Seq("doc_id", "media", "features"))
    val f1 = out1.select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.decodeFeaturesStub(media, "media")
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f2, "stub features must be deterministic")
    assert(f1.values.forall(_.length == 8))
    assert(f1.values.exists(_.exists(_ != 0.0f)))
  }

  test("decodeFeaturesStub: stays inside the query plan (no RDD scan barrier)") {
    val plan = Multimodal.decodeFeaturesStub(media, "media")
      .queryExecution.executedPlan.toString
    // the round-5 df.rdd round-trip showed up as `Scan ExistingRDD`,
    // severing pushdown/pruning from the parquet scan; the Dataset
    // formulation keeps a MapPartitions node over the live scan
    assert(!plan.contains("ExistingRDD"), s"RDD barrier in plan:\n$plan")
    assert(plan.contains("MapPartitions"), s"expected MapPartitions node:\n$plan")
    assert(plan.contains("FileScan parquet") || plan.contains("Scan parquet"),
      s"expected the parquet scan to stay in the same plan:\n$plan")
  }
}
