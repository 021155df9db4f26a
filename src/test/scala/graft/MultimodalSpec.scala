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

  test("PNG round trip: javax.imageio decode recovers every pixel exactly") {
    // local truth first: encode one image, decode it, check pixel sums
    // against the closed-form spec
    val seed = 42L; val w = 7; val h = 5
    val png = Multimodal.syntheticPng(seed, w, h)
    // PNG magic: a real container format, not a fake byte blob
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    def sumOf(a: Long, b: Long, c: Long): Long =
      (for (x <- 0 until w; y <- 0 until h)
        yield (seed * a + x * b + y * c) % 256).sum
    val spec = Tables(spark, sf001, "documents").limit(50)
      .select(col("doc_id"),
        (col("doc_id") % 5 + 4).cast("int").as("w"),
        (col("doc_id") % 4 + 3).cast("int").as("h"))
    val decoded = Multimodal.decodeImageFeatures(
      Multimodal.encodeSyntheticPng(spec, "doc_id", "w", "h"), "media")
    val bad = decoded.filter(col("width") =!= col("w") ||
      col("height") =!= col("h") || col("sum_r").isNull)
    assert(bad.count() == 0, "decode must recover dimensions for every doc")
    // one exact pixel-sum check against the closed form
    val one = Multimodal.decodeImageFeatures(
      spark.createDataFrame(Seq(Tuple1(png))).toDF("media"), "media").head()
    assert(one.getAs[Int]("width") == w && one.getAs[Int]("height") == h)
    assert(one.getAs[Long]("sum_r") == sumOf(7, 13, 31))
    assert(one.getAs[Long]("sum_g") == sumOf(11, 17, 29))
    assert(one.getAs[Long]("sum_b") == sumOf(13, 19, 23))
  }

  test("decodeImageFeatures: broken or null bytes yield null features, not a crash") {
    val rows = Seq(
      Tuple1(Array[Byte](1, 2, 3, 4)), // not an image
      Tuple1(null.asInstanceOf[Array[Byte]]),
      Tuple1(Multimodal.syntheticPng(7L, 3, 3)))
    val out = Multimodal.decodeImageFeatures(
      spark.createDataFrame(rows).toDF("media"), "media").collect()
    assert(out.count(_.isNullAt(out.head.fieldIndex("width"))) == 2)
    assert(out.count(!_.isNullAt(out.head.fieldIndex("width"))) == 1)
  }

  test("decodeImageFeatures: stays inside the query plan (no RDD scan barrier)") {
    val spec = Tables(spark, sf001, "documents")
      .select(col("doc_id"),
        (col("doc_id") % 5 + 4).cast("int").as("w"),
        (col("doc_id") % 4 + 3).cast("int").as("h"))
    val plan = Multimodal.decodeImageFeatures(
      Multimodal.encodeSyntheticPng(spec, "doc_id", "w", "h"), "media")
      .queryExecution.executedPlan.toString
    // the round-5 df.rdd round-trip showed up as `Scan ExistingRDD`,
    // severing pushdown/pruning from the parquet scan; the Dataset
    // formulation keeps MapPartitions nodes over the live scan
    assert(!plan.contains("ExistingRDD"), s"RDD barrier in plan:\n$plan")
    assert(plan.contains("MapPartitions"), s"expected MapPartitions node:\n$plan")
    assert(plan.contains("FileScan parquet") || plan.contains("Scan parquet"),
      s"expected the parquet scan to stay in the same plan:\n$plan")
  }

  test("pcm16FrameEnergy: LE byte order, negative samples, partial-frame drop") {
    val sess = spark
    import sess.implicits._
    // frame of 2 samples: [1000, -2] LE = 0xE8 0x03, 0xFE 0xFF; plus
    // 3 trailing bytes (one full sample + one dangling byte) that must
    // be dropped as a partial frame
    val pcm = Array[Byte](0xE8.toByte, 0x03, 0xFE.toByte, 0xFF.toByte,
      0x39, 0x30, 0x00)
    val df = Seq((1L, pcm)).toDF("id", "media")
    val out = df.select(posexplode(
        Multimodal.pcm16FrameEnergy(col("media"), frameSamples = 2))
        .as(Seq("frame_no", "f")))
      .select(col("frame_no"), col("f.energy"), col("f.peak"))
      .collect()
    assert(out.length == 1)               // 7 bytes -> exactly one 2-sample frame
    assert(out(0).getInt(0) == 0)
    assert(out(0).getLong(1) == 1000L * 1000 + 4)  // 1000^2 + (-2)^2
    assert(out(0).getInt(2) == 1000)
    // shorter than one frame -> empty array, not a crash
    val tiny = Seq((2L, Array[Byte](1, 2, 3))).toDF("id", "media")
      .select(size(Multimodal.pcm16FrameEnergy(col("media"), frameSamples = 2)))
      .head.getInt(0)
    assert(tiny == 0)
    // full-scale negative: 0x00 0x80 = -32768; energy exact as long
    val minv = Seq((3L, Array[Byte](0x00, 0x80.toByte, 0x00, 0x80.toByte)))
      .toDF("id", "media")
      .select(posexplode(Multimodal.pcm16FrameEnergy(col("media"), 2))
        .as(Seq("n", "f")))
      .select(col("f.energy"), col("f.peak")).head
    assert(minv.getLong(0) == 2L * 32768L * 32768L)
    assert(minv.getInt(1) == 32768)
  }

  test("pcm16FrameEnergy: codegen kernel matches the built-ins chain on fixture data") {
    val d = Tables(spark, sf001, "documents")
      .withColumn("media", col("text").cast("binary"))
      .limit(100)
    def run(c: org.apache.spark.sql.Column) =
      d.select(col("doc_id"), posexplode(c).as(Seq("n", "f")))
        .select(col("doc_id"), col("n"), col("f.energy"), col("f.peak"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
        .sortBy(t => (t._1, t._2))
    val kernel = run(Multimodal.pcm16FrameEnergy(col("media"), 16))
    val builtin = run(Multimodal.pcm16FrameEnergyBuiltins(col("media"), 16))
    assert(kernel.nonEmpty && kernel.sameElements(builtin))
  }

  test("perceptualHash: byte-identical copies collide; broken bytes yield null") {
    val sess = spark
    import sess.implicits._
    val spec = Seq(
      (1L, 1L, 6, 5, 0), (2L, 2L, 7, 4, 0),
      // ids 11/12: exact pixel copies of 1 and 2 under new ids
      (11L, 1L, 6, 5, 0), (12L, 2L, 7, 4, 0),
      // id 21: one-pixel +1 perturbation of image 1
      (21L, 1L, 6, 5, 1))
      .toDF("doc_id", "seed", "w", "h", "delta")
    val hashed = Multimodal.perceptualHash(
      Multimodal.encodeSyntheticPngDelta(spec, "seed", "w", "h", "delta"),
      "media")
      .select("doc_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed(1L) == hashed(11L))
    assert(hashed(2L) == hashed(12L))
    assert(hashed(1L) != hashed(2L))
    // a 1/255 luma nudge on one source pixel flips at most the cells
    // that sample it — the hash moves by at most a few bits, never to
    // a different image's hash
    assert(java.lang.Long.bitCount(hashed(1L) ^ hashed(21L)) <= 2)

    val broken = Seq((1L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "media")
    val ph = Multimodal.perceptualHash(broken, "media").select("phash").head
    assert(ph.isNullAt(0))
  }
}
