package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: media as opaque
  * `binary` columns with typed metadata, decoded via per-partition
  * batch operators. The actual codec is STUBBED (this container has
  * no image/audio libraries) with a deterministic byte-derived fake —
  * the Spark-side plumbing (schema, partition-batched execution,
  * feature shape) is real and tested, and swapping the stub for a real
  * decoder changes one function.
  */
object Multimodal {

  /** Columnar byte-level features — real operators, no stub: size,
    * content hash, head bytes. These run codegen'd at scan speed.
    */
  def byteFeatures(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(binCol)))
      .withColumn("content_md5", md5(col(binCol)))
      .withColumn("head_hex", hex(substring(col(binCol), 1, 8)))

  /** "Frame sampling" for a byte stream: fixed-size slices every
    * `stride` bytes (the video-frame analogue); columnar, no UDF.
    */
  def sampleFrames(bin: org.apache.spark.sql.Column, frameSize: Int, stride: Int,
      maxFrames: Int): org.apache.spark.sql.Column =
    // a binary shorter than one frame yields an EMPTY array — the
    // greatest(..., 0) clamp alone would emit one undersized frame,
    // violating the fixed-size-slice contract
    when(octet_length(bin) < frameSize,
      array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0),
          greatest(least(
            call_function("div", octet_length(bin).cast("long") - frameSize, lit(stride.toLong)),
            lit((maxFrames - 1).toLong)), lit(0L))),
        i => hex(call_function("substring", bin, (i * stride + 1).cast("int"), lit(frameSize)))))

  private val FeatDim = 8

  /** STUB decoder: a real implementation would decode the media and
    * run a feature extractor; here features are a deterministic
    * byte-derived fake: per lane d, the exact integer sum of bytes at
    * positions ≡ d (mod 8), scaled once by 1e-3f. Integer accumulation
    * (rather than incremental float adds) makes the fake
    * order-independent AND exactly reproducible by the DuckDB oracle
    * (int -> float32 conversion is exact below 2^24; one float32
    * multiply is the same IEEE op in both engines), so the Spark-side
    * plumbing — schema, partition-batched execution, feature shape —
    * is hash-gate-checked end to end (mm_decode_features).
    * Runs via Dataset.mapPartitions so per-partition codec
    * initialization (the expensive part of real decoders) happens once
    * per batch, not once per row — the execution shape a real decoder
    * needs. Staying on the Dataset API (rather than round-tripping
    * through df.rdd + createDataFrame) keeps the operator INSIDE the
    * query plan: no RDD scan barrier, upstream column pruning and
    * filter pushdown still reach the parquet scan, and AQE keeps
    * sizing the exchanges around it. The object ser/deser boundary
    * that mapPartitions implies is the irreducible cost of handing
    * rows to an external codec.
    */
  def decodeFeaturesStub(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // per-partition "codec init" happens here (amortized)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val sums = new Array[Long](FeatDim)
        if (bytes != null) {
          var i = 0
          while (i < bytes.length) {
            sums(i % FeatDim) += (bytes(i) & 0xff)
            i += 1
          }
        }
        val feats = sums.map(s => s.toFloat * 1e-3f)
        Row.fromSeq(r.toSeq :+ (if (bytes == null) null else feats.toSeq))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
