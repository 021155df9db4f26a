package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: media as opaque
  * `binary` columns with typed metadata, decoded via per-partition
  * batch operators. Image decode is REAL — `javax.imageio` (PNG/JPEG)
  * ships in the JDK, so [[decodeImageFeatures]] runs an actual codec;
  * audio/video would slot into the same mapPartitions shape when their
  * codecs are available.
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

  /** REAL audio decode, columnar: interpret a binary column as raw
    * little-endian PCM16 (the sample encoding inside WAV), frame it
    * into non-overlapping windows of `frameSamples` samples, and emit
    * per-frame signal stats — energy (sum of squares, exact long) and
    * peak |amplitude|. This is the audio analogue of
    * [[decodeImageFeatures]], but needs NO codec library: sample
    * extraction is `substr` + `conv(hex)` + sign-fold, all codegen'd
    * built-ins, so it runs at scan speed inside whole-stage codegen —
    * no UDF, no mapPartitions. A trailing partial frame is dropped
    * (fixed-window contract), and a blob shorter than one frame
    * yields an empty array.
    */
  def pcm16FrameEnergy(bin: org.apache.spark.sql.Column,
      frameSamples: Int): org.apache.spark.sql.Column =
    graft.functions.pcm16_frame_stats(bin, frameSamples)

  /** Built-ins-only formulation of [[pcm16FrameEnergy]] — the
    * readable reference the codegen kernel is spec-pinned against
    * (MultimodalSpec). ~8x slower (two string allocations + a base-16
    * parse per sample); not used on the hot path.
    */
  def pcm16FrameEnergyBuiltins(bin: org.apache.spark.sql.Column,
      frameSamples: Int): org.apache.spark.sql.Column = {
    require(frameSamples > 0)
    val frameBytes = 2 * frameSamples
    def sample(byteOff: org.apache.spark.sql.Column) = {
      val lo = conv(hex(call_function("substring", bin,
        (byteOff + 1).cast("int"), lit(1))), 16, 10).cast("int")
      val hi = conv(hex(call_function("substring", bin,
        (byteOff + 2).cast("int"), lit(1))), 16, 10).cast("int")
      val raw = hi * 256 + lo
      when(raw >= 32768, raw - 65536).otherwise(raw)
    }
    val nFrames = call_function("div",
      octet_length(bin).cast("long"), lit(frameBytes.toLong))
    val idx = sequence(lit(0L), lit(frameSamples - 1L))
    when(nFrames <= 0, array().cast("array<struct<energy:bigint,peak:int>>"))
      .otherwise(transform(sequence(lit(0L), nFrames - 1), f => {
        val base = f * frameBytes
        struct(
          aggregate(idx, lit(0L), (acc, i) => {
            val s = sample(base + i * 2)
            acc + (s * s).cast("long")
          }).as("energy"),
          aggregate(idx, lit(0), (acc, i) =>
            greatest(acc, abs(sample(base + i * 2)))).as("peak"))
      }))
  }

  /** Deterministic RGB test image as real PNG bytes: pixel (x, y) of
    * image `seed` has channels r = (seed*7 + x*13 + y*31) mod 256,
    * g = (seed*11 + x*17 + y*29) mod 256, b = (seed*13 + x*19 + y*23)
    * mod 256. The DuckDB oracle replays the same closed-form pixel
    * spec in SQL, so the PNG encode -> decode round trip through the
    * JDK codec is hash-gated without the oracle decoding anything.
    */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((seed * 7 + x * 13 + y * 31) % 256).toInt
        val g = ((seed * 11 + x * 17 + y * 29) % 256).toInt
        val b = ((seed * 13 + x * 19 + y * 23) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** [[syntheticPng]] with the red channel of pixel (0, 0) shifted by
    * `rDelta` (mod 256) — the controlled one-pixel perturbation the
    * perceptual-hash tests plant: a real re-encoded variant whose
    * closed form the SQL oracle can still replay.
    */
  def syntheticPngPerturbed(seed: Long, w: Int, h: Int, rDelta: Int): Array[Byte] = {
    val bytes = syntheticPng(seed, w, h)
    if (rDelta == 0) bytes
    else {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val p = img.getRGB(0, 0)
      val r = (((p >> 16) & 0xff) + rDelta) & 0xff
      img.setRGB(0, 0, (r << 16) | (p & 0x00FFFF))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Adds a `media` binary column holding [[syntheticPng]] bytes built
    * from (seedCol, wCol, hCol). Runs via mapPartitions so encoder
    * setup amortizes per batch — the same execution shape as the
    * decode side.
    */
  def encodeSyntheticPng(df: DataFrame, seedCol: String, wCol: String,
      hCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("media", BinaryType, nullable = true))
    val si = df.schema.fieldIndex(seedCol)
    val wi = df.schema.fieldIndex(wCol)
    val hi = df.schema.fieldIndex(hCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory codec buffers
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ syntheticPng(r.getLong(si), r.getInt(wi), r.getInt(hi)))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** [[encodeSyntheticPng]] variant that also reads an integer
    * `deltaCol` and routes through [[syntheticPngPerturbed]] — the
    * encode side of the perceptual-hash dedup tests.
    */
  def encodeSyntheticPngDelta(df: DataFrame, seedCol: String, wCol: String,
      hCol: String, deltaCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("media", BinaryType, nullable = true))
    val si = df.schema.fieldIndex(seedCol)
    val wi = df.schema.fieldIndex(wCol)
    val hi = df.schema.fieldIndex(hCol)
    val di = df.schema.fieldIndex(deltaCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ syntheticPngPerturbed(
          r.getLong(si), r.getInt(wi), r.getInt(hi), r.getInt(di)))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Perceptual average-hash (aHash) over a REAL decode: resample the
    * decoded image to a fixed `gw` x `gh` grid by nearest neighbor
    * (cell (gx, gy) samples source ((gx*w)/gw, (gy*h)/gh), integer
    * division — the same geometry family as [[resizeImageFeatures]]),
    * take the integer luma 299r + 587g + 114b per cell, and set bit
    * p = gy*gw + gx iff gw*gh*luma_p > sum(luma) (strict; the
    * multiply form avoids a mean division so the bit is exact
    * integer arithmetic end to end). Identical images hash equal
    * regardless of stored byte layout; the closed-form-pixel oracle
    * can replay the hash without decoding anything, so the whole
    * decode -> resample -> hash loop is hash-gated.
    *
    * This is the image member of the dedup family: at 100 TB the
    * 8-byte phash replaces the blob for the dedup shuffle, and exact
    * phash equality (the groupBy the query runs) is the production
    * fast tier — hamming-tolerant banding composes with the SimHash
    * pair machinery in [[NearDup]] unchanged, since both are 64-bit
    * signatures.
    */
  def perceptualHash(df: DataFrame, binCol: String,
      gw: Int = 8, gh: Int = 8): DataFrame = {
    require(gw * gh <= 64, "hash must fit a long")
    val schema = StructType(df.schema.fields :+
      StructField("phash", LongType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val ph: Any =
          if (bytes == null) null
          else {
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) null
            else {
              val w = img.getWidth
              val h = img.getHeight
              val lumas = new Array[Long](gw * gh)
              var total = 0L
              var gy = 0
              while (gy < gh) {
                var gx = 0
                while (gx < gw) {
                  val p = img.getRGB(gx * w / gw, gy * h / gh)
                  val luma = 299L * ((p >> 16) & 0xff) +
                    587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
                  lumas(gy * gw + gx) = luma
                  total += luma
                  gx += 1
                }
                gy += 1
              }
              var hash = 0L
              var i = 0
              val n = gw * gh
              while (i < n) {
                if (n * lumas(i) > total) hash |= 1L << i
                i += 1
              }
              hash
            }
          }
        Row.fromSeq(r.toSeq :+ ph)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** REAL image decode: `javax.imageio` (PNG/JPEG, in the JDK — zero
    * added dependencies) decodes each binary and emits typed features:
    * width, height, and exact per-channel integer pixel sums (integer
    * features keep the oracle hash-exact; means are one division
    * away). Null or undecodable bytes yield null features, not a
    * failed task — a 100-TB media crawl always contains broken blobs.
    *
    * Runs via Dataset.mapPartitions so per-partition codec
    * initialization happens once per batch, not once per row. Staying
    * on the Dataset API (rather than round-tripping through df.rdd +
    * createDataFrame) keeps the operator INSIDE the query plan: no RDD
    * scan barrier, upstream column pruning and filter pushdown still
    * reach the parquet scan, and AQE keeps sizing the exchanges around
    * it. The object ser/deser boundary that mapPartitions implies is
    * the irreducible cost of handing rows to an external codec.
    */
  /** REAL image resize: decode through the JDK codec, nearest-neighbor
    * downsample by integer `factor` (resized (x, y) samples source
    * (x*factor, y*factor); out dims = ceil(in/factor) so every sample
    * stays in bounds), re-encode the result as PNG into
    * `media_resized`, and emit the resized image's typed features.
    * The exact sampling spec means a closed-form-pixel oracle can
    * replay the features without ever decoding an image, while the
    * operator itself runs decode -> resample -> encode through real
    * codecs. Same per-partition-init mapPartitions shape and
    * broken-blob null contract as [[decodeImageFeatures]].
    */
  def resizeImageFeatures(df: DataFrame, binCol: String, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("out_width", IntegerType, nullable = true),
      StructField("out_height", IntegerType, nullable = true),
      StructField("sum_r", LongType, nullable = true),
      StructField("sum_g", LongType, nullable = true),
      StructField("sum_b", LongType, nullable = true),
      StructField("media_resized", BinaryType, nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    val nulls: Seq[Any] = Seq(null, null, null, null, null, null)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val extra: Seq[Any] =
          if (bytes == null) nulls
          else {
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) nulls
            else {
              val ow = (img.getWidth + factor - 1) / factor
              val oh = (img.getHeight + factor - 1) / factor
              val out = new java.awt.image.BufferedImage(
                ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < oh) {
                var x = 0
                while (x < ow) {
                  val p = img.getRGB(x * factor, y * factor)
                  out.setRGB(x, y, p)
                  sr += (p >> 16) & 0xff
                  sg += (p >> 8) & 0xff
                  sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              Seq(ow, oh, sr, sg, sb, bos.toByteArray)
            }
          }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  def decodeImageFeatures(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sum_r", LongType, nullable = true),
      StructField("sum_g", LongType, nullable = true),
      StructField("sum_b", LongType, nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    val nulls: Seq[Any] = Seq(null, null, null, null, null)
    df.mapPartitions { rows =>
      // per-partition codec init: keep ImageIO's scratch space on-heap
      // instead of its default temp-file cache
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val extra: Seq[Any] =
          if (bytes == null) nulls
          else {
            val img =
              // NonFatal, not just IOException: ImageIO plugin decoders
              // throw unchecked exceptions (AIOOBE, IllegalArgument,
              // NegativeArraySize) on malformed bytes, and the contract
              // is "broken blobs yield null features, not a dead task"
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) nulls
            else {
              val w = img.getWidth
              val h = img.getHeight
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff
                  sg += (p >> 8) & 0xff
                  sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              // Seq[Any] pins the element type: a bare Seq(w, h, sr...)
              // numerically widens the Int dims to Long and the row
              // encoder rejects a boxed Long in the INT width slot
              Seq[Any](w, h, sr, sg, sb)
            }
          }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
