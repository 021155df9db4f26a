package graft.sources.zarr

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Zarr v2 array metadata (`.zarray`) — parse + emit.
  *
  * The reference's pipeline converts ATL11 HDF5 granules to Zarr and
  * reads them with xarray (/root/reference/atl06_to_atl11.py:206-217,
  * atlas_catalog.yaml ATLAS/zarr entries); the v2 spec is public
  * (https://zarr.readthedocs.io/en/stable/spec/v2.html). This module
  * implements the on-disk subset those stores use: C-order arrays,
  * "." dimension separator, zlib/gzip or no compressor. Blosc (the
  * numcodecs default) is a native library that does not ship in a
  * bare JVM, so stores written by this engine declare zlib — any
  * zarr reader understands it — and blosc-compressed foreign stores
  * are rejected with a clear error instead of a wrong answer.
  *
  * Dtype strings: `<` little / `>` big / `|` none, then
  * f8/f4/i8/i4/i2/i1/u1/u2/u4 (u8 rejected: no lossless JVM long).
  */
object ZarrMeta {

  final case class Compressor(id: String, level: Int)

  final case class ArrayMeta(
      shape: Seq[Long], chunks: Seq[Int], dtype: String,
      compressor: Option[Compressor], fillValue: Double,
      order: String, dimSeparator: String) {
    require(shape.nonEmpty && shape.size == chunks.size,
      s"shape $shape vs chunks $chunks rank mismatch")
    require(order == "C", s"only C order supported, got $order")
    // metadata is untrusted input: a corrupted .zarray must raise a
    // clean per-store error, not drive an OOM-sized chunk allocation
    // (chunkElems * elemSize feeds `new Array[Byte]` in ZarrStore)
    require(shape.forall(_ >= 0), s"negative shape $shape")
    require(chunks.forall(_ > 0), s"non-positive chunks $chunks")
    require(chunks.map(_.toLong).product * 8 <= (1L << 31),
      s"chunk extent $chunks implausibly large (> 2 GiB per chunk)")
    def rank: Int = shape.size
    /** chunk grid extent per dimension (ceil-div). */
    def grid: Seq[Long] = shape.zip(chunks).map { case (s, c) => (s + c - 1) / c }
    def bigEndian: Boolean = dtype.startsWith(">")
    def kind: Char = dtype.charAt(1)
    def elemSize: Int = dtype.substring(2).toInt
    /** flat elements per full chunk. */
    def chunkElems: Long = chunks.map(_.toLong).product
  }

  private val mapper = new ObjectMapper()

  def parse(json: String): ArrayMeta = {
    val n = mapper.readTree(json)
    require(n.path("zarr_format").asInt(2) == 2,
      s"unsupported zarr_format ${n.path("zarr_format")}")
    val comp = n.path("compressor") match {
      case c if c.isNull || c.isMissingNode => None
      case c =>
        val id = c.path("id").asText()
        require(id == "zlib" || id == "gzip",
          s"unsupported compressor '$id' (zlib/gzip/null only; blosc needs a native lib)")
        Some(Compressor(id, c.path("level").asInt(6)))
    }
    val filters = n.path("filters")
    require(filters.isNull || filters.isMissingNode ||
      (filters.isArray && filters.size() == 0),
      s"unsupported filters $filters")
    val dtype = n.path("dtype").asText()
    require(dtype.length == 3 && "<>|".contains(dtype.charAt(0)) &&
      "fiu".contains(dtype.charAt(1)),
      s"unsupported dtype '$dtype'")
    require(dtype != "<u8" && dtype != ">u8" && dtype != "|u8",
      "uint64 has no lossless JVM representation")
    def longs(field: String): Seq[Long] = {
      val a = n.path(field)
      require(a.isArray, s".zarray $field must be an array")
      (0 until a.size()).map(a.get(_).asLong())
    }
    val fill = n.path("fill_value") match {
      case f if f.isNull || f.isMissingNode => 0.0
      case f if f.isTextual => f.asText() match {
        case "NaN" => Double.NaN
        case "Infinity" => Double.PositiveInfinity
        case "-Infinity" => Double.NegativeInfinity
        case other => throw new IllegalArgumentException(
          s"unsupported fill_value '$other'")
      }
      case f => f.asDouble()
    }
    ArrayMeta(
      shape = longs("shape"), chunks = longs("chunks").map(_.toInt),
      dtype = dtype, compressor = comp, fillValue = fill,
      order = n.path("order").asText("C"),
      dimSeparator = n.path("dimension_separator").asText("."))
  }

  def emit(m: ArrayMeta): String = {
    val root: ObjectNode = mapper.createObjectNode()
    root.put("zarr_format", 2)
    val shape = root.putArray("shape"); m.shape.foreach(shape.add)
    val chunks = root.putArray("chunks"); m.chunks.foreach(chunks.add)
    root.put("dtype", m.dtype)
    m.compressor match {
      case Some(c) =>
        val cn = root.putObject("compressor")
        cn.put("id", c.id); cn.put("level", c.level)
      case None => root.putNull("compressor")
    }
    if (m.fillValue.isNaN) root.put("fill_value", "NaN")
    else if (m.fillValue.isInfinite)
      root.put("fill_value", if (m.fillValue > 0) "Infinity" else "-Infinity")
    else if (m.fillValue == math.rint(m.fillValue) &&
      math.abs(m.fillValue) < 1e15 && m.kind != 'f')
      root.put("fill_value", m.fillValue.toLong)
    else root.put("fill_value", m.fillValue)
    root.putNull("filters")
    root.put("order", m.order)
    root.put("dimension_separator", m.dimSeparator)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  val ZGroup: String = """{"zarr_format":2}"""
}
