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
  * "." dimension separator, and blosc (the numcodecs DEFAULT — what
  * `to_zarr` with no compressor override writes, so the reference's
  * actual ATL11 stores are blosc-lz4), zlib, gzip, or no compressor.
  * Blosc frames are decoded/encoded by the pure-JVM [[Blosc]] codec;
  * only the blosclz inner algorithm and the bit-shuffle filter are
  * rejected (with clear errors — never a wrong answer).
  *
  * Dtype strings: `<` little / `>` big / `|` none, then
  * f8/f4/i8/i4/i2/i1/u1/u2/u4 (u8 rejected: no lossless JVM long).
  */
object ZarrMeta {

  /** `cname`/`shuffle` only meaningful for id == "blosc"
    * (numcodecs-style fields; shuffle 0 = none, 1 = byte).
    */
  final case class Compressor(id: String, level: Int,
      cname: String = "", shuffle: Int = 0)

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
        id match {
          case "zlib" | "gzip" =>
            Some(Compressor(id, c.path("level").asInt(6)))
          case "blosc" =>
            val cname = c.path("cname").asText("lz4")
            require(cname != "blosclz",
              "blosc cname 'blosclz' unsupported (native-only algorithm; " +
                "lz4/lz4hc/zlib/zstd/snappy decode in pure JVM)")
            val shuffle = c.path("shuffle").asInt(1)
            require(shuffle == 0 || shuffle == 1,
              s"blosc shuffle=$shuffle unsupported (0 = none, 1 = byte)")
            Some(Compressor("blosc", c.path("clevel").asInt(5), cname, shuffle))
          case other => throw new IllegalArgumentException(
            s"unsupported compressor '$other' (blosc/zlib/gzip/null)")
        }
    }
    val filters = n.path("filters")
    require(filters.isNull || filters.isMissingNode ||
      (filters.isArray && filters.size() == 0),
      s"unsupported filters $filters")
    val dtype = n.path("dtype").asText()
    require(dtype.length == 3 && "<>|".contains(dtype.charAt(0)) &&
      "fiu".contains(dtype.charAt(1)) && "1248".contains(dtype.charAt(2)),
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
      case Some(c) if c.id == "blosc" =>
        // numcodecs-style blosc object, readable by zarr-python
        val cn = root.putObject("compressor")
        cn.put("id", "blosc"); cn.put("cname", c.cname)
        cn.put("clevel", c.level); cn.put("shuffle", c.shuffle)
        cn.put("blocksize", 0)
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

  /** Parse a `.zmetadata` consolidated-metadata document (what
    * `to_zarr(consolidated=True)` writes — the reference does,
    * /root/reference/atl06_to_atl11.py:301): every `<path>/.zarray`
    * entry under `metadata`, keyed by array path (nested groups keep
    * their slash path, which doubles as the chunk-dir path).
    */
  def parseConsolidated(json: String): Map[String, ArrayMeta] = {
    val n = mapper.readTree(json)
    require(n.path("zarr_consolidated_format").asInt(1) == 1,
      s"unsupported zarr_consolidated_format ${n.path("zarr_consolidated_format")}")
    val md = n.path("metadata")
    require(md.isObject, ".zmetadata has no metadata object")
    val out = Map.newBuilder[String, ArrayMeta]
    val it = md.properties().iterator()
    while (it.hasNext) {
      val e = it.next()
      val key = e.getKey
      if (key.endsWith("/.zarray"))
        out += key.stripSuffix("/.zarray") -> parse(e.getValue.toString)
    }
    out.result()
  }

  /** `.zattrs` naming the dimensions — xarray refuses to open an
    * array without `_ARRAY_DIMENSIONS` (its netCDF-style dim names),
    * and the reference reads every store through xarray. The leading
    * dim is the shared "index" (every array has the same row count);
    * trailing dims are per-array (`<name>_dim1`, ...) so two rank-2
    * arrays of DIFFERENT widths never declare conflicting sizes for
    * one dim name — xarray would refuse to open the whole store.
    */
  def zattrs(name: String, rank: Int): String = {
    val dims = (0 until rank)
      .map(i => if (i == 0) "\"index\"" else s""""${name}_dim$i"""")
      .mkString("[", ", ", "]")
    s"""{"_ARRAY_DIMENSIONS": $dims}"""
  }

  /** Emit `.zmetadata` for a flat store of the given arrays. */
  def emitConsolidated(arrays: Seq[(String, ArrayMeta)]): String = {
    val root: ObjectNode = mapper.createObjectNode()
    val md = root.putObject("metadata")
    md.set[JsonNode](".zgroup", mapper.readTree(ZGroup))
    arrays.foreach { case (name, m) =>
      md.set[JsonNode](s"$name/.zarray", mapper.readTree(emit(m)))
      md.set[JsonNode](s"$name/.zattrs", mapper.readTree(zattrs(name, m.rank)))
    }
    root.put("zarr_consolidated_format", 1)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }
}
