package graft.sources.zarr

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{GZIPInputStream, Inflater}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import ZarrMeta.ArrayMeta

/** Zarr v2 directory-store access: array discovery, chunk fetch +
  * decompress, and row-range decode. Pure byte-level (no zarr/numcodecs
  * library exists for the JVM in this container; the v2 spec is
  * public). All I/O goes through the Hadoop FileSystem API so a store
  * on HDFS/S3A reads exactly like a local one, and strictly
  * by-chunk-file — a range read fetches only the chunk files that
  * overlap it, the Zarr analogue of parquet row-group pruning.
  *
  * Supported: rank-1 and rank-2 C-order arrays, blosc/zlib/gzip/raw
  * chunks,
  * little- and big-endian f8/f4/i8/i4/i2/i1 and u1/u2/u4 (unsigned
  * zero-extends one JVM type up, mirroring the HDF5 source), missing
  * chunk files = fill_value (the spec's sparse-store semantics).
  */
object ZarrStore {

  /** Flat row-major values for a row range; `width` = elements per
    * row (1 for rank-1). One of the arrays is non-null, matching the
    * array's JVM-surfaced type.
    */
  final case class RangeData(
      width: Int,
      doubles: Array[Double] = null, floats: Array[Float] = null,
      longs: Array[Long] = null, ints: Array[Int] = null,
      shorts: Array[Short] = null, bytes: Array[Byte] = null)

  /** Consolidated metadata (`.zmetadata`) if the store carries it —
    * ONE small-file open replaces a directory listing plus a
    * `.zarray` open per array, the object-store round-trip win
    * `consolidated=True` exists for.
    */
  def consolidated(store: String,
      conf: Configuration): Option[Map[String, ArrayMeta]] = {
    val p = new Path(store, ".zmetadata")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val json =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    Some(ZarrMeta.parseConsolidated(json))
  }

  /** Array names (slash paths for arrays inside nested groups),
    * sorted: from `.zmetadata` when present, else a recursive walk
    * for directories containing `.zarray`. Both paths surface the
    * SAME names for the same store — a nested-group store must not
    * change schema depending on whether `.zmetadata` exists. Note a
    * '/' in a resulting Spark column name needs backtick quoting.
    */
  def listArrays(store: String, conf: Configuration): Seq[String] =
    consolidated(store, conf) match {
      case Some(m) => m.keys.toSeq.sorted
      case None =>
        val root = new Path(store)
        val fs = root.getFileSystem(conf)
        def walk(dir: Path, prefix: String): Seq[String] =
          fs.listStatus(dir).toSeq
            .filter(_.isDirectory)
            .map(_.getPath)
            .flatMap { d =>
              val name = s"$prefix${d.getName}"
              if (fs.exists(new Path(d, ".zarray"))) Seq(name)
              // a dir without .zarray is a (possible) group — recurse
              else walk(d, s"$name/")
            }
        walk(root, "").sorted
    }

  /** Every array's meta in one pass — one `.zmetadata` open on a
    * consolidated store, the per-array fallback otherwise.
    */
  def readAllMeta(store: String,
      conf: Configuration): Map[String, ArrayMeta] =
    consolidated(store, conf).getOrElse(
      listArrays(store, conf)
        .map(a => a -> readMeta(store, a, conf)).toMap)

  def readMeta(store: String, array: String, conf: Configuration): ArrayMeta = {
    val p = new Path(new Path(store, array), ".zarray")
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try ZarrMeta.parse(new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
    finally in.close()
  }

  /** Spark-facing JVM kind for a dtype: 'd','f','l','i','s','b'. */
  def jvmKind(m: ArrayMeta): Char = (m.kind, m.elemSize) match {
    case ('f', 8) => 'd'
    case ('f', 4) => 'f'
    case ('i', 8) => 'l'
    case ('i', 4) => 'i'
    case ('i', 2) => 's'
    case ('i', 1) => 'b'
    case ('u', 4) => 'l' // zero-extend one type up
    case ('u', 2) => 'i'
    case ('u', 1) => 's'
    case _ => throw new IllegalArgumentException(s"unsupported dtype ${m.dtype}")
  }

  private def chunkFileName(m: ArrayMeta, idx: Seq[Long]): String =
    idx.mkString(m.dimSeparator)

  /** Fetch + decompress one chunk to its full raw C-order byte block;
    * None = chunk file absent (all fill).
    */
  private def chunkBytes(
      fs: FileSystem, arrayDir: Path, m: ArrayMeta,
      idx: Seq[Long]): Option[Array[Byte]] = {
    val f = new Path(arrayDir, chunkFileName(m, idx))
    if (!fs.exists(f)) return None
    val in = fs.open(f)
    val stored =
      try org.apache.commons.io.IOUtils.toByteArray(in)
      finally in.close()
    val rawLen = (m.chunkElems * m.elemSize).toInt
    val raw = m.compressor match {
      case None => stored
      case Some(c) if c.id == "blosc" =>
        Blosc.decompress(stored, rawLen)
      case Some(ZarrMeta.Compressor("gzip", _, _, _)) =>
        val gz = new GZIPInputStream(new ByteArrayInputStream(stored))
        try org.apache.commons.io.IOUtils.toByteArray(gz) finally gz.close()
      case Some(ZarrMeta.Compressor("zlib", _, _, _)) =>
        val inf = new Inflater()
        inf.setInput(stored)
        val out = new Array[Byte](rawLen)
        var off = 0
        while (off < rawLen && !inf.finished()) {
          val n = inf.inflate(out, off, rawLen - off)
          if (n == 0 && inf.needsInput())
            throw new java.io.IOException(s"$f: truncated zlib chunk")
          off += n
        }
        inf.end()
        require(off == rawLen, s"$f: zlib chunk ${off}B, want ${rawLen}B")
        out
      case Some(c) => throw new IllegalArgumentException(
        s"unsupported compressor ${c.id}")
    }
    require(raw.length == rawLen,
      s"$f: chunk ${raw.length}B, want ${rawLen}B")
    Some(raw)
  }

  /** Decode rows [row0, row1) of a rank-1/2 array into flat row-major
    * values (rank-2 rows are full: all `shape(1)` elements).
    */
  def readRange(
      store: String, array: String, m: ArrayMeta,
      row0: Long, row1: Long, conf: Configuration): RangeData = {
    require(m.rank == 1 || m.rank == 2, s"rank ${m.rank} unsupported")
    require(row0 >= 0 && row0 <= row1 && row1 <= m.shape.head,
      s"range [$row0,$row1) outside shape ${m.shape}")
    val arrayDir = new Path(store, array)
    val fs = arrayDir.getFileSystem(conf)
    val width = if (m.rank == 2) m.shape(1).toInt else 1
    val nOut = ((row1 - row0) * width).toInt
    val kind = jvmKind(m)
    val out = RangeData(width,
      doubles = if (kind == 'd') new Array[Double](nOut) else null,
      floats = if (kind == 'f') new Array[Float](nOut) else null,
      longs = if (kind == 'l') new Array[Long](nOut) else null,
      ints = if (kind == 'i') new Array[Int](nOut) else null,
      shorts = if (kind == 's') new Array[Short](nOut) else null,
      bytes = if (kind == 'b') new Array[Byte](nOut) else null)

    val order =
      if (m.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val c0 = m.chunks.head
    val c1 = if (m.rank == 2) m.chunks(1) else 1
    val gridCols = if (m.rank == 2) m.grid(1) else 1L

    // write fill first, then overlay stored chunks (missing files stay
    // fill — the spec's sparse semantics)
    fillRange(out, kind, m.fillValue)

    var ci = row0 / c0
    while (ci * c0 < row1) {
      val chunkRow0 = ci * c0 // global first row of this chunk
      val rLo = math.max(row0, chunkRow0)
      val rHi = math.min(row1, chunkRow0 + c0)
      var cj = 0L
      while (cj < gridCols) {
        val idx = if (m.rank == 2) Seq(ci, cj) else Seq(ci)
        chunkBytes(fs, arrayDir, m, idx).foreach { raw =>
          val bb = ByteBuffer.wrap(raw).order(order)
          val colLo = (cj * c1).toInt
          val colHi = math.min((cj + 1) * c1, m.shape.lift(1).getOrElse(1L)).toInt
          var r = rLo
          while (r < rHi) {
            val inChunkRow = (r - chunkRow0).toInt
            var c = colLo
            while (c < colHi) {
              val srcElem = inChunkRow * c1 + (c - colLo)
              val dstElem = ((r - row0) * width + c).toInt
              putElem(out, kind, dstElem, bb, srcElem, m)
              c += 1
            }
            r += 1
          }
        }
        cj += 1
      }
      ci += 1
    }
    out
  }

  private def fillRange(out: RangeData, kind: Char, fill: Double): Unit =
    kind match {
      case 'd' => java.util.Arrays.fill(out.doubles, fill)
      case 'f' => java.util.Arrays.fill(out.floats, fill.toFloat)
      case 'l' => java.util.Arrays.fill(out.longs, fill.toLong)
      case 'i' => java.util.Arrays.fill(out.ints, fill.toInt)
      case 's' => java.util.Arrays.fill(out.shorts, fill.toShort)
      case 'b' => java.util.Arrays.fill(out.bytes, fill.toByte)
    }

  private def putElem(
      out: RangeData, kind: Char, dst: Int,
      bb: ByteBuffer, srcElem: Int, m: ArrayMeta): Unit = {
    val off = srcElem * m.elemSize
    kind match {
      case 'd' => out.doubles(dst) = bb.getDouble(off)
      case 'f' => out.floats(dst) = bb.getFloat(off)
      case 'l' =>
        out.longs(dst) =
          if (m.kind == 'u') bb.getInt(off).toLong & 0xffffffffL
          else bb.getLong(off)
      case 'i' =>
        out.ints(dst) =
          if (m.kind == 'u') bb.getShort(off).toInt & 0xffff
          else bb.getInt(off)
      case 's' =>
        out.shorts(dst) =
          if (m.kind == 'u') (bb.get(off).toInt & 0xff).toShort
          else bb.getShort(off)
      case 'b' => out.bytes(dst) = bb.get(off)
    }
  }
}
