package graft.sources.hdf5

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.zip.Deflater

/** Minimal from-scratch HDF5 *writer* — enough of the public HDF5
  * File Format Specification (v1.x "classic" layout) to hand-craft
  * ATL11-shaped fixture granules for [[Hdf5Reader]] tests and the s2
  * ingest gate, since this container ships no HDF5 library at all.
  *
  * Produced subset (mirrors what ICESat-2 granules actually use,
  * /root/reference/atl06_to_atl11.py:170-196 — beam-pair groups each
  * holding 1-D/2-D numeric datasets with _FillValue attributes):
  *
  *  - superblock v0 (symbol-table root group) or v2 (direct root
  *    object header address);
  *  - v1 or v2 ("OHDR", zero chunk-0 gap) object headers; groups via
  *    symbol table message -> v1 B-tree -> SNOD + local heap
  *    (sbVersion=0), via inline hard Link messages (sbVersion=2), or
  *    via dense storage (fractal heap + v2 B-tree name index,
  *    `denseGroups=true`) as real latest-format granules use;
  *  - datasets: little-endian IEEE f32/f64, signed 1/2/4/8-byte and
  *    unsigned 1/2/4-byte fixed-point, fixed-length strings ("sN"),
  *    rank 1-2, contiguous or chunked — layout v3 with a v1 B-tree
  *    chunk index or layout v4 (`chunkIndex = "latest"`: Single
  *    Chunk / Fixed Array) — with optional shuffle+deflate filters;
  *  - scalar f64 and fixed-length-string attributes (for _FillValue,
  *    units, long_name).
  *
  * Addresses are resolved by writing leaf objects first (raw data ->
  * chunk B-trees -> dataset headers -> group plumbing -> root) and
  * patching the superblock last. The v2 superblock/OHDR trailing
  * checksums are written as zero — [[Hdf5Reader]] deliberately does
  * not verify them (documented there); this writer only feeds tests.
  */
object Hdf5Writer {

  val Undef: Long = -1L // 0xFFFF... = HDF5 "undefined address"

  /** Growable little-endian buffer with absolute patching. */
  final class Buf {
    private var arr = new Array[Byte](1 << 16)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        var cap = arr.length
        while (cap < len + n) cap <<= 1
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    def pos: Long = len
    def u8(v: Int): Unit = { ensure(1); arr(len) = v.toByte; len += 1 }
    def u16(v: Int): Unit = { u8(v & 0xff); u8((v >>> 8) & 0xff) }
    def u32(v: Long): Unit = { u16((v & 0xffff).toInt); u16(((v >>> 16) & 0xffff).toInt) }
    def u64(v: Long): Unit = { u32(v & 0xffffffffL); u32(v >>> 32) }
    def bytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, arr, len, b.length); len += b.length }
    def zeros(n: Int): Unit = { ensure(n); len += n }
    def pad8(): Unit = while ((len & 7) != 0) u8(0)
    def patchU64(at: Long, v: Long): Unit = {
      val bb = ByteBuffer.wrap(arr, at.toInt, 8).order(ByteOrder.LITTLE_ENDIAN)
      bb.putLong(v)
    }
    def result: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  /** One dataset: `data` is the raw little-endian element bytes in
    * row-major order; `chunkDims` switches to chunked layout (with
    * shuffle+deflate when `deflate` is set); `attrs` are scalar f64
    * attributes (`_FillValue` et al.).
    */
  final case class Dset(
      name: String,
      dtype: String, // f64 | f32 | i64 | i32 | i16 | i8 | u8 | u16 | u32
      dims: Seq[Int],
      data: Array[Byte],
      chunkDims: Option[Seq[Int]] = None,
      deflate: Option[Int] = None,
      attrs: Seq[(String, Double)] = Nil,
      sattrs: Seq[(String, String)] = Nil, // fixed-length string attrs
      vsattrs: Seq[(String, String)] = Nil, // vlen (h5py-style) string attrs
      // "btree1" = classic layout v3 + v1 B-tree chunk index;
      // "latest" = layout v4 with the index libhdf5 latest-format
      // auto-selects: Single Chunk when the grid is one chunk, Fixed
      // Array otherwise;
      // "implicit" = layout v4 index type 2 (unfiltered only: chunks
      // back-to-back at base + i*chunkBytes, no per-chunk records —
      // the early-allocation fixed-dims shape);
      // "extarray" = layout v4 index type 4 (Extensible Array — what
      // libhdf5 picks for ONE unlimited dimension, the real-ATL11
      // append-along-ref_pt shape);
      // "btree2" = layout v4 index type 5 (v2 B-tree chunk records —
      // what libhdf5 picks for >1 unlimited dimension)
      chunkIndex: String = "btree1",
      // write max dims with dim 0 unlimited (H5S_UNLIMITED), the
      // dataspace real appendable granule datasets carry
      unlimited: Boolean = false,
      // store numeric data big-endian (datatype endian bit + swapped
      // element bytes); `data` is still supplied little-endian
      bigEndian: Boolean = false)

  /** `subgroups` nest arbitrarily — the ATL06 layout is
    * `/{laser}/land_ice_segments/<datasets>` (atl06_play.py:308-339).
    */
  final case class Group(name: String, dsets: Seq[Dset],
      subgroups: Seq[Group] = Nil)

  def elemSize(dtype: String): Int = dtype match {
    case "f64" | "i64" | "u64" => 8
    case "f32" | "i32" | "u32" => 4
    case "i16" | "u16"         => 2
    case "i8" | "u8"           => 1
    // "sN": fixed-length string of N bytes (NUL-padded)
    case s if s.startsWith("s") && s.drop(1).forall(_.isDigit) => s.drop(1).toInt
    case other                 => throw new IllegalArgumentException(s"dtype $other")
  }

  def f64Bytes(values: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(values.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(bb.putDouble); bb.array()
  }
  def f32Bytes(values: Array[Float]): Array[Byte] = {
    val bb = ByteBuffer.allocate(values.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(bb.putFloat); bb.array()
  }
  def i64Bytes(values: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(values.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(bb.putLong); bb.array()
  }
  def i32Bytes(values: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(values.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(bb.putInt); bb.array()
  }
  def i8Bytes(values: Array[Byte]): Array[Byte] = values.clone()
  /** Fixed-width string elements: UTF-8 bytes NUL-padded to `width`. */
  def strBytes(values: Seq[String], width: Int): Array[Byte] = {
    val out = new Array[Byte](values.length * width)
    values.zipWithIndex.foreach { case (v, i) =>
      val b = v.getBytes("UTF-8")
      require(b.length <= width, s"'$v' exceeds string width $width")
      System.arraycopy(b, 0, out, i * width, b.length)
    }
    out
  }

  // ---- datatype message encodings (spec IV.A.2.d) -----------------

  private def datatypeBytes(dtype: String,
      bigEndian: Boolean = false): Array[Byte] = {
    val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    val endianBit = if (bigEndian) 0x01 else 0x00
    dtype match {
      case st if st.startsWith("s") =>
        b.put(0x13.toByte) // version 1, class 3 (string)
        b.put(0.toByte) // NUL-padded, ASCII charset
        b.put(0.toByte); b.put(0.toByte)
        b.putInt(elemSize(st))
      case "f64" | "f32" =>
        val (size, signLoc, expLoc, expSize, manSize, bias) =
          if (dtype == "f64") (8, 63, 52, 11, 52, 1023) else (4, 31, 23, 8, 23, 127)
        b.put(0x11.toByte) // version 1, class 1 (float)
        b.put((0x20 | endianBit).toByte) // endianness + implied-msb mantissa
        b.put(signLoc.toByte); b.put(0.toByte)
        b.putInt(size)
        b.putShort(0) // bit offset
        b.putShort((size * 8).toShort) // precision
        b.put(expLoc.toByte); b.put(expSize.toByte)
        b.put(0.toByte); b.put(manSize.toByte) // mantissa loc/size
        b.putInt(bias)
      case _ =>
        val size = elemSize(dtype)
        b.put(0x10.toByte) // version 1, class 0 (fixed-point)
        // bit 0: big-endian; bit 3: signed two's complement
        b.put(((if (dtype.startsWith("u")) 0x00 else 0x08) | endianBit).toByte)
        b.put(0.toByte); b.put(0.toByte)
        b.putInt(size)
        b.putShort(0)
        b.putShort((size * 8).toShort)
    }
    java.util.Arrays.copyOf(b.array(), b.position())
  }

  private def dataspaceBytes(dims: Seq[Int], unlimited: Boolean = false): Array[Byte] = {
    val maxN = if (unlimited) dims.size else 0
    val b = ByteBuffer.allocate(8 + (dims.size + maxN) * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    // v1, rank, flags (bit 0 = max dims present)
    b.put(1.toByte); b.put(dims.size.toByte); b.put(if (unlimited) 1.toByte else 0.toByte)
    b.put(Array[Byte](0, 0, 0, 0, 0)) // reserved
    dims.foreach(d => b.putLong(d.toLong))
    if (unlimited) {
      // dim 0 unlimited (H5S_UNLIMITED = all ones), the rest fixed
      b.putLong(-1L)
      dims.drop(1).foreach(d => b.putLong(d.toLong))
    }
    b.array()
  }

  /** v1 header message: type, data (padded to 8). */
  private def message(buf: Buf, mtype: Int, data: Array[Byte]): Unit = {
    val padded = (data.length + 7) & ~7
    buf.u16(mtype); buf.u16(padded); buf.u8(0); buf.u8(0); buf.u8(0); buf.u8(0)
    buf.bytes(data); buf.zeros(padded - data.length)
  }

  /** Write a v1 or v2 object header with the given (type, data)
    * messages; returns its address. The v2 ("OHDR") form stores the
    * exact message-bytes size as chunk-0 with ZERO trailing gap — the
    * libhdf5 latest-format shape that regressed when the reader held
    * 4 checksum bytes back out of chunk 0 (the checksum sits after the
    * stored size, not inside it).
    */
  private def objectHeader(buf: Buf, msgs: Seq[(Int, Array[Byte])],
      v2: Boolean = false): Long = {
    buf.pad8()
    val addr = buf.pos
    if (v2) {
      // v2 messages: type u8 + size u16 + flags u8, no 8-byte padding
      val chunk0 = msgs.map { case (_, d) => 4 + d.length }.sum
      require(chunk0 < 65536, "v2 header chunk 0 too large for u16 size")
      buf.bytes("OHDR".getBytes("ASCII"))
      buf.u8(2)
      buf.u8(0x01) // flags: 2-byte chunk-0 size, no times/phase/creation-order
      buf.u16(chunk0)
      msgs.foreach { case (t, d) =>
        buf.u8(t); buf.u16(d.length); buf.u8(0)
        buf.bytes(d)
      }
      buf.u32(0L) // checksum (zero; Hdf5Reader deliberately skips it)
    } else {
      val bodySize = msgs.map { case (_, d) => 8 + ((d.length + 7) & ~7) }.sum
      buf.u8(1); buf.u8(0) // version, reserved
      buf.u16(msgs.size)
      buf.u32(1L) // reference count
      buf.u32(bodySize.toLong)
      buf.zeros(4) // pad to 8-aligned message block
      msgs.foreach { case (t, d) => message(buf, t, d) }
    }
    addr
  }

  /** v1 attribute with a scalar fixed-length-string value. */
  private def attributeStrBytes(name: String, value: String): Array[Byte] = {
    val nameB = name.getBytes("UTF-8") :+ 0.toByte
    val namePad = (nameB.length + 7) & ~7
    val width = value.getBytes("UTF-8").length + 1
    val dt = datatypeBytes(s"s$width") // 8 bytes -> pads to 8
    val dtPad = (dt.length + 7) & ~7
    val ds = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0) // v1, rank 0 scalar
    val b = ByteBuffer.allocate(8 + namePad + dtPad + ds.length + width)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(nameB.length.toShort)
    b.putShort(dt.length.toShort)
    b.putShort(ds.length.toShort)
    b.put(nameB); b.position(8 + namePad)
    b.put(dt); b.position(8 + namePad + dtPad)
    b.put(ds)
    b.put(value.getBytes("UTF-8")); b.put(0.toByte)
    b.array()
  }

  /** Variable-length string attribute — the shape h5py emits for a
    * plain Python str attribute: a class-9 (vlen string) scalar whose
    * 16-byte value is (length, global-heap collection address, object
    * index). The string bytes go into a fresh one-object Global Heap
    * collection written into `buf` first.
    */
  private def attributeVlenStrBytes(
      buf: Buf, name: String, value: String): Array[Byte] = {
    val strB = value.getBytes("UTF-8")
    // one-object GCOL: header (16) + object entry (16 + padded data)
    buf.pad8()
    val collAddr = buf.pos
    val dataPad = (strB.length + 7) & ~7
    val collSize = 16L + 16L + dataPad
    buf.bytes("GCOL".getBytes("ASCII"))
    buf.u8(1); buf.u8(0); buf.u8(0); buf.u8(0) // version + reserved
    buf.u64(collSize)
    buf.u16(1) // object index 1
    buf.u16(1) // refcount
    buf.u32(0L) // reserved
    buf.u64(strB.length.toLong)
    buf.bytes(strB)
    buf.zeros(dataPad - strB.length)

    val nameB = name.getBytes("UTF-8") :+ 0.toByte
    val namePad = (nameB.length + 7) & ~7
    // class-9 vlen-string datatype: version 1, type=string (bits 0-3),
    // nul-pad, ASCII/UTF-8 charset; size = 16 (the reference triple);
    // properties carry the base type (1-byte class-3 string)
    val base = datatypeBytes("s1")
    val dt = ByteBuffer.allocate(8 + base.length).order(ByteOrder.LITTLE_ENDIAN)
    dt.put(((1 << 4) | 9).toByte) // version 1, class 9
    dt.put(0x01.toByte) // type 1: vlen string
    dt.put(0.toByte); dt.put(0.toByte)
    dt.putInt(16)
    dt.put(base)
    val dtB = dt.array()
    val dtPad = (dtB.length + 7) & ~7
    val ds = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0) // v1, rank 0 scalar
    val b = ByteBuffer.allocate(8 + namePad + dtPad + ds.length + 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(nameB.length.toShort)
    b.putShort(dtB.length.toShort)
    b.putShort(ds.length.toShort)
    b.put(nameB); b.position(8 + namePad)
    b.put(dtB); b.position(8 + namePad + dtPad)
    b.put(ds)
    b.putInt(strB.length)
    b.putLong(collAddr)
    b.putInt(1) // object index
    b.array()
  }

  private def attributeBytes(name: String, value: Double): Array[Byte] = {
    val nameB = name.getBytes("UTF-8") :+ 0.toByte
    val namePad = (nameB.length + 7) & ~7
    val dt = datatypeBytes("f64") // 20 -> padded 24
    val dtPad = (dt.length + 7) & ~7
    val ds = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0) // v1, rank 0 scalar
    val b = ByteBuffer.allocate(8 + namePad + dtPad + ds.length + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(0.toByte) // version 1, reserved
    b.putShort(nameB.length.toShort)
    b.putShort(dt.length.toShort)
    b.putShort(ds.length.toShort)
    b.put(nameB); b.position(8 + namePad)
    b.put(dt); b.position(8 + namePad + dtPad)
    b.put(ds)
    b.putDouble(value)
    b.array()
  }

  // ---- dataset writing --------------------------------------------

  private def shuffleBytes(raw: Array[Byte], esz: Int): Array[Byte] = {
    if (esz <= 1) return raw
    val n = raw.length / esz
    val out = new Array[Byte](raw.length)
    var p = 0
    while (p < esz) {
      var i = 0
      while (i < n) { out(p * n + i) = raw(i * esz + p); i += 1 }
      p += 1
    }
    out
  }

  private def deflateBytes(raw: Array[Byte], level: Int): Array[Byte] = {
    val d = new Deflater(level)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  /** Writes one dataset's storage + header; returns the header address. */
  private def writeDset(buf: Buf, dsIn: Dset, v2: Boolean = false): Long = {
    // big-endian mode: swap the (little-endian-supplied) element bytes
    // once up front; every layout/filter path below then stores the
    // bytes exactly as a big-endian writer would
    val ds =
      if (dsIn.bigEndian && !dsIn.dtype.startsWith("s") &&
          elemSize(dsIn.dtype) > 1) {
        val e = elemSize(dsIn.dtype)
        val sw = dsIn.data.clone()
        var i = 0
        while (i < sw.length) {
          var a = 0; var b = e - 1
          while (a < b) {
            val t = sw(i + a); sw(i + a) = sw(i + b); sw(i + b) = t
            a += 1; b -= 1
          }
          i += e
        }
        dsIn.copy(data = sw)
      } else dsIn
    val esz = elemSize(ds.dtype)
    val nElems = ds.dims.product
    require(ds.data.length == nElems * esz,
      s"${ds.name}: ${ds.data.length} bytes != $nElems x $esz")

    val layoutData: Array[Byte] = ds.chunkDims match {
      case None =>
        buf.pad8()
        val dataAddr = buf.pos
        buf.bytes(ds.data)
        val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
        b.put(3.toByte); b.put(1.toByte) // layout v3, contiguous
        b.putLong(dataAddr); b.putLong(ds.data.length.toLong)
        b.array()
      case Some(cd) =>
        require(cd.size == ds.dims.size, s"${ds.name}: chunk rank mismatch")
        // enumerate chunks in row-major order of their grid position
        val grid = ds.dims.zip(cd).map { case (d, c) => (d + c - 1) / c }
        val chunkCount = grid.product
        val rank = ds.dims.size
        val chunks = (0 until chunkCount).map { ci =>
          // grid coords of this chunk
          val coord = new Array[Int](rank)
          var rem = ci
          var k = rank - 1
          while (k >= 0) { coord(k) = rem % grid(k); rem /= grid(k); k -= 1 }
          val off = coord.zip(cd).map { case (g, c) => g * c }
          // extract FULL chunk (edge chunks zero-padded, as libhdf5 does)
          val chunkRaw = new Array[Byte](cd.product * esz)
          val lastRun = math.min(cd(rank - 1), ds.dims(rank - 1) - off(rank - 1))
          val outerDims = cd.dropRight(1)
          val outerCount = if (rank == 1) 1 else outerDims.product
          var oi = 0
          while (oi < outerCount) {
            // outer index -> source coords, skip rows past the edge
            var rem2 = oi; var inBounds = true
            val src = new Array[Int](rank)
            var kk = rank - 2
            while (kk >= 0) {
              val c = rem2 % outerDims(kk); rem2 /= outerDims(kk)
              src(kk) = off(kk) + c
              if (src(kk) >= ds.dims(kk)) inBounds = false
              kk -= 1
            }
            src(rank - 1) = off(rank - 1)
            if (inBounds && lastRun > 0) {
              var flat = 0L
              var k2 = 0
              while (k2 < rank) { flat = flat * ds.dims(k2) + src(k2); k2 += 1 }
              System.arraycopy(ds.data, (flat * esz).toInt,
                chunkRaw, oi * cd(rank - 1) * esz, lastRun * esz)
            }
            oi += 1
          }
          val stored = ds.deflate match {
            case Some(level) => deflateBytes(shuffleBytes(chunkRaw, esz), level)
            case None        => chunkRaw
          }
          // implicit index: chunks MUST be back-to-back at base +
          // i*chunkBytes (the index has no per-chunk records), so only
          // the first chunk aligns; every other mode pads each chunk
          if (ds.chunkIndex != "implicit" || ci == 0) buf.pad8()
          val addr = buf.pos
          buf.bytes(stored)
          (off, stored.length, addr)
        }
        def v4LayoutHeader(b: ByteBuffer, flags: Int): Unit = {
          b.put(4.toByte); b.put(2.toByte) // layout v4, chunked
          b.put(flags.toByte)
          b.put((rank + 1).toByte)
          b.put(4.toByte) // 4-byte encoded dims
          cd.foreach(c => b.putInt(c))
          b.putInt(esz)
        }
        ds.chunkIndex match {
          case "btree1" =>
            // v1 B-tree, node type 1 (chunked raw data), one level-0 node
            buf.pad8()
            val btreeAddr = buf.pos
            buf.bytes("TREE".getBytes("ASCII"))
            buf.u8(1); buf.u8(0) // type 1, level 0
            buf.u16(chunks.size)
            buf.u64(Undef); buf.u64(Undef) // siblings
            chunks.foreach { case (off, nbytes, addr) =>
              buf.u32(nbytes.toLong); buf.u32(0L) // size, filter mask
              off.foreach(o => buf.u64(o.toLong)); buf.u64(0L)
              buf.u64(addr)
            }
            // trailing bound key (ignored by readers; libhdf5 writes max dims)
            buf.u32(0L); buf.u32(0L)
            ds.dims.foreach(d => buf.u64(d.toLong)); buf.u64(0L)
            val b = ByteBuffer.allocate(3 + 8 + (rank + 1) * 4)
              .order(ByteOrder.LITTLE_ENDIAN)
            b.put(3.toByte); b.put(2.toByte) // layout v3, chunked
            b.put((rank + 1).toByte)
            b.putLong(btreeAddr)
            cd.foreach(c => b.putInt(c))
            b.putInt(esz)
            b.array()
          case "latest" =>
            // layout v4 with the index libhdf5 latest-format picks:
            // exactly one chunk -> Single Chunk; else Fixed Array
            // (client 1 with 4-byte sizes when filtered, client 0
            // address-only otherwise)
            val filtered = ds.deflate.isDefined
            def v4Header(b: ByteBuffer, flags: Int): Unit = v4LayoutHeader(b, flags)
            if (chunks.size == 1) {
              val (_, nbytes, addr) = chunks.head
              val extra = if (filtered) 12 else 0
              val b = ByteBuffer.allocate(5 + (rank + 1) * 4 + 1 + extra + 8)
                .order(ByteOrder.LITTLE_ENDIAN)
              v4Header(b, if (filtered) 0x02 else 0x00)
              b.put(1.toByte) // index type 1: single chunk
              if (filtered) { b.putLong(nbytes.toLong); b.putInt(0) }
              b.putLong(addr)
              b.array()
            } else {
              val clientId = if (filtered) 1 else 0
              val entrySize = if (filtered) 16 else 8 // addr + size(4) + mask
              var pageBits = 4
              while ((1L << pageBits) < chunks.size) pageBits += 1
              buf.pad8()
              val fadbAddr = buf.pos
              buf.bytes("FADB".getBytes("ASCII"))
              buf.u8(0); buf.u8(clientId)
              val hdrPatch = buf.pos
              buf.u64(0L) // header address, patched below
              chunks.foreach { case (_, nbytes, addr) =>
                buf.u64(addr)
                if (filtered) { buf.u32(nbytes.toLong); buf.u32(0L) }
              }
              buf.u32(0L) // checksum (zero; reader skips)
              buf.pad8()
              val fahdAddr = buf.pos
              buf.bytes("FAHD".getBytes("ASCII"))
              buf.u8(0); buf.u8(clientId)
              buf.u8(entrySize); buf.u8(pageBits)
              buf.u64(chunks.size.toLong) // max entries (= grid slots)
              buf.u64(fadbAddr)
              buf.u32(0L) // checksum
              buf.patchU64(hdrPatch, fahdAddr)
              val b = ByteBuffer.allocate(5 + (rank + 1) * 4 + 1 + 1 + 8)
                .order(ByteOrder.LITTLE_ENDIAN)
              v4Header(b, 0x00)
              b.put(3.toByte) // index type 3: fixed array
              b.put(pageBits.toByte)
              b.putLong(fahdAddr)
              b.array()
            }
          case "implicit" =>
            // layout v4 index type 2: no per-chunk records at all —
            // chunk i of the row-major grid lives at base address +
            // i * chunkBytes. Only legal without filters (every chunk
            // must have its nominal size). libhdf5 emits this for
            // fixed-dims unfiltered chunked datasets with early
            // allocation.
            require(ds.deflate.isEmpty,
              s"${ds.name}: implicit chunk index cannot carry filters")
            val base = chunks.headOption.map(_._3).getOrElse(Undef)
            val b = ByteBuffer.allocate(5 + (rank + 1) * 4 + 1 + 8)
              .order(ByteOrder.LITTLE_ENDIAN)
            v4LayoutHeader(b, 0x00)
            b.put(2.toByte) // index type 2: implicit
            b.putLong(base)
            b.array()
          case "extarray" =>
            // layout v4 index type 4 (Extensible Array). Geometry
            // mirrors libhdf5's chunk-index defaults so the reader's
            // derived quantities are exercised exactly as a real
            // 1-unlimited-dim granule would: idxBlkElmts=4 inline
            // elements, minElmts=16, minPtrs=4 (collapses secondary
            // blocks 0-3 into 6 direct data-block pointers in the
            // index block), pageBits=10 (we refuse to write paged
            // blocks rather than emit something the reader rejects).
            val filtered = ds.deflate.isDefined
            val clientId = if (filtered) 1 else 0
            val eaElemSize = if (filtered) 16 else 8 // addr + size(4) + mask(4)
            val maxBits = 32; val idxElmts = 4; val minElmts = 16
            val minPtrs = 4; val pageBits = 10
            val arrOffSize = (maxBits + 7) / 8
            def ndblks(s: Int): Int = 1 << (s / 2)
            def dblkNelmts(s: Int): Int = minElmts << ((s + 1) / 2)
            val nSblks = 2 * (maxBits - 4) // log2(minElmts) = 4
            val directSblks = 2 * 2 // 2 * log2(minPtrs)
            val directDblkAddrs = (0 until directSblks).map(ndblks).sum // 6
            val nSblkAddrs = nSblks - directSblks
            val hdrPatches = scala.collection.mutable.ArrayBuffer[Long]()

            def writeElem(ci: Int): Unit =
              if (ci < chunks.size) {
                val (_, nbytes, addr) = chunks(ci)
                buf.u64(addr)
                if (filtered) { buf.u32(nbytes.toLong); buf.u32(0L) }
              } else {
                buf.u64(Undef) // element slot allocated but unset
                if (filtered) { buf.u32(0L); buf.u32(0L) }
              }
            def writeBlockOff(off: Long): Unit = {
              var k = 0
              while (k < arrOffSize) { buf.u8(((off >>> (k * 8)) & 0xff).toInt); k += 1 }
            }

            var next = math.min(idxElmts, chunks.size)
            def writeDataBlock(ne: Int): Long = {
              buf.pad8()
              val a = buf.pos
              buf.bytes("EADB".getBytes("ASCII"))
              buf.u8(0); buf.u8(clientId)
              hdrPatches += buf.pos; buf.u64(0L) // header addr, patched
              writeBlockOff(next.toLong)
              var e = 0
              while (e < ne) { writeElem(next); next += 1; e += 1 }
              buf.u32(0L) // checksum (zero; reader skips)
              a
            }

            val dblkAddrList = scala.collection.mutable.ArrayBuffer[Long]()
            val sblkAddrList = scala.collection.mutable.ArrayBuffer[Long]()
            var s = 0
            while (next < chunks.size) {
              require(s < nSblks, s"${ds.name}: extensible array overflow")
              val ne = dblkNelmts(s)
              require(ne <= (1 << pageBits),
                s"${ds.name}: paged extensible-array data block needed ($ne elmts)")
              if (s < directSblks) {
                var d = 0
                while (d < ndblks(s)) {
                  dblkAddrList += (if (next < chunks.size) writeDataBlock(ne) else Undef)
                  d += 1
                }
              } else {
                val nd = ndblks(s)
                val sblkOff = next.toLong
                val dAddrs = (0 until nd).map(_ =>
                  if (next < chunks.size) writeDataBlock(ne) else Undef)
                buf.pad8()
                val sa = buf.pos
                buf.bytes("EASB".getBytes("ASCII"))
                buf.u8(0); buf.u8(clientId)
                hdrPatches += buf.pos; buf.u64(0L)
                writeBlockOff(sblkOff)
                dAddrs.foreach(buf.u64)
                buf.u32(0L) // checksum
                sblkAddrList += sa
              }
              s += 1
            }

            buf.pad8()
            val iblkAddr = buf.pos
            buf.bytes("EAIB".getBytes("ASCII"))
            buf.u8(0); buf.u8(clientId)
            hdrPatches += buf.pos; buf.u64(0L)
            (0 until idxElmts).foreach(writeElem)
            (0 until directDblkAddrs).foreach(i =>
              buf.u64(if (i < dblkAddrList.size) dblkAddrList(i) else Undef))
            (0 until nSblkAddrs).foreach(i =>
              buf.u64(if (i < sblkAddrList.size) sblkAddrList(i) else Undef))
            buf.u32(0L) // checksum

            buf.pad8()
            val eahdAddr = buf.pos
            buf.bytes("EAHD".getBytes("ASCII"))
            buf.u8(0); buf.u8(clientId)
            buf.u8(eaElemSize); buf.u8(maxBits); buf.u8(idxElmts)
            buf.u8(minElmts); buf.u8(minPtrs); buf.u8(pageBits)
            // stats: n sec blks, sec blk bytes, n data blks, data blk
            // bytes, max index set, n elements (readers derive
            // geometry; only the counts are meaningful)
            buf.u64(sblkAddrList.count(_ != Undef).toLong); buf.u64(0L)
            buf.u64(dblkAddrList.count(_ != Undef).toLong +
              sblkAddrList.count(_ != Undef).toLong); buf.u64(0L)
            buf.u64(chunks.size.toLong); buf.u64(chunks.size.toLong)
            buf.u64(iblkAddr)
            buf.u32(0L) // checksum
            hdrPatches.foreach(p => buf.patchU64(p, eahdAddr))

            val b = ByteBuffer.allocate(5 + (rank + 1) * 4 + 1 + 5 + 8)
              .order(ByteOrder.LITTLE_ENDIAN)
            v4LayoutHeader(b, 0x00)
            b.put(4.toByte) // index type 4: extensible array
            // spec order: max bits, index elmts, min ptrs, min elmts,
            // page bits (the reader re-reads them from the EAHD)
            b.put(maxBits.toByte); b.put(idxElmts.toByte)
            b.put(minPtrs.toByte); b.put(minElmts.toByte); b.put(pageBits.toByte)
            b.putLong(eahdAddr)
            b.array()

          case "btree2" =>
            // layout v4 index type 5: records (chunk addr [+ size +
            // filter mask] + scaled offsets) in a v2 B-tree. Row-major
            // chunk order IS ascending scaled-offset order, so a
            // single leaf written in enumeration order is a valid
            // tree; the node size is grown until one leaf holds every
            // record.
            val filtered = ds.deflate.isDefined
            val recType = if (filtered) 11 else 10
            val recSize = (if (filtered) 8 + 4 + 4 else 8) + 8 * rank
            var nodeSize = 512
            while ((nodeSize - 10) / recSize < chunks.size) nodeSize *= 2
            buf.pad8()
            val leafAddr = buf.pos
            buf.bytes("BTLF".getBytes("ASCII"))
            buf.u8(0); buf.u8(recType)
            chunks.foreach { case (off, nbytes, addr) =>
              buf.u64(addr)
              if (filtered) { buf.u32(nbytes.toLong); buf.u32(0L) }
              off.zip(cd).foreach { case (o, c) => buf.u64((o / c).toLong) }
            }
            buf.u32(0L) // checksum
            buf.pad8()
            val bthdAddr = buf.pos
            buf.bytes("BTHD".getBytes("ASCII"))
            buf.u8(0); buf.u8(recType)
            buf.u32(nodeSize.toLong)
            buf.u16(recSize)
            buf.u16(0) // depth: single leaf root
            buf.u8(100); buf.u8(40) // split/merge % (libhdf5 defaults)
            buf.u64(leafAddr)
            buf.u16(chunks.size)
            buf.u64(chunks.size.toLong)
            buf.u32(0L) // checksum
            val b = ByteBuffer.allocate(5 + (rank + 1) * 4 + 1 + 4 + 1 + 1 + 8)
              .order(ByteOrder.LITTLE_ENDIAN)
            v4LayoutHeader(b, 0x00)
            b.put(5.toByte) // index type 5: v2 B-tree
            b.putInt(nodeSize)
            b.put(100.toByte); b.put(40.toByte)
            b.putLong(bthdAddr)
            b.array()

          case other =>
            throw new IllegalArgumentException(s"chunkIndex $other")
        }
    }

    val filterMsg: Seq[(Int, Array[Byte])] = ds.deflate match {
      case Some(level) if ds.chunkDims.isDefined =>
        // pipeline v1: shuffle (id 2, client=elemsize) then deflate (id 1)
        val b = ByteBuffer.allocate(8 + 16 + 16).order(ByteOrder.LITTLE_ENDIAN)
        b.put(1.toByte); b.put(2.toByte); b.put(Array[Byte](0, 0, 0, 0, 0, 0))
        b.putShort(2); b.putShort(0); b.putShort(0); b.putShort(1)
        b.putInt(esz); b.putInt(0) // odd client count -> 4-byte pad
        b.putShort(1); b.putShort(0); b.putShort(0); b.putShort(1)
        b.putInt(level); b.putInt(0)
        Seq(0x000B -> b.array())
      case _ => Nil
    }

    val msgs: Seq[(Int, Array[Byte])] =
      Seq(0x0001 -> dataspaceBytes(ds.dims, ds.unlimited),
          0x0003 -> datatypeBytes(ds.dtype, ds.bigEndian)) ++
        filterMsg ++
        Seq(0x0008 -> layoutData) ++
        ds.attrs.map { case (n, v) => 0x000C -> attributeBytes(n, v) } ++
        ds.sattrs.map { case (n, v) => 0x000C -> attributeStrBytes(n, v) } ++
        // computed eagerly: each writes its one-object GCOL into buf
        // before the object header is laid down
        ds.vsattrs.map { case (n, v) => 0x000C -> attributeVlenStrBytes(buf, n, v) }
    objectHeader(buf, msgs, v2)
  }

  // ---- group plumbing ---------------------------------------------

  /** Old-style (symbol table) group over already-written children;
    * returns (header, btree, heap) addresses.
    */
  private def writeSymbolTableGroup(
      buf: Buf, children: Seq[(String, Long)]): (Long, Long, Long) = {
    val sorted = children.sortBy(_._1)
    // local heap: offset 0 = empty string, names 8-aligned
    val nameOffsets = scala.collection.mutable.Map[String, Long]()
    val heapData = new java.io.ByteArrayOutputStream()
    heapData.write(0); (1 to 7).foreach(_ => heapData.write(0))
    sorted.foreach { case (n, _) =>
      nameOffsets(n) = heapData.size.toLong
      heapData.write(n.getBytes("UTF-8")); heapData.write(0)
      while ((heapData.size & 7) != 0) heapData.write(0)
    }
    buf.pad8()
    val heapDataAddr = buf.pos
    buf.bytes(heapData.toByteArray)
    buf.pad8()
    val heapAddr = buf.pos
    buf.bytes("HEAP".getBytes("ASCII"))
    buf.u8(0); buf.u8(0); buf.u8(0); buf.u8(0) // version, reserved
    buf.u64(heapData.size.toLong)
    buf.u64(1L) // free-list head: none (libhdf5 convention)
    buf.u64(heapDataAddr)
    // SNOD with all entries (fits: leaf k is 32 in our superblock)
    buf.pad8()
    val snodAddr = buf.pos
    buf.bytes("SNOD".getBytes("ASCII"))
    buf.u8(1); buf.u8(0)
    buf.u16(sorted.size)
    sorted.foreach { case (n, addr) =>
      buf.u64(nameOffsets(n)); buf.u64(addr)
      buf.u32(0L); buf.u32(0L); buf.zeros(16) // no cache
    }
    // group B-tree: one level-0 node, one SNOD child
    buf.pad8()
    val btreeAddr = buf.pos
    buf.bytes("TREE".getBytes("ASCII"))
    buf.u8(0); buf.u8(0)
    buf.u16(1)
    buf.u64(Undef); buf.u64(Undef)
    buf.u64(0L) // key 0: less-than-all bound
    buf.u64(snodAddr)
    buf.u64(nameOffsets(sorted.last._1)) // key 1: last name
    val symtab = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    symtab.putLong(btreeAddr); symtab.putLong(heapAddr)
    val headerAddr = objectHeader(buf, Seq(0x0011 -> symtab.array()))
    (headerAddr, btreeAddr, heapAddr)
  }

  /** New-style compact group: hard Link messages inline in the header. */
  private def writeLinkGroup(buf: Buf, children: Seq[(String, Long)],
      v2: Boolean = false): Long = {
    val msgs = children.sortBy(_._1).map { case (n, addr) =>
      0x0006 -> linkMessageBytes(n, addr)
    }
    objectHeader(buf, msgs, v2)
  }

  private def linkMessageBytes(name: String, addr: Long): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    val b = ByteBuffer.allocate(3 + nameB.length + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte) // link message version 1
    b.put(0.toByte) // flags: 1-byte name length, hard link, no extras
    b.put(nameB.length.toByte)
    b.put(nameB)
    b.putLong(addr)
    b.array()
  }

  private def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))

  /** Bob Jenkins' public-domain lookup3 hashlittle with initval 0 —
    * what libhdf5 uses to hash link names into v2 B-tree records
    * (H5_checksum_lookup3). Only record ORDER depends on it here (the
    * reader enumerates all records), but writing the real hash keeps
    * the fixture faithful to production files.
    */
  private[hdf5] def lookup3(key: Array[Byte]): Int = {
    var a = 0xdeadbeef + key.length
    var b = a
    var c = a
    var i = 0
    var len = key.length
    @inline def k(j: Int): Int = key(i + j) & 0xff
    while (len > 12) {
      a += k(0) | (k(1) << 8) | (k(2) << 16) | (k(3) << 24)
      b += k(4) | (k(5) << 8) | (k(6) << 16) | (k(7) << 24)
      c += k(8) | (k(9) << 8) | (k(10) << 16) | (k(11) << 24)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      i += 12; len -= 12
    }
    if (len == 0) return c // hashlittle returns c untouched on empty tail
    if (len >= 12) c += k(11) << 24
    if (len >= 11) c += k(10) << 16
    if (len >= 10) c += k(9) << 8
    if (len >= 9) c += k(8)
    if (len >= 8) b += k(7) << 24
    if (len >= 7) b += k(6) << 16
    if (len >= 6) b += k(5) << 8
    if (len >= 5) b += k(4)
    if (len >= 4) a += k(3) << 24
    if (len >= 3) a += k(2) << 16
    if (len >= 2) a += k(1) << 8
    a += k(0)
    c ^= b; c -= rot(b, 14)
    a ^= c; a -= rot(c, 11)
    b ^= a; b -= rot(a, 25)
    c ^= b; c -= rot(b, 16)
    a ^= c; a -= rot(c, 4)
    b ^= a; b -= rot(a, 14)
    c ^= b; c -= rot(b, 24)
    c
  }

  /** Dense (fractal-heap) group storage — the layout libhdf5 "latest
    * format" uses for real ATL11 beam-pair groups: link messages live
    * as managed objects in a fractal heap (one root direct block here),
    * indexed by a single-leaf v2 B-tree on the lookup3 name hash, with
    * a Link Info message pointing at both. Structure checksums are
    * written as zero ([[Hdf5Reader]] deliberately never verifies them).
    */
  private def writeDenseGroup(buf: Buf, children: Seq[(String, Long)],
      v2: Boolean = false): Long = {
    val linkMsgs = children.sortBy(_._1)
      .map { case (n, addr) => n -> linkMessageBytes(n, addr) }
    val offBytes = 4 // max heap size = 32 bits
    val lenBytes = 2 // max managed object size = 4096
    val hdrLen = 4 + 1 + 8 + offBytes // FHDB header, no block checksum
    val contentSize = linkMsgs.map(_._2.length).sum
    var blockSize = 512L
    while (blockSize < hdrLen + contentSize) blockSize <<= 1
    require(blockSize <= 65536L, s"dense group too large for one direct block")

    // root direct block: heap offsets cover the block header too, so
    // the first object sits at heap offset hdrLen
    buf.pad8()
    val dblockAddr = buf.pos
    buf.bytes("FHDB".getBytes("ASCII"))
    buf.u8(0) // version
    val heapHdrPatch = buf.pos
    buf.u64(0L) // heap header address, patched once FRHP is written
    buf.u32(0L) // block offset (offBytes = 4)
    val heapObjs = linkMsgs.map { case (n, m) =>
      val off = buf.pos - dblockAddr
      buf.bytes(m)
      (n, off, m.length)
    }
    buf.zeros((dblockAddr + blockSize - buf.pos).toInt)

    buf.pad8()
    val fheapAddr = buf.pos
    buf.bytes("FRHP".getBytes("ASCII"))
    buf.u8(0) // version
    buf.u16(1 + offBytes + lenBytes) // heap ID length (7, as libhdf5)
    buf.u16(0) // I/O filter encoded length
    buf.u8(0) // flags: direct blocks not checksummed
    buf.u32(4096L) // max size of managed objects
    buf.u64(0L) // next huge object id
    buf.u64(Undef) // huge-object v2 B-tree
    buf.u64(blockSize - hdrLen - contentSize) // free space in blocks
    buf.u64(Undef) // free-space manager
    buf.u64(blockSize) // managed space in heap
    buf.u64(blockSize) // allocated managed space
    buf.u64(blockSize) // direct-block iterator offset
    buf.u64(children.size.toLong) // managed object count
    buf.u64(0L); buf.u64(0L) // huge size, count
    buf.u64(0L); buf.u64(0L) // tiny size, count
    buf.u16(4) // table width
    buf.u64(blockSize) // starting block size
    buf.u64(math.max(65536L, blockSize)) // max direct block size
    buf.u16(32) // max heap size (bits)
    buf.u16(1) // starting rows in root indirect block
    buf.u64(dblockAddr) // root block address
    buf.u16(0) // current rows in root indirect: 0 = root is direct
    buf.u32(0L) // checksum (zero; reader skips)
    buf.patchU64(heapHdrPatch, fheapAddr)

    // v2 B-tree name index: records (hash, heapId) sorted by unsigned
    // hash, one leaf, depth 0
    val recSize = 4 + 1 + offBytes + lenBytes // 11, as real link indexes
    val recs = heapObjs.map { case (n, off, len) =>
      val hash = lookup3(n.getBytes("UTF-8"))
      val rb = ByteBuffer.allocate(recSize).order(ByteOrder.LITTLE_ENDIAN)
      rb.putInt(hash)
      rb.put(0.toByte) // managed object, id version 0
      rb.putInt(off.toInt)
      rb.putShort(len.toShort)
      (hash & 0xffffffffL, rb.array())
    }.sortBy(_._1)
    var nodeSize = 512L
    while (nodeSize < 10 + recs.size * recSize) nodeSize <<= 1
    buf.pad8()
    val leafAddr = buf.pos
    buf.bytes("BTLF".getBytes("ASCII"))
    buf.u8(0); buf.u8(5) // version, type 5 (link name index)
    recs.foreach(r => buf.bytes(r._2))
    buf.u32(0L) // checksum
    buf.pad8()
    val bthdAddr = buf.pos
    buf.bytes("BTHD".getBytes("ASCII"))
    buf.u8(0); buf.u8(5)
    buf.u32(nodeSize)
    buf.u16(recSize)
    buf.u16(0) // depth
    buf.u8(100); buf.u8(40) // split / merge percent (libhdf5 defaults)
    buf.u64(leafAddr)
    buf.u16(recs.size)
    buf.u64(recs.size.toLong) // total records
    buf.u32(0L) // checksum

    val li = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
    li.put(0.toByte) // Link Info version 0
    li.put(0.toByte) // flags: no creation-order tracking
    li.putLong(fheapAddr)
    li.putLong(bthdAddr)
    objectHeader(buf, Seq(0x0002 -> li.array()), v2)
  }

  /** Depth-first: datasets and subgroups first, then this group's
    * plumbing; returns the group's object header address.
    */
  private def writeGroup(buf: Buf, g: Group, sbVersion: Int,
      dense: Boolean, v2Headers: Boolean): Long = {
    val childAddrs = g.dsets.map(d => d.name -> writeDset(buf, d, v2Headers)) ++
      g.subgroups.map(sg =>
        sg.name -> writeGroup(buf, sg, sbVersion, dense, v2Headers))
    if (dense) writeDenseGroup(buf, childAddrs, v2Headers)
    else if (sbVersion == 0) writeSymbolTableGroup(buf, childAddrs)._1
    else writeLinkGroup(buf, childAddrs, v2Headers)
  }

  /** Write a complete file. sbVersion 0 = classic symbol-table
    * layout; 2 = v2 superblock with link-message groups. `denseGroups`
    * stores every group (incl. the v2 root) via fractal-heap dense
    * link storage, the layout real latest-format granules use.
    */
  def write(path: String, groups: Seq[Group], sbVersion: Int = 0,
      denseGroups: Boolean = false, v2Headers: Boolean = false): Unit =
    Files.write(Paths.get(path),
      fileBytes(groups, sbVersion, denseGroups, v2Headers))

  /** The complete serialized file — the byte sink is the caller's
    * choice ([[Hdf5Sink]] streams these through the Hadoop FileSystem
    * API so granules land on HDFS/S3A, not executor-local disk).
    */
  def fileBytes(groups: Seq[Group], sbVersion: Int = 0,
      denseGroups: Boolean = false, v2Headers: Boolean = false): Array[Byte] = {
    require(!v2Headers || sbVersion == 2,
      "v2 object headers pair with the v2 superblock in this writer")
    require(sbVersion == 0 || sbVersion == 2, s"superblock v$sbVersion")
    require(!denseGroups || sbVersion == 2,
      "dense groups require the v2 superblock (root is an object header)")
    val buf = new Buf
    val sbSize = if (sbVersion == 0) 96 else 48
    buf.zeros(sbSize) // reserve; patched below

    val groupAddrs: Seq[(String, Long)] =
      groups.map(g =>
        g.name -> writeGroup(buf, g, sbVersion, denseGroups, v2Headers))

    if (sbVersion == 0) {
      val (rootAddr, rootBtree, rootHeap) = writeSymbolTableGroup(buf, groupAddrs)
      val eof = buf.pos
      val sb = ByteBuffer.allocate(96).order(ByteOrder.LITTLE_ENDIAN)
      sb.put(Hdf5Reader.Signature)
      sb.put(0.toByte); sb.put(0.toByte); sb.put(0.toByte); sb.put(0.toByte)
      sb.put(0.toByte) // shared-header-msg version
      sb.put(8.toByte); sb.put(8.toByte); sb.put(0.toByte) // offsets, lengths
      sb.putShort(32) // group leaf node k (SNOD holds up to 2k entries)
      sb.putShort(16) // group internal node k
      sb.putInt(0) // consistency flags
      sb.putLong(0L); sb.putLong(Undef); sb.putLong(eof); sb.putLong(Undef)
      // root symbol table entry, cache type 1 (btree + heap)
      sb.putLong(0L); sb.putLong(rootAddr); sb.putInt(1); sb.putInt(0)
      sb.putLong(rootBtree); sb.putLong(rootHeap)
      val out = buf.result
      System.arraycopy(sb.array(), 0, out, 0, 96)
      out
    } else {
      val rootAddr =
        if (denseGroups) writeDenseGroup(buf, groupAddrs, v2Headers)
        else writeLinkGroup(buf, groupAddrs, v2Headers)
      val eof = buf.pos
      val sb = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
      sb.put(Hdf5Reader.Signature)
      sb.put(2.toByte) // superblock v2
      sb.put(8.toByte); sb.put(8.toByte) // offsets, lengths
      sb.put(0.toByte) // consistency flags
      sb.putLong(0L) // base address
      sb.putLong(Undef) // superblock extension
      sb.putLong(eof)
      sb.putLong(rootAddr)
      sb.putInt(0) // checksum: not computed (fixture-only writer)
      val out = buf.result
      System.arraycopy(sb.array(), 0, out, 0, 48)
      out
    }
  }
}
