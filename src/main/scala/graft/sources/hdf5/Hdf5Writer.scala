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
  *    object header address + link-message groups);
  *  - v1 object headers; groups via symbol table message -> v1 B-tree
  *    -> SNOD + local heap (sbVersion=0) or via inline hard Link
  *    messages (sbVersion=2);
  *  - datasets: little-endian IEEE f32/f64 and signed 1/2/4/8-byte
  *    fixed-point, rank 1-2, contiguous or chunked layout v3 with a
  *    v1 B-tree chunk index and optional shuffle+deflate filters;
  *  - scalar f64 attributes (for _FillValue).
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
      dtype: String, // f64 | f32 | i64 | i32 | i16 | i8
      dims: Seq[Int],
      data: Array[Byte],
      chunkDims: Option[Seq[Int]] = None,
      deflate: Option[Int] = None,
      attrs: Seq[(String, Double)] = Nil)

  /** `subgroups` nest arbitrarily — the ATL06 layout is
    * `/{laser}/land_ice_segments/<datasets>` (atl06_play.py:308-339).
    */
  final case class Group(name: String, dsets: Seq[Dset],
      subgroups: Seq[Group] = Nil)

  def elemSize(dtype: String): Int = dtype match {
    case "f64" | "i64" => 8
    case "f32" | "i32" => 4
    case "i16"         => 2
    case "i8"          => 1
    case other         => throw new IllegalArgumentException(s"dtype $other")
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

  // ---- datatype message encodings (spec IV.A.2.d) -----------------

  private def datatypeBytes(dtype: String): Array[Byte] = {
    val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    dtype match {
      case "f64" | "f32" =>
        val (size, signLoc, expLoc, expSize, manSize, bias) =
          if (dtype == "f64") (8, 63, 52, 11, 52, 1023) else (4, 31, 23, 8, 23, 127)
        b.put(0x11.toByte) // version 1, class 1 (float)
        b.put(0x20.toByte) // LE, implied-msb mantissa normalization
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
        b.put(0x08.toByte) // LE, signed (two's complement)
        b.put(0.toByte); b.put(0.toByte)
        b.putInt(size)
        b.putShort(0)
        b.putShort((size * 8).toShort)
    }
    java.util.Arrays.copyOf(b.array(), b.position())
  }

  private def dataspaceBytes(dims: Seq[Int]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + dims.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(dims.size.toByte); b.put(0.toByte) // v1, rank, flags
    b.put(Array[Byte](0, 0, 0, 0, 0)) // reserved
    dims.foreach(d => b.putLong(d.toLong))
    b.array()
  }

  /** v1 header message: type, data (padded to 8). */
  private def message(buf: Buf, mtype: Int, data: Array[Byte]): Unit = {
    val padded = (data.length + 7) & ~7
    buf.u16(mtype); buf.u16(padded); buf.u8(0); buf.u8(0); buf.u8(0); buf.u8(0)
    buf.bytes(data); buf.zeros(padded - data.length)
  }

  /** Write a v1 object header with the given (type, data) messages;
    * returns its address.
    */
  private def objectHeader(buf: Buf, msgs: Seq[(Int, Array[Byte])]): Long = {
    buf.pad8()
    val addr = buf.pos
    val bodySize = msgs.map { case (_, d) => 8 + ((d.length + 7) & ~7) }.sum
    buf.u8(1); buf.u8(0) // version, reserved
    buf.u16(msgs.size)
    buf.u32(1L) // reference count
    buf.u32(bodySize.toLong)
    buf.zeros(4) // pad to 8-aligned message block
    msgs.foreach { case (t, d) => message(buf, t, d) }
    addr
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
  private def writeDset(buf: Buf, ds: Dset): Long = {
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
          buf.pad8()
          val addr = buf.pos
          buf.bytes(stored)
          (off, stored.length, addr)
        }
        // v1 B-tree, node type 1 (chunked raw data), single level-0 node
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
      Seq(0x0001 -> dataspaceBytes(ds.dims),
          0x0003 -> datatypeBytes(ds.dtype)) ++
        filterMsg ++
        Seq(0x0008 -> layoutData) ++
        ds.attrs.map { case (n, v) => 0x000C -> attributeBytes(n, v) }
    objectHeader(buf, msgs)
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
  private def writeLinkGroup(buf: Buf, children: Seq[(String, Long)]): Long = {
    val msgs = children.sortBy(_._1).map { case (n, addr) =>
      val nameB = n.getBytes("UTF-8")
      val b = ByteBuffer.allocate(3 + nameB.length + 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte) // link message version 1
      b.put(0.toByte) // flags: 1-byte name length, hard link, no extras
      b.put(nameB.length.toByte)
      b.put(nameB)
      b.putLong(addr)
      0x0006 -> b.array()
    }
    objectHeader(buf, msgs)
  }

  /** Depth-first: datasets and subgroups first, then this group's
    * plumbing; returns the group's object header address.
    */
  private def writeGroup(buf: Buf, g: Group, sbVersion: Int): Long = {
    val childAddrs = g.dsets.map(d => d.name -> writeDset(buf, d)) ++
      g.subgroups.map(sg => sg.name -> writeGroup(buf, sg, sbVersion))
    if (sbVersion == 0) writeSymbolTableGroup(buf, childAddrs)._1
    else writeLinkGroup(buf, childAddrs)
  }

  /** Write a complete file. sbVersion 0 = classic symbol-table
    * layout; 2 = v2 superblock with link-message groups.
    */
  def write(path: String, groups: Seq[Group], sbVersion: Int = 0): Unit = {
    require(sbVersion == 0 || sbVersion == 2, s"superblock v$sbVersion")
    val buf = new Buf
    val sbSize = if (sbVersion == 0) 96 else 48
    buf.zeros(sbSize) // reserve; patched below

    val groupAddrs: Seq[(String, Long)] =
      groups.map(g => g.name -> writeGroup(buf, g, sbVersion))

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
      Files.write(Paths.get(path), out)
    } else {
      val rootAddr = writeLinkGroup(buf, groupAddrs)
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
      Files.write(Paths.get(path), out)
    }
  }
}
