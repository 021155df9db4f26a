package graft.sources.hdf5

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}

/** Minimal from-scratch pure-JVM HDF5 *reader* — the byte-decode half
  * of S2 ingest (the reference's actual entry point reads ATL06/ATL11
  * HDF5 granules: /root/reference/atl06_to_atl11.py:170-196,
  * atl06_play.py:308-339). No HDF5 library ships in this container,
  * and the format is public, so this implements exactly the subset
  * ICESat-2-style granules need:
  *
  *  - superblock v0 (classic) and v2/v3 (root header address direct);
  *  - object headers v1 and v2 ("OHDR"), incl. continuation blocks;
  *  - groups via symbol tables (v1 B-tree -> SNOD + local heap), via
  *    compact Link messages, and via dense storage (fractal-heap
  *    managed objects enumerated through the v2 B-tree name index) —
  *    the layout real NSIDC ATL11 granules use for beam-pair groups
  *    (/root/reference/atl06_to_atl11.py:170-196);
  *  - datasets: little-endian fixed-point (signed + zero-extended
  *    unsigned), IEEE float, and fixed-length strings; layout v3
  *    compact/contiguous/chunked with a v1 B-tree chunk index (any
  *    depth) and layout v4 with ALL FIVE latest-format chunk indexes
  *    (Single Chunk, Implicit, Fixed Array, Extensible Array, v2
  *    B-tree); filters: deflate (java.util.zip.Inflater),
  *    shuffle, fletcher32 (checksum skipped, not verified);
  *  - scalar attributes (v1 messages), numeric and string — enough for
  *    the `_FillValue` masking the reference applies via
  *    mask_and_scale, plus units/long_name-style metadata.
  *
  * I/O is strictly positional (Hadoop `FSDataInputStream.readFully`),
  * so only the superblock, the headers on the path to a dataset, and
  * that dataset's own chunks are ever fetched — on HDFS/S3A a
  * per-(granule, beam-pair) Spark split reads just its slice of the
  * file, never the whole granule. Trailing checksums on v2 structures
  * are NOT verified (corruption detection is delegated to the
  * filesystem layer, same stance as fletcher32 above).
  */
object Hdf5Reader {

  val Signature: Array[Byte] =
    Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  val Undef: Long = -1L

  /** clazz 0 = fixed-point, 1 = float, 3 = fixed-length string (size
    * bytes, NUL-padded), 9 = vlen string (attrs only). Big-endian
    * numeric data is byte-swapped to little-endian during readRaw, so
    * every downstream consumer sees one byte order. */
  final case class Dtype(clazz: Int, size: Int, signed: Boolean,
      bigEndian: Boolean = false)

  sealed trait Layout
  final case class Compact(data: Array[Byte]) extends Layout
  final case class Contiguous(addr: Long, size: Long) extends Layout
  /** chunkDims excludes the trailing element-size dimension. */
  final case class Chunked(btreeAddr: Long, chunkDims: Seq[Int]) extends Layout
  /** Layout v4, index type 1: the dataset is exactly one chunk at
    * `addr`; `filteredSize` is the stored byte count when a filter
    * pipeline applies (-1 = unfiltered, size is the raw chunk).
    */
  final case class ChunkedSingle(addr: Long, chunkDims: Seq[Int],
      filteredSize: Long) extends Layout
  /** Layout v4, index type 3: chunk addresses (+ sizes when filtered)
    * live in a Fixed Array indexed by row-major chunk-grid position.
    */
  final case class ChunkedFixedArray(faAddr: Long, chunkDims: Seq[Int])
      extends Layout
  /** Layout v4, index type 2: no per-chunk records — chunk i of the
    * row-major grid lives at `base + i*chunkBytes`. Unfiltered only
    * (libhdf5 emits it for fixed-dims early-allocation datasets).
    */
  final case class ChunkedImplicit(base: Long, chunkDims: Seq[Int])
      extends Layout
  /** Layout v4, index type 4: chunk records live in an Extensible
    * Array (spec "Disk Format Level 1" EAHD/EAIB/EASB/EADB) indexed by
    * row-major chunk-grid position — the index libhdf5 auto-selects
    * for chunked datasets with exactly ONE unlimited dimension, i.e.
    * the shape real ATL11 granules use for their ref_pt-extent
    * datasets (h5py appends along ref_pt).
    */
  final case class ChunkedExtArray(eaAddr: Long, chunkDims: Seq[Int])
      extends Layout
  /** Layout v4, index type 5: chunk records live in a v2 B-tree
    * (record types 10 unfiltered / 11 filtered, scaled offsets as the
    * key) — the index libhdf5 auto-selects for chunked datasets with
    * MORE than one unlimited dimension.
    */
  final case class ChunkedBtree2(btAddr: Long, chunkDims: Seq[Int])
      extends Layout

  final case class Filter(id: Int, client: Seq[Int])

  final case class DatasetMeta(
      name: String,
      dtype: Dtype,
      dims: Seq[Long],
      layout: Layout,
      filters: Seq[Filter],
      attrs: Map[String, Double],
      strAttrs: Map[String, String] = Map.empty) {
    def elemCount: Long = dims.product
    def rank: Int = dims.size
  }

  /** The fractal-heap header fields dense-link resolution needs (spec
    * III.G). Object data for a managed heap ID at heap offset `off`
    * lives in the direct block covering [blockOffset, blockOffset +
    * blockSize); the doubling table sizes rows start, start, 2*start...
    */
  private[hdf5] final case class FractalHeap(
      heapIdLen: Int, flags: Int, maxManagedObjSize: Long, tableWidth: Int,
      startBlockSize: Long, maxDirectBlockSize: Long, maxHeapSizeBits: Int,
      rootAddr: Long, rootRows: Int) {
    def offBytes: Int = (maxHeapSizeBits + 7) / 8
    def lenBytes: Int = FractalHeap.bytesFor(maxManagedObjSize)
    def rowBlockSize(row: Int): Long =
      if (row < 2) startBlockSize else startBlockSize << (row - 1)
  }
  private[hdf5] object FractalHeap {
    def bytesFor(maxVal: Long): Int = {
      var n = 1
      while (n < 8 && (maxVal >>> (n * 8)) != 0) n += 1
      n
    }
  }

  /** Everything an object header can tell us (group or dataset). */
  private[hdf5] final case class ObjHeader(
      symbolTable: Option[(Long, Long)], // btree addr, heap addr
      links: Seq[(String, Long)],
      dataspace: Option[Seq[Long]],
      datatype: Option[Dtype],
      layout: Option[Layout],
      filters: Seq[Filter],
      attrs: Map[String, Double],
      strAttrs: Map[String, String],
      denseLinks: Option[(Long, Long)]) // fractal heap addr, name-index v2 B-tree addr
}

/** Positional-read handle; works on any Hadoop filesystem. */
final class Hdf5Input(val path: String, conf: Configuration) extends AutoCloseable {
  private val p = new Path(path)
  private val fs: FileSystem = p.getFileSystem(conf)
  private val stream: FSDataInputStream = fs.open(p)
  val size: Long = fs.getFileStatus(p).getLen

  def readFully(pos: Long, len: Int): Array[Byte] = {
    val b = new Array[Byte](len)
    stream.readFully(pos, b, 0, len)
    b
  }
  def bb(pos: Long, len: Int): ByteBuffer =
    ByteBuffer.wrap(readFully(pos, len)).order(ByteOrder.LITTLE_ENDIAN)
  override def close(): Unit = stream.close()
}

final class Hdf5Reader(in: Hdf5Input) extends AutoCloseable {
  import Hdf5Reader._

  def this(path: String) = this(new Hdf5Input(path, new Configuration()))
  def this(path: String, conf: Configuration) = this(new Hdf5Input(path, conf))

  override def close(): Unit = in.close()

  // ---- superblock -------------------------------------------------

  /** Root group object header address. */
  val rootAddr: Long = {
    val head = in.readFully(0L, 16)
    require(head.take(8).sameElements(Signature),
      s"${in.path}: not an HDF5 file (bad signature)")
    val version = head(8) & 0xff
    version match {
      case 0 | 1 =>
        val b = in.bb(0L, 96)
        require((b.get(13) & 0xff) == 8 && (b.get(14) & 0xff) == 8,
          s"${in.path}: only 8-byte offsets/lengths supported")
        b.getLong(64) // root symbol-table entry's object header address
      case 2 | 3 =>
        val b = in.bb(0L, 48)
        require((b.get(9) & 0xff) == 8 && (b.get(10) & 0xff) == 8,
          s"${in.path}: only 8-byte offsets/lengths supported")
        b.getLong(36)
      case v =>
        throw new IllegalArgumentException(s"${in.path}: superblock v$v unsupported")
    }
  }

  // ---- object headers ---------------------------------------------

  private def parseHeader(addr: Long): ObjHeader = {
    val sig = in.readFully(addr, 4)
    if (sig.sameElements("OHDR".getBytes("ASCII"))) parseV2Header(addr)
    else parseV1Header(addr)
  }

  private def parseV1Header(addr: Long): ObjHeader = {
    val pre = in.bb(addr, 16)
    require((pre.get(0) & 0xff) == 1, s"object header v${pre.get(0)} at $addr")
    val nMsgs = pre.getShort(2) & 0xffff
    val blockSize = pre.getInt(8)
    val msgs = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    // (blockAddr, blockLen) queue; continuation messages append more
    val blocks = scala.collection.mutable.Queue[(Long, Long)]((addr + 16, blockSize.toLong))
    while (msgs.size < nMsgs && blocks.nonEmpty) {
      val (bAddr, bLen) = blocks.dequeue()
      val b = in.bb(bAddr, bLen.toInt)
      while (msgs.size < nMsgs && b.remaining() >= 8) {
        val mtype = b.getShort() & 0xffff
        val msize = b.getShort() & 0xffff
        b.getInt() // flags + reserved
        if (b.remaining() < msize) {
          // malformed trailing slack; stop this block
          b.position(b.limit())
        } else {
          val data = new Array[Byte](msize)
          b.get(data)
          if (mtype == 0x0010) { // continuation
            val cb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
            blocks.enqueue((cb.getLong(0), cb.getLong(8)))
          } else msgs += (mtype -> data)
        }
      }
    }
    buildHeader(msgs.toSeq)
  }

  private def parseV2Header(addr: Long): ObjHeader = {
    val head = in.bb(addr, 16)
    head.position(4)
    require((head.get() & 0xff) == 2, "OHDR version != 2")
    val flags = head.get() & 0xff
    var p = addr + 6
    if ((flags & 0x20) != 0) p += 16 // access/mod/change/birth times
    if ((flags & 0x10) != 0) p += 4 // phase-change limits
    val sizeLen = 1 << (flags & 0x3)
    val szb = in.bb(p, sizeLen)
    val chunk0 = sizeLen match {
      case 1 => (szb.get(0) & 0xffL)
      case 2 => (szb.getShort(0) & 0xffffL)
      case 4 => szb.getInt(0) & 0xffffffffL
      case _ => szb.getLong(0)
    }
    p += sizeLen
    val creationOrder = (flags & 0x04) != 0
    val msgs = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    // (addr, len, isContinuation). Checksum accounting differs by block
    // kind: the stored "size of chunk 0" covers messages + gap ONLY
    // (the 4-byte checksum sits after it in the file and is NOT part of
    // the length), while a continuation message's stored length covers
    // the OCHK signature AND the trailing checksum. Holding 4 bytes
    // back from chunk 0 would silently drop its last message whenever
    // the gap is < 4 bytes — common in libhdf5 "latest format" files.
    val blocks = scala.collection.mutable.Queue[(Long, Long, Boolean)]((p, chunk0, false))
    while (blocks.nonEmpty) {
      val (bAddr, bLen, isCont) = blocks.dequeue()
      val b = in.bb(bAddr, bLen.toInt)
      if (isCont) {
        val s = new Array[Byte](4); b.get(s)
        require(s.sameElements("OCHK".getBytes("ASCII")), "bad OCHK block")
      }
      val holdback = if (isCont) 4 else 0 // OCHK blocks end in a checksum
      val msgHead = 4 + (if (creationOrder) 2 else 0)
      while (b.remaining() >= msgHead + holdback) {
        val mtype = b.get() & 0xff
        val msize = b.getShort() & 0xffff
        b.get() // flags
        if (creationOrder) b.getShort()
        if (b.remaining() < msize + holdback) b.position(b.limit())
        else {
          val data = new Array[Byte](msize)
          b.get(data)
          if (mtype == 0x0010) {
            val cb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
            blocks.enqueue((cb.getLong(0), cb.getLong(8), true))
          } else msgs += (mtype -> data)
        }
      }
    }
    buildHeader(msgs.toSeq)
  }

  private def buildHeader(msgs: Seq[(Int, Array[Byte])]): ObjHeader = {
    var symtab: Option[(Long, Long)] = None
    val links = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    var dataspace: Option[Seq[Long]] = None
    var datatype: Option[Dtype] = None
    var layout: Option[Layout] = None
    var filters: Seq[Filter] = Nil
    val attrs = scala.collection.mutable.Map[String, Double]()
    val strAttrs = scala.collection.mutable.Map[String, String]()
    var dense: Option[(Long, Long)] = None
    msgs.foreach { case (mtype, data) =>
      val b = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
      mtype match {
        case 0x0011 => symtab = Some((b.getLong(0), b.getLong(8)))
        case 0x0006 => parseLink(b).foreach(links += _)
        case 0x0002 => // Link Info: dense storage if fractal heap defined
          val version = b.get() & 0xff
          val flags = b.get() & 0xff
          if ((flags & 0x01) != 0) b.getLong() // max creation index
          val fheap = b.getLong()
          val nameBtree = b.getLong()
          if (version == 0 && fheap != Undef)
            dense = Some((fheap, nameBtree))
        case 0x0001 => dataspace = Some(parseDataspace(b))
        case 0x0003 => datatype = Some(parseDatatype(b))
        case 0x0008 => layout = Some(parseLayout(b))
        case 0x000B => filters = parseFilters(b)
        case 0x000C => parseAttr(b).foreach {
          case (k, Left(v))  => attrs(k) = v
          case (k, Right(v)) => strAttrs(k) = v
        }
        case _      => () // NIL, fill value, mod time, etc.
      }
    }
    ObjHeader(symtab, links.toSeq, dataspace, datatype, layout, filters,
      attrs.toMap, strAttrs.toMap, dense)
  }

  private def parseLink(b: ByteBuffer): Option[(String, Long)] = {
    val version = b.get() & 0xff
    if (version != 1) return None
    val flags = b.get() & 0xff
    val linkType = if ((flags & 0x08) != 0) b.get() & 0xff else 0
    if ((flags & 0x04) != 0) b.getLong() // creation order
    if ((flags & 0x10) != 0) b.get() // charset
    val nameLen = (flags & 0x03) match {
      case 0 => b.get() & 0xffL
      case 1 => b.getShort() & 0xffffL
      case 2 => b.getInt() & 0xffffffffL
      case _ => b.getLong()
    }
    val nameB = new Array[Byte](nameLen.toInt)
    b.get(nameB)
    if (linkType != 0) None // soft/external links: not needed
    else Some((new String(nameB, "UTF-8"), b.getLong()))
  }

  private def parseDataspace(b: ByteBuffer): Seq[Long] = {
    val version = b.get() & 0xff
    val rank = b.get() & 0xff
    version match {
      case 1 => b.position(8)
      case 2 => b.position(4)
      case v => throw new IllegalArgumentException(s"dataspace v$v")
    }
    (0 until rank).map(_ => b.getLong())
  }

  private def parseDatatype(b: ByteBuffer): Dtype = {
    val cv = b.get(0) & 0xff
    val clazz = cv & 0x0f
    val bits0 = b.get(1) & 0xff
    val size = b.getInt(4)
    clazz match {
      case 0 =>
        val signed = (bits0 & 0x08) != 0
        // uint64 cannot widen losslessly on the JVM; everything else
        // zero-extends in readLongs/parseAttr + widens in sparkType
        require(signed || size < 8, "uint64 unsupported (no lossless widening)")
        Dtype(0, size, signed, bigEndian = (bits0 & 0x01) != 0)
      case 1 =>
        require(size == 4 || size == 8, s"float size $size")
        Dtype(1, size, signed = true, bigEndian = (bits0 & 0x01) != 0)
      case 3 => // fixed-length string; padding/charset handled on read
        Dtype(3, size, signed = false)
      case 9 if (bits0 & 0x0f) == 1 =>
        // variable-length STRING (h5py's default for str attributes):
        // the element is a 16-byte (length, global-heap collection
        // address, object index) reference. Only the attribute path
        // consumes this class — datasets of vlen type stay rejected
        // at read time (readRaw has no vlen layout).
        Dtype(9, size, signed = false)
      case c =>
        throw new IllegalArgumentException(
          s"datatype class $c unsupported (fixed-point/float/string only)")
    }
  }

  private def parseLayout(b: ByteBuffer): Layout = {
    val version = b.get() & 0xff
    require(version == 3 || version == 4,
      s"data layout v$version unsupported (v3/v4 only)")
    (b.get() & 0xff) match {
      case 0 =>
        val n = b.getShort() & 0xffff
        val d = new Array[Byte](n); b.get(d)
        Compact(d)
      case 1 =>
        Contiguous(b.getLong(), b.getLong())
      case 2 if version == 3 =>
        val ndims = b.get() & 0xff // rank + 1 (element-size dim)
        val btree = b.getLong()
        val dims = (0 until ndims).map(_ => b.getInt())
        Chunked(btree, dims.dropRight(1))
      case 2 => // v4 chunked: latest-format chunk indexes
        val flags = b.get() & 0xff
        val ndims = b.get() & 0xff // rank + 1 (element-size dim)
        val encLen = b.get() & 0xff
        val dims = (0 until ndims).map { _ =>
          encLen match {
            case 1 => (b.get() & 0xffL).toInt
            case 2 => (b.getShort() & 0xffff)
            case 4 => b.getInt()
            case 8 => b.getLong().toInt
            case n => throw new IllegalArgumentException(s"dim enc len $n")
          }
        }
        val chunkDims = dims.dropRight(1)
        (b.get() & 0xff) match {
          case 1 => // single chunk
            val fsz: Long =
              if ((flags & 0x02) != 0) { val s = b.getLong(); b.getInt(); s }
              else -1L
            ChunkedSingle(b.getLong(), chunkDims, fsz)
          case 2 => // implicit: address only, chunks contiguous
            ChunkedImplicit(b.getLong(), chunkDims)
          case 3 => // fixed array
            b.get() // page bits (re-read from the FAHD itself)
            ChunkedFixedArray(b.getLong(), chunkDims)
          case 4 => // extensible array
            // creation params (max bits, index elmts, min ptrs, min
            // elmts, page bits) — re-read from the EAHD itself
            b.get(); b.get(); b.get(); b.get(); b.get()
            ChunkedExtArray(b.getLong(), chunkDims)
          case 5 => // v2 B-tree
            b.getInt(); b.get(); b.get() // node size, split %, merge %
            ChunkedBtree2(b.getLong(), chunkDims)
          case t => throw new IllegalArgumentException(
            s"v4 chunk index type $t unsupported")
        }
      case c => throw new IllegalArgumentException(s"layout class $c")
    }
  }

  private def parseFilters(b: ByteBuffer): Seq[Filter] = {
    val version = b.get() & 0xff
    val n = b.get() & 0xff
    if (version == 1) b.position(8) else b.position(2)
    (0 until n).map { _ =>
      val id = b.getShort() & 0xffff
      val nameLen =
        if (version == 1 || id >= 0x100) b.getShort() & 0xffff else 0
      b.getShort() // flags
      val nClient = b.getShort() & 0xffff
      if (nameLen > 0) {
        val padded = if (version == 1) (nameLen + 7) & ~7 else nameLen
        b.position(b.position() + padded)
      }
      val client = (0 until nClient).map(_ => b.getInt())
      if (version == 1 && nClient % 2 == 1) b.getInt() // odd-count pad
      Filter(id, client)
    }
  }

  /** v1 attribute with a scalar value: numeric -> Left(as-double),
    * fixed-length string -> Right(NUL-trimmed UTF-8). */
  private def parseAttr(b: ByteBuffer): Option[(String, Either[Double, String])] = {
    val version = b.get() & 0xff
    if (version != 1) return None // v2/v3 attrs not needed for granules
    b.get()
    val nameSize = b.getShort() & 0xffff
    val dtSize = b.getShort() & 0xffff
    val dsSize = b.getShort() & 0xffff
    val namePad = (nameSize + 7) & ~7
    val dtPad = (dtSize + 7) & ~7
    val dsPad = (dsSize + 7) & ~7
    val nameB = new Array[Byte](nameSize); b.get(nameB)
    val name = new String(nameB, 0, math.max(0, nameSize - 1), "UTF-8")
    b.position(8 + namePad)
    val dtB = new Array[Byte](dtSize); b.get(dtB)
    b.position(8 + namePad + dtPad)
    val dsB = new Array[Byte](dsSize); b.get(dsB)
    b.position(8 + namePad + dtPad + dsPad)
    if ((dsB(1) & 0xff) != 0) return None // non-scalar attribute
    // an attribute of a datatype this reader doesn't model (compound,
    // reference, vlen sequence, ...) is SKIPPED, never fatal — real
    // granules carry plenty of exotic metadata next to the numeric
    // attrs the pipeline actually consumes
    val dt =
      try parseDatatype(ByteBuffer.wrap(dtB).order(ByteOrder.LITTLE_ENDIAN))
      catch { case _: IllegalArgumentException => return None }
    if (b.remaining() < dt.size) return None
    if (dt.clazz == 3) {
      val raw = new Array[Byte](dt.size); b.get(raw)
      val z = raw.indexOf(0.toByte)
      return Some((name, Right(new String(raw, 0, if (z >= 0) z else raw.length, "UTF-8"))))
    }
    if (dt.clazz == 9) {
      // vlen string: (length, global heap collection address, index)
      val len = b.getInt()
      val collAddr = b.getLong()
      val idx = b.getInt()
      if (collAddr == Undef || len < 0) return None
      val data = readGlobalHeapObject(collAddr, idx)
      return Some((name,
        Right(new String(data, 0, math.min(len, data.length), "UTF-8"))))
    }
    // big-endian scalar attrs: reverse the element bytes, then decode
    // through the same little-endian view
    val vb =
      if (dt.bigEndian) {
        val raw = new Array[Byte](dt.size); b.get(raw)
        ByteBuffer.wrap(raw.reverse).order(ByteOrder.LITTLE_ENDIAN)
      } else b
    val v = (dt.clazz, dt.size) match {
      case (1, 8) => vb.getDouble()
      case (1, 4) => vb.getFloat().toDouble
      case (0, 8) => vb.getLong().toDouble
      case (0, 4) =>
        val x = vb.getInt().toLong
        (if (dt.signed) x else x & 0xffffffffL).toDouble
      case (0, 2) =>
        val x = vb.getShort().toLong
        (if (dt.signed) x else x & 0xffffL).toDouble
      case (0, 1) =>
        val x = vb.get().toLong
        (if (dt.signed) x else x & 0xffL).toDouble
      case _      => return None
    }
    Some((name, Left(v)))
  }

  /** One object's bytes from the Global Heap collection at `collAddr`
    * (spec III.E): objects are (index u16, refcount u16, reserved u32,
    * size u64, data padded to 8); index 0 marks the free-space tail.
    */
  private def readGlobalHeapObject(collAddr: Long, idx: Int): Array[Byte] = {
    val head = in.bb(collAddr, 16)
    val sig = new Array[Byte](4); head.get(sig)
    require(sig.sameElements("GCOL".getBytes("ASCII")), "bad global heap collection")
    require((head.get(4) & 0xff) == 1, "global heap version != 1")
    val collSize = head.getLong(8)
    require(collSize >= 16 && collSize <= Int.MaxValue,
      s"global heap collection size $collSize")
    val b = in.bb(collAddr, collSize.toInt)
    b.position(16)
    while (b.remaining() >= 16) {
      val objIdx = b.getShort() & 0xffff
      b.getShort() // refcount
      b.getInt() // reserved
      val sz = b.getLong()
      if (objIdx == 0) // free-space object: nothing after it
        throw new NoSuchElementException(s"global heap object $idx not found")
      if (objIdx == idx) {
        val data = new Array[Byte](sz.toInt); b.get(data)
        return data
      }
      b.position(b.position() + ((sz + 7) & ~7).toInt)
    }
    throw new NoSuchElementException(s"global heap object $idx not found")
  }

  // ---- group traversal --------------------------------------------

  /** Children (name -> object header address) of the group at `addr`. */
  def children(addr: Long): Seq[(String, Long)] = {
    val h = parseHeader(addr)
    h.denseLinks match {
      case Some((fheap, nameBtree)) => readDenseLinks(fheap, nameBtree)
      case None => h.symbolTable match {
        case Some((btree, heap)) =>
          val heapB = in.bb(heap, 32)
          require(heapB.get(0) == 'H' && heapB.get(1) == 'E', "bad local heap")
          val heapDataAddr = heapB.getLong(24)
          val out = scala.collection.mutable.ArrayBuffer[(String, Long)]()
          walkGroupBtree(btree, heapDataAddr, out)
          out.toSeq
        case None => h.links
      }
    }
  }

  // ---- dense link storage (fractal heap + v2 B-tree name index) ----

  private def parseFractalHeap(addr: Long): FractalHeap = {
    val b = in.bb(addr, 146)
    val sig = new Array[Byte](4); b.get(sig)
    require(sig.sameElements("FRHP".getBytes("ASCII")), "bad fractal heap header")
    require((b.get(4) & 0xff) == 0, "fractal heap version != 0")
    val heapIdLen = b.getShort(5) & 0xffff
    val ioFilterLen = b.getShort(7) & 0xffff
    require(ioFilterLen == 0, "filtered fractal heaps unsupported")
    val flags = b.get(9) & 0xff
    val maxManagedObjSize = b.getInt(10) & 0xffffffffL
    val tableWidth = b.getShort(110) & 0xffff
    val startBlockSize = b.getLong(112)
    val maxDirectBlockSize = b.getLong(120)
    val maxHeapSizeBits = b.getShort(128) & 0xffff
    val rootAddr = b.getLong(132)
    val rootRows = b.getShort(140) & 0xffff
    FractalHeap(heapIdLen, flags, maxManagedObjSize, tableWidth,
      startBlockSize, maxDirectBlockSize, maxHeapSizeBits, rootAddr, rootRows)
  }

  private def readVarLong(b: ByteBuffer, nBytes: Int): Long = {
    var v = 0L
    var i = 0
    while (i < nBytes) { v |= (b.get() & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** File position of the object at managed-heap offset `off`. */
  private def locateHeapObject(h: FractalHeap, off: Long): Long = {
    def directPos(blockAddr: Long, blockOffset: Long): Long = {
      val head = in.readFully(blockAddr, 4)
      require(head.sameElements("FHDB".getBytes("ASCII")), "bad fractal heap direct block")
      blockAddr + (off - blockOffset)
    }
    if (h.rootRows == 0) directPos(h.rootAddr, 0L)
    else {
      // root indirect block: header, then one child address per entry,
      // rows of `tableWidth` entries with doubling sizes
      val hdrLen = 4 + 1 + 8 + h.offBytes
      val maxDirectRows =
        (63 - java.lang.Long.numberOfLeadingZeros(h.maxDirectBlockSize)) -
          (63 - java.lang.Long.numberOfLeadingZeros(h.startBlockSize)) + 2
      val directRows = math.min(h.rootRows, maxDirectRows)
      val b = in.bb(h.rootAddr, hdrLen + directRows * h.tableWidth * 8)
      val sig = new Array[Byte](4); b.get(sig)
      require(sig.sameElements("FHIB".getBytes("ASCII")), "bad fractal heap indirect block")
      b.position(hdrLen)
      var cum = 0L
      var row = 0
      while (row < directRows) {
        val size = h.rowBlockSize(row)
        var col = 0
        while (col < h.tableWidth) {
          val child = b.getLong()
          if (off >= cum && off < cum + size) {
            require(child != Undef, s"heap offset $off in unallocated block")
            return directPos(child, cum)
          }
          cum += size
          col += 1
        }
        row += 1
      }
      throw new IllegalArgumentException(
        s"heap offset $off beyond direct rows (nested indirect blocks unsupported)")
    }
  }

  /** All records of the v2 B-tree at `addr` (leaf records, any order),
    * with the tree's record type. `wantTypes`: 5 = link name index,
    * 10/11 = non-filtered/filtered chunk records.
    */
  private def v2BtreeRecords(
      addr: Long, wantTypes: Set[Int]): (Int, Seq[Array[Byte]]) = {
    val b = in.bb(addr, 34)
    val sig = new Array[Byte](4); b.get(sig)
    require(sig.sameElements("BTHD".getBytes("ASCII")), "bad v2 B-tree header")
    require((b.get(4) & 0xff) == 0, "v2 B-tree version != 0")
    val btType = b.get(5) & 0xff
    require(wantTypes.contains(btType),
      s"v2 B-tree type $btType (want ${wantTypes.mkString("/")})")
    val nodeSize = b.getInt(6)
    val recSize = b.getShort(10) & 0xffff
    val depth = b.getShort(12) & 0xffff
    val rootNodeAddr = b.getLong(16)
    val rootNRecs = b.getShort(24) & 0xffff
    // Child-pointer "number of records" field width: bytes needed for
    // the max records any leaf can hold (spec III.A.2) — leaf payload
    // is nodeSize minus 6-byte prefix and 4-byte checksum.
    val leafMaxRecs = (nodeSize - 10) / recSize
    val nRecSizeBytes = FractalHeap.bytesFor(leafMaxRecs.toLong)
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()

    def readLeaf(nodeAddr: Long, nRecs: Int): Unit = {
      val nb = in.bb(nodeAddr, 6 + nRecs * recSize)
      val s = new Array[Byte](4); nb.get(s)
      require(s.sameElements("BTLF".getBytes("ASCII")), "bad v2 B-tree leaf")
      nb.position(6)
      var i = 0
      while (i < nRecs) {
        val rec = new Array[Byte](recSize); nb.get(rec)
        out += rec
        i += 1
      }
    }

    def readInternal(nodeAddr: Long, nRecs: Int, d: Int): Unit = {
      // records first, then nRecs+1 child pointers of
      // (address, nrecs[, total-nrecs when d > 1])
      require(d == 1, s"v2 B-tree depth $d internal nodes unsupported (> 1)")
      val ptrSize = 8 + nRecSizeBytes
      val nb = in.bb(nodeAddr, 6 + nRecs * recSize + (nRecs + 1) * ptrSize)
      val s = new Array[Byte](4); nb.get(s)
      require(s.sameElements("BTIN".getBytes("ASCII")), "bad v2 B-tree internal node")
      nb.position(6)
      var i = 0
      while (i < nRecs) {
        val rec = new Array[Byte](recSize); nb.get(rec)
        out += rec
        i += 1
      }
      var c = 0
      while (c <= nRecs) {
        val childAddr = nb.getLong()
        val childN = readVarLong(nb, nRecSizeBytes).toInt
        readLeaf(childAddr, childN)
        c += 1
      }
    }

    if (rootNodeAddr != Undef && rootNRecs > 0) {
      if (depth == 0) readLeaf(rootNodeAddr, rootNRecs)
      else readInternal(rootNodeAddr, rootNRecs, depth)
    }
    (btType, out.toSeq)
  }

  /** Enumerate a dense group's links: every v2 B-tree name-index record
    * is (4-byte name hash, managed heap ID); each heap ID resolves to a
    * serialized Link message in the fractal heap.
    */
  private def readDenseLinks(fheapAddr: Long, btreeAddr: Long): Seq[(String, Long)] = {
    val heap = parseFractalHeap(fheapAddr)
    v2BtreeRecords(btreeAddr, Set(5))._2.flatMap { rec =>
      val id = ByteBuffer.wrap(rec, 4, rec.length - 4).order(ByteOrder.LITTLE_ENDIAN)
      val verType = id.get() & 0xff
      require((verType & 0x30) == 0, // bits 4-5: 0 = managed object
        s"non-managed fractal heap object (id type byte 0x${verType.toHexString})")
      val off = readVarLong(id, heap.offBytes)
      val len = readVarLong(id, heap.lenBytes)
      val pos = locateHeapObject(heap, off)
      parseLink(in.bb(pos, len.toInt))
    }.sortBy(_._1)
  }

  private def walkGroupBtree(
      nodeAddr: Long, heapData: Long,
      out: scala.collection.mutable.ArrayBuffer[(String, Long)]): Unit = {
    val head = in.bb(nodeAddr, 24)
    val sig = new Array[Byte](4); head.get(sig)
    require(sig.sameElements("TREE".getBytes("ASCII")), "bad group B-tree")
    require((head.get(4) & 0xff) == 0, "B-tree node type != group")
    val level = head.get(5) & 0xff
    val entries = head.getShort(6) & 0xffff
    // keys and children interleave: key0 child0 key1 child1 ... keyN
    val body = in.bb(nodeAddr + 24, (entries * 2 + 1) * 8)
    (0 until entries).foreach { i =>
      val child = body.getLong((i * 2 + 1) * 8)
      if (level > 0) walkGroupBtree(child, heapData, out)
      else readSnod(child, heapData, out)
    }
  }

  private def readSnod(
      addr: Long, heapData: Long,
      out: scala.collection.mutable.ArrayBuffer[(String, Long)]): Unit = {
    val head = in.bb(addr, 8)
    val sig = new Array[Byte](4); head.get(sig)
    require(sig.sameElements("SNOD".getBytes("ASCII")), "bad symbol node")
    val n = head.getShort(6) & 0xffff
    val body = in.bb(addr + 8, n * 40)
    (0 until n).foreach { i =>
      val nameOff = body.getLong(i * 40)
      val hdrAddr = body.getLong(i * 40 + 8)
      out += ((readHeapString(heapData + nameOff), hdrAddr))
    }
  }

  private def readHeapString(addr: Long): String = {
    // names are short; fetch in 64-byte steps until NUL, clamping each
    // read to the file length — a local heap whose data segment ends at
    // EOF is valid, and an unclamped readFully would throw EOFException
    val sb = new java.io.ByteArrayOutputStream()
    var pos = addr
    var done = false
    while (!done) {
      val len = math.min(64L, in.size - pos).toInt
      require(len > 0, s"heap string at $addr runs past end of file")
      val chunk = in.readFully(pos, len)
      val z = chunk.indexOf(0.toByte)
      if (z >= 0) { sb.write(chunk, 0, z); done = true }
      else { sb.write(chunk, 0, len); pos += len }
    }
    new String(sb.toByteArray, "UTF-8")
  }

  /** True if the header at `addr` is a group (has links/symbol table). */
  def isGroup(addr: Long): Boolean = {
    val h = parseHeader(addr)
    h.symbolTable.isDefined || h.links.nonEmpty ||
      (h.datatype.isEmpty && h.layout.isEmpty)
  }

  /** Dataset metadata for the object header at `addr`. */
  def dataset(name: String, addr: Long): DatasetMeta = {
    val h = parseHeader(addr)
    (h.dataspace, h.datatype, h.layout) match {
      case (Some(ds), Some(dt), Some(lo)) =>
        DatasetMeta(name, dt, ds, lo, h.filters, h.attrs, h.strAttrs)
      case _ =>
        throw new IllegalArgumentException(s"$name at $addr is not a dataset")
    }
  }

  /** Children of the named group path, e.g. "pt1" or "" for root. */
  def groupChildren(groupPath: String): Seq[(String, Long)] = {
    val parts = groupPath.split("/").filter(_.nonEmpty)
    var addr = rootAddr
    parts.foreach { part =>
      addr = children(addr).collectFirst { case (n, a) if n == part => a }
        .getOrElse(throw new NoSuchElementException(
          s"${in.path}: no group '$part' in '$groupPath'"))
    }
    children(addr)
  }

  // ---- raw data ---------------------------------------------------

  private def inflate(data: Array[Byte], hint: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, hint))
    val tmp = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(tmp)
      if (n == 0 && inf.needsInput()) throw new java.io.EOFException("truncated deflate chunk")
      out.write(tmp, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  private def deshuffle(data: Array[Byte], esz: Int): Array[Byte] = {
    if (esz <= 1) return data
    val n = data.length / esz
    val out = new Array[Byte](data.length)
    var p = 0
    while (p < esz) {
      var i = 0
      while (i < n) { out(i * esz + p) = data(p * n + i); i += 1 }
      p += 1
    }
    out
  }

  /** Decode one stored chunk through the (reversed) filter pipeline. */
  private def decodeChunk(
      stored: Array[Byte], filters: Seq[Filter], esz: Int, rawHint: Int): Array[Byte] = {
    var cur = stored
    filters.reverse.foreach { f =>
      f.id match {
        case 1 => cur = inflate(cur, rawHint)
        case 2 => cur = deshuffle(cur, f.client.headOption.getOrElse(esz))
        case 3 => cur = java.util.Arrays.copyOf(cur, cur.length - 4) // fletcher32: strip, don't verify
        case other =>
          throw new IllegalArgumentException(s"filter id $other unsupported")
      }
    }
    cur
  }

  /** Assembled raw little-endian element bytes, row-major. */
  def readRaw(meta: DatasetMeta): Array[Byte] = {
    require(meta.dtype.clazz != 9,
      s"${meta.name}: variable-length datasets unsupported (attrs only)")
    val esz = meta.dtype.size
    val total = meta.elemCount * esz
    require(total <= Int.MaxValue, s"${meta.name}: dataset too large for one read")
    val assembled: Array[Byte] = meta.layout match {
      case Compact(d) => d
      case Contiguous(addr, size) =>
        require(addr != Undef, s"${meta.name}: no storage allocated")
        in.readFully(addr, math.min(size, total).toInt)
      case Chunked(btree, chunkDims) =>
        val out = new Array[Byte](total.toInt)
        val rank = meta.rank
        val chunkElems = chunkDims.product
        if (btree != Undef)
          walkChunkBtree(btree, rank) { case (offsets, nbytes, addr) =>
            val stored = in.readFully(addr, nbytes)
            val raw = decodeChunk(stored, meta.filters, esz, chunkElems * esz)
            copyChunk(raw, offsets, chunkDims, meta.dims, esz, out)
          }
        out
      case ChunkedSingle(addr, chunkDims, filteredSize) =>
        val out = new Array[Byte](total.toInt)
        if (addr != Undef) {
          val chunkElems = chunkDims.product
          val nbytes =
            if (filteredSize >= 0) filteredSize.toInt else chunkElems * esz
          val stored = in.readFully(addr, nbytes)
          val raw = decodeChunk(stored,
            if (filteredSize >= 0) meta.filters else Nil, esz, chunkElems * esz)
          copyChunk(raw, chunkDims.map(_ => 0L), chunkDims, meta.dims, esz, out)
        }
        out
      case ChunkedImplicit(base, chunkDims) =>
        val out = new Array[Byte](total.toInt)
        if (base != Undef) {
          require(meta.filters.isEmpty,
            s"${meta.name}: implicit chunk index cannot carry filters")
          val rank = meta.rank
          val chunkBytes = chunkDims.product * esz
          val grid = meta.dims.zip(chunkDims).map { case (d, c) => ((d + c - 1) / c).toInt }
          val nChunks = grid.product
          var ci = 0
          while (ci < nChunks) {
            var rem = ci
            val coord = new Array[Long](rank)
            var k = rank - 1
            while (k >= 0) { coord(k) = (rem % grid(k)).toLong * chunkDims(k); rem /= grid(k); k -= 1 }
            val raw = in.readFully(base + ci.toLong * chunkBytes, chunkBytes)
            copyChunk(raw, coord.toSeq, chunkDims, meta.dims, esz, out)
            ci += 1
          }
        }
        out
      case ChunkedFixedArray(faAddr, chunkDims) =>
        val out = new Array[Byte](total.toInt)
        val rank = meta.rank
        val chunkElems = chunkDims.product
        // chunk grid in row-major order — the Fixed Array's element
        // order per the spec
        val grid = meta.dims.zip(chunkDims).map { case (d, c) => ((d + c - 1) / c).toInt }
        readFixedArray(faAddr).zipWithIndex.foreach { case ((addr, fsz), ci) =>
          if (addr != Undef) {
            var rem = ci
            val coord = new Array[Long](rank)
            var k = rank - 1
            while (k >= 0) { coord(k) = (rem % grid(k)).toLong * chunkDims(k); rem /= grid(k); k -= 1 }
            val nbytes = if (fsz >= 0) fsz.toInt else chunkElems * esz
            val stored = in.readFully(addr, nbytes)
            val raw = decodeChunk(stored,
              if (fsz >= 0) meta.filters else Nil, esz, chunkElems * esz)
            copyChunk(raw, coord.toSeq, chunkDims, meta.dims, esz, out)
          }
        }
        out
      case ChunkedExtArray(eaAddr, chunkDims) =>
        val out = new Array[Byte](total.toInt)
        val rank = meta.rank
        val chunkElems = chunkDims.product
        val grid = meta.dims.zip(chunkDims).map { case (d, c) => ((d + c - 1) / c).toInt }
        readExtArray(eaAddr, grid.product.toLong).zipWithIndex.foreach {
          case ((addr, fsz), ci) =>
            if (addr != Undef) {
              var rem = ci
              val coord = new Array[Long](rank)
              var k = rank - 1
              while (k >= 0) { coord(k) = (rem % grid(k)).toLong * chunkDims(k); rem /= grid(k); k -= 1 }
              val nbytes = if (fsz >= 0) fsz.toInt else chunkElems * esz
              val stored = in.readFully(addr, nbytes)
              val raw = decodeChunk(stored,
                if (fsz >= 0) meta.filters else Nil, esz, chunkElems * esz)
              copyChunk(raw, coord.toSeq, chunkDims, meta.dims, esz, out)
            }
        }
        out
      case ChunkedBtree2(btAddr, chunkDims) =>
        val out = new Array[Byte](total.toInt)
        val rank = meta.rank
        val chunkElems = chunkDims.product
        if (btAddr != Undef) {
          val (recType, recs) = v2BtreeRecords(btAddr, Set(10, 11))
          recs.foreach { rec =>
            val rb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
            val addr = rb.getLong()
            val filtered = recType == 11
            val nbytes =
              if (filtered) {
                // record: addr(8) + size(recSize-8-4-8*rank) + mask(4)
                // + scaled offsets(8*rank)
                val szBytes = rec.length - 8 - 4 - 8 * rank
                val sz = readVarLong(rb, szBytes)
                rb.getInt() // filter mask
                sz.toInt
              } else chunkElems * esz
            val coord = (0 until rank).map(i => rb.getLong() * chunkDims(i))
            val stored = in.readFully(addr, nbytes)
            val raw = decodeChunk(stored,
              if (filtered) meta.filters else Nil, esz, chunkElems * esz)
            copyChunk(raw, coord, chunkDims, meta.dims, esz, out)
          }
        }
        out
    }
    // big-endian numerics byte-swap to the little-endian contract
    // every downstream consumer (readDoubles/readLongs, the DSv2
    // vectorized copy) assumes
    if (meta.dtype.bigEndian && esz > 1 && meta.dtype.clazz != 3) {
      var i = 0
      while (i < assembled.length) {
        var a = 0; var b = esz - 1
        while (a < b) {
          val t = assembled(i + a)
          assembled(i + a) = assembled(i + b)
          assembled(i + b) = t
          a += 1; b -= 1
        }
        i += esz
      }
    }
    assembled
  }

  /** Extensible Array chunk index: (chunk address, stored size) per
    * row-major grid slot, `nWanted` slots. Geometry follows the spec's
    * derived quantities (identical to libhdf5's H5EA): element i <
    * idxBlkElmts lives inline in the index block; the rest fill data
    * blocks grouped into "secondary" (super) blocks s = 0, 1, ... with
    * ndblks(s) = 2^(s/2) data blocks of dblkNelmts(s) =
    * dataBlkMinElmts * 2^((s+1)/2) elements each. Super blocks with
    * ndblks < supBlkMinDataPtrs are collapsed: their data-block
    * addresses live directly in the index block; later super blocks
    * get EASB structures. Paged data blocks (dblkNelmts > 2^pageBits)
    * are rejected, not misread. Size -1 = unfiltered (client-0,
    * address-only elements). Undef addresses (unallocated blocks or
    * chunks) yield Undef slots, matching the Fixed Array contract.
    */
  private def readExtArray(eaAddr: Long, nWanted: Long): Seq[(Long, Long)] = {
    require(nWanted <= Int.MaxValue, "extensible array too large")
    val h = in.bb(eaAddr, 72)
    val sig = new Array[Byte](4); h.get(sig)
    require(sig.sameElements("EAHD".getBytes("ASCII")), "bad extensible array header")
    require((h.get(4) & 0xff) == 0, "extensible array version != 0")
    val clientId = h.get(5) & 0xff
    require(clientId == 0 || clientId == 1, s"extensible array client $clientId")
    val elemSize = h.get(6) & 0xff
    val maxNelmtsBits = h.get(7) & 0xff
    val idxBlkElmts = h.get(8) & 0xff
    val dataBlkMinElmts = h.get(9) & 0xff
    val supBlkMinDataPtrs = h.get(10) & 0xff
    val maxDblkPageBits = h.get(11) & 0xff
    // stats (6 x 8 bytes) skipped — geometry is derived, not trusted
    val iblkAddr = h.getLong(60)
    require(iblkAddr != Undef, "extensible array index block unallocated")
    def log2(v: Int): Int = {
      require(v > 0 && (v & (v - 1)) == 0, s"not a power of two: $v")
      java.lang.Integer.numberOfTrailingZeros(v)
    }
    val nSblks = 2 * (maxNelmtsBits - log2(dataBlkMinElmts))
    val directSblks = 2 * log2(supBlkMinDataPtrs)
    def ndblks(s: Int): Int = 1 << (s / 2)
    def dblkNelmts(s: Int): Int = dataBlkMinElmts << ((s + 1) / 2)
    val directDblkAddrs = (0 until directSblks).map(ndblks).sum
    val nSblkAddrs = nSblks - directSblks
    val arrOffSize = (maxNelmtsBits + 7) / 8

    def readElems(b: ByteBuffer, n: Int): Seq[(Long, Long)] =
      (0 until n).map { _ =>
        if (clientId == 0) {
          require(elemSize == 8, s"client-0 element size $elemSize")
          (b.getLong(), -1L)
        } else {
          val addr = b.getLong()
          val size = readVarLong(b, elemSize - 12)
          b.getInt() // filter mask
          (addr, size)
        }
      }

    // index block: inline elements + direct dblk addrs + sblk addrs
    val iblkHead = 4 + 1 + 1 + 8
    val iblkBody = idxBlkElmts * elemSize + (directDblkAddrs + nSblkAddrs) * 8
    val ib = in.bb(iblkAddr, iblkHead + iblkBody)
    val isig = new Array[Byte](4); ib.get(isig)
    require(isig.sameElements("EAIB".getBytes("ASCII")), "bad extensible array index block")
    ib.position(iblkHead)
    val inline = readElems(ib, idxBlkElmts)
    val dblkAddrs = (0 until directDblkAddrs).map(_ => ib.getLong())
    val sblkAddrs = (0 until nSblkAddrs).map(_ => ib.getLong())

    def readDataBlock(addr: Long, nelmts: Int): Seq[(Long, Long)] = {
      if (addr == Undef) return Seq.fill(nelmts)((Undef, -1L))
      require(nelmts <= (1 << maxDblkPageBits),
        s"paged extensible-array data block unsupported ($nelmts elmts)")
      val head = 4 + 1 + 1 + 8 + arrOffSize
      val b = in.bb(addr, head + nelmts * elemSize)
      val s = new Array[Byte](4); b.get(s)
      require(s.sameElements("EADB".getBytes("ASCII")), "bad extensible array data block")
      b.position(head)
      readElems(b, nelmts)
    }

    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    out ++= inline
    var s = 0
    var directIdx = 0
    while (out.length < nWanted && s < nSblks) {
      val ne = dblkNelmts(s)
      if (s < directSblks) {
        var d = 0
        while (d < ndblks(s) && out.length < nWanted) {
          out ++= readDataBlock(dblkAddrs(directIdx), ne)
          directIdx += 1
          d += 1
        }
      } else {
        val sblkAddr = sblkAddrs(s - directSblks)
        val nd = ndblks(s)
        if (sblkAddr == Undef) out ++= Seq.fill(nd * ne)((Undef, -1L))
        else {
          require(ne <= (1 << maxDblkPageBits),
            s"paged extensible-array super block unsupported")
          val head = 4 + 1 + 1 + 8 + arrOffSize
          val b = in.bb(sblkAddr, head + nd * 8)
          val ssig = new Array[Byte](4); b.get(ssig)
          require(ssig.sameElements("EASB".getBytes("ASCII")),
            "bad extensible array secondary block")
          b.position(head)
          val addrs = (0 until nd).map(_ => b.getLong())
          var d = 0
          while (d < nd && out.length < nWanted) {
            out ++= readDataBlock(addrs(d), ne)
            d += 1
          }
        }
      }
      s += 1
    }
    require(out.length >= nWanted,
      s"extensible array exhausted at ${out.length} of $nWanted elements")
    out.take(nWanted.toInt).toSeq
  }

  /** Fixed Array chunk index (spec III.H): (chunk address, stored
    * size) per grid slot in row-major order; size -1 = unfiltered
    * (client 0, address-only elements). Paged data blocks (more
    * entries than one page) are rejected, not misread.
    */
  private def readFixedArray(faAddr: Long): Seq[(Long, Long)] = {
    val h = in.bb(faAddr, 28)
    val sig = new Array[Byte](4); h.get(sig)
    require(sig.sameElements("FAHD".getBytes("ASCII")), "bad fixed array header")
    require((h.get(4) & 0xff) == 0, "fixed array version != 0")
    val clientId = h.get(5) & 0xff
    require(clientId == 0 || clientId == 1, s"fixed array client $clientId")
    val entrySize = h.get(6) & 0xff
    val pageBits = h.get(7) & 0xff
    val maxEntries = h.getLong(8)
    val dataAddr = h.getLong(16)
    require(maxEntries <= (1L << pageBits),
      s"paged fixed array unsupported ($maxEntries entries > 2^$pageBits page)")
    require(dataAddr != Undef, "fixed array data block unallocated")
    val dbHead = 4 + 1 + 1 + 8
    val b = in.bb(dataAddr, dbHead + (maxEntries * entrySize).toInt)
    val dsig = new Array[Byte](4); b.get(dsig)
    require(dsig.sameElements("FADB".getBytes("ASCII")), "bad fixed array data block")
    b.position(dbHead)
    (0L until maxEntries).map { _ =>
      if (clientId == 0) {
        require(entrySize == 8, s"client-0 entry size $entrySize")
        (b.getLong(), -1L)
      } else {
        // client 1 (filtered): address + chunk size (entrySize-12
        // bytes) + 4-byte filter mask
        val addr = b.getLong()
        val size = readVarLong(b, entrySize - 12)
        b.getInt() // filter mask (all-pass only in our writer)
        (addr, size)
      }
    }
  }

  private def walkChunkBtree(nodeAddr: Long, rank: Int)(
      f: (Seq[Long], Int, Long) => Unit): Unit = {
    val head = in.bb(nodeAddr, 24)
    val sig = new Array[Byte](4); head.get(sig)
    require(sig.sameElements("TREE".getBytes("ASCII")), "bad chunk B-tree")
    require((head.get(4) & 0xff) == 1, "B-tree node type != chunk")
    val level = head.get(5) & 0xff
    val entries = head.getShort(6) & 0xffff
    val keySize = 8 + (rank + 1) * 8
    val body = in.bb(nodeAddr + 24, entries * (keySize + 8) + keySize)
    (0 until entries).foreach { i =>
      body.position(i * (keySize + 8))
      val nbytes = body.getInt()
      body.getInt() // filter mask (all-pass only in our writer)
      val offsets = (0 until rank).map(_ => body.getLong())
      body.getLong() // element-size dim offset (always 0)
      val child = body.getLong()
      if (level > 0) walkChunkBtree(child, rank)(f)
      else f(offsets, nbytes, child)
    }
  }

  /** Copy a full decoded chunk into the output array, clipping edge
    * chunks; inner-dim runs move via System.arraycopy.
    */
  private def copyChunk(
      raw: Array[Byte], offsets: Seq[Long], chunkDims: Seq[Int],
      dims: Seq[Long], esz: Int, out: Array[Byte]): Unit = {
    val rank = dims.size
    val lastRun = math.min(chunkDims(rank - 1).toLong, dims(rank - 1) - offsets(rank - 1)).toInt
    if (lastRun <= 0) return
    val outerDims = chunkDims.dropRight(1)
    val outerCount = if (rank == 1) 1 else outerDims.product
    var oi = 0
    while (oi < outerCount) {
      var rem = oi
      var inBounds = true
      var flat = 0L
      var k = rank - 2
      val src = new Array[Long](rank)
      while (k >= 0) {
        val c = rem % outerDims(k); rem /= outerDims(k)
        src(k) = offsets(k) + c
        if (src(k) >= dims(k)) inBounds = false
        k -= 1
      }
      src(rank - 1) = offsets(rank - 1)
      if (inBounds) {
        var k2 = 0
        while (k2 < rank) { flat = flat * dims(k2) + src(k2); k2 += 1 }
        System.arraycopy(raw, oi * chunkDims(rank - 1) * esz,
          out, (flat * esz).toInt, lastRun * esz)
      }
      oi += 1
    }
  }

  // ---- typed views ------------------------------------------------

  def readDoubles(meta: DatasetMeta): Array[Double] = {
    val n = meta.elemCount.toInt
    val out = new Array[Double](n)
    if (meta.dtype.clazz == 0) {
      // integral (signed or unsigned) via the widening path
      val longs = readLongs(meta)
      var i = 0; while (i < n) { out(i) = longs(i).toDouble; i += 1 }
      return out
    }
    val b = ByteBuffer.wrap(readRaw(meta)).order(ByteOrder.LITTLE_ENDIAN)
    meta.dtype.size match {
      case 8 => var i = 0; while (i < n) { out(i) = b.getDouble(i * 8); i += 1 }
      case 4 => var i = 0; while (i < n) { out(i) = b.getFloat(i * 4); i += 1 }
      case _ => throw new IllegalArgumentException(s"${meta.dtype}")
    }
    out
  }

  /** Fixed-length string elements, NUL-trimmed, UTF-8. */
  def readStrings(meta: DatasetMeta): Array[String] = {
    require(meta.dtype.clazz == 3, s"${meta.dtype} is not a string type")
    val raw = readRaw(meta)
    val w = meta.dtype.size
    val n = meta.elemCount.toInt
    Array.tabulate(n) { i =>
      var end = i * w
      val stop = i * w + w
      while (end < stop && raw(end) != 0) end += 1
      new String(raw, i * w, end - i * w, "UTF-8")
    }
  }

  def readLongs(meta: DatasetMeta): Array[Long] = {
    val b = ByteBuffer.wrap(readRaw(meta)).order(ByteOrder.LITTLE_ENDIAN)
    val n = meta.elemCount.toInt
    val out = new Array[Long](n)
    val signed = meta.dtype.signed
    // Unsigned sources widen with a zero-extending mask: a uint8
    // _FillValue of 255 or a uint32 counter past 2^31 must NOT surface
    // as a negative number. uint64 has no lossless JVM widening and is
    // rejected in parseDatatype.
    (meta.dtype.clazz, meta.dtype.size) match {
      case (0, 8) => var i = 0; while (i < n) { out(i) = b.getLong(i * 8); i += 1 }
      case (0, 4) =>
        var i = 0
        while (i < n) {
          val v = b.getInt(i * 4).toLong
          out(i) = if (signed) v else v & 0xffffffffL; i += 1
        }
      case (0, 2) =>
        var i = 0
        while (i < n) {
          val v = b.getShort(i * 2).toLong
          out(i) = if (signed) v else v & 0xffffL; i += 1
        }
      case (0, 1) =>
        var i = 0
        while (i < n) {
          val v = b.get(i).toLong
          out(i) = if (signed) v else v & 0xffL; i += 1
        }
      case _ => throw new IllegalArgumentException(s"${meta.dtype} is not integral")
    }
    out
  }
}
