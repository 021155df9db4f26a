package graft.sources.zarr

import java.util.zip.{Deflater, Inflater}

/** Pure-JVM Blosc1 codec — the missing piece for reading the Zarr
  * stores the reference actually produces: zarr-python's default
  * compressor is numcodecs `Blosc(cname='lz4', clevel=5,
  * shuffle=SHUFFLE)`, and /root/reference/atl06_to_atl11.py:300-301
  * writes its ATL11 stores with `to_zarr(encoding=...)` that sets only
  * the dtype — so every chunk on disk is a blosc1 frame.
  *
  * Blosc itself is a CONTAINER, not a compression algorithm: a
  * 16-byte header, a block-start table, and per-block streams each
  * compressed with an inner codec (lz4/lz4hc/zlib/zstd/snappy/
  * blosclz), optionally byte-shuffled first. The container format is
  * public (c-blosc README_HEADER.rst); the inner codecs' BLOCK formats
  * are exactly what the JVM libraries Spark already ships implement
  * (lz4-java raw blocks, java.util.zip zlib, zstd-jni, snappy-java) —
  * so "blosc needs a native lib" is only true of blosclz, which
  * numcodecs never picks by default and this codec rejects with a
  * clear error.
  *
  * Header layout (little-endian):
  * {{{
  *   byte 0   version   (format version, 2 for blosc1)
  *   byte 1   versionlz (inner codec's format version)
  *   byte 2   flags:  bit 0 byte-shuffle | bit 1 pure-memcpy |
  *                    bit 2 bit-shuffle  | bit 4 dont-split  |
  *                    bits 5-7 inner codec code
  *   byte 3   typesize (uint8)
  *   4-7      nbytes    uncompressed payload size
  *   8-11     blocksize
  *   12-15    cbytes    total frame size including this header
  * }}}
  * Then, unless pure-memcpy: `nblocks = ceil(nbytes/blocksize)` int32
  * offsets (from frame start) to each block. A block holds
  * `nstreams` streams — `typesize` of them when the split bit is
  * clear and the block is full-size, else 1 — each an int32 length
  * prefix + payload, where `length == neblock` marks a stored
  * (uncompressed) stream. Byte-shuffle is applied PER BLOCK: element
  * byte j of element i lands at `j*nelem + i`; trailing bytes that
  * don't fill an element are carried verbatim.
  *
  * Unsupported (clean errors, never wrong bytes): blosclz payloads
  * (native-only algorithm) and bit-shuffle (numcodecs' non-default
  * `shuffle=2`).
  */
object Blosc {

  // header flag bits (public blosc1 format)
  private val DoShuffle = 0x1
  private val MemCpyed = 0x2
  private val DoBitShuffle = 0x4
  private val DontSplit = 0x10

  // inner codec codes, header flags bits 5-7
  private val CodeBloscLz = 0
  private val CodeLz4 = 1
  private val CodeSnappy = 2
  private val CodeZlib = 3
  private val CodeZstd = 4

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putLeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte
    b(off + 3) = (v >>> 24).toByte
  }

  /** Decode one blosc1 frame; `expectNBytes` is the caller's known
    * raw chunk size (chunkElems * elemSize from `.zarray`) — a frame
    * declaring anything else is corrupt.
    */
  def decompress(src: Array[Byte], expectNBytes: Int): Array[Byte] = {
    require(src.length >= 16, s"blosc frame ${src.length}B < 16B header")
    val flags = src(2) & 0xff
    val typesize = math.max(1, src(3) & 0xff)
    val nbytes = leInt(src, 4)
    val blocksize = leInt(src, 8)
    val cbytes = leInt(src, 12)
    require(nbytes == expectNBytes,
      s"blosc frame declares ${nbytes}B, chunk expects ${expectNBytes}B")
    require(cbytes >= 16 && cbytes <= src.length,
      s"blosc frame declares ${cbytes}B total, have ${src.length}B")
    val out = new Array[Byte](nbytes)
    if (nbytes == 0) return out
    if ((flags & MemCpyed) != 0) {
      // long arithmetic: nbytes is frame-controlled and could sit near
      // Int.MaxValue, where `16 + nbytes` wraps negative and skips the
      // bound check
      require(16L + nbytes <= src.length, "truncated memcpy blosc frame")
      System.arraycopy(src, 16, out, 0, nbytes)
      return out
    }
    require(blocksize > 0, s"non-positive blosc blocksize $blocksize")
    val codec = (flags >>> 5) & 0x7
    require(codec != CodeBloscLz,
      "blosclz payload unsupported (native-only algorithm; " +
        "numcodecs-default stores use lz4)")
    require((flags & DoBitShuffle) == 0,
      "blosc bit-shuffle filter unsupported (byte shuffle / none only)")
    val shuffled = (flags & DoShuffle) != 0 && typesize > 1
    val dontSplit = (flags & DontSplit) != 0
    val nblocks = ((nbytes.toLong + blocksize - 1) / blocksize).toInt
    require(16 + 4L * nblocks <= src.length, "truncated blosc bstarts table")
    val leftover = nbytes % blocksize
    val tmp = if (shuffled) new Array[Byte](blocksize) else null
    var i = 0
    while (i < nblocks) {
      val bstart = leInt(src, 16 + 4 * i)
      val isLeftover = i == nblocks - 1 && leftover != 0
      val bsize = if (isLeftover) leftover else blocksize
      val nstreams = if (dontSplit || isLeftover) 1 else typesize
      val neblock = bsize / nstreams
      require(neblock * nstreams == bsize,
        s"blosc block ${bsize}B not divisible into $nstreams streams")
      val dst = if (shuffled) tmp else out
      val dstBase = if (shuffled) 0 else i * blocksize
      var soff = bstart
      var doff = 0
      var j = 0
      while (j < nstreams) {
        require(soff >= 16 && soff.toLong + 4 <= src.length,
          s"blosc stream offset $soff outside ${src.length}B frame")
        val cb = leInt(src, soff)
        soff += 4
        // long arithmetic: an adversarial cb near Int.MaxValue would
        // wrap `soff + cb` negative and bypass this check, surfacing
        // later as an opaque decoder exception instead of this error
        require(cb > 0 && soff.toLong + cb <= src.length,
          s"blosc stream ${cb}B at $soff outside ${src.length}B frame")
        if (cb == neblock) {
          System.arraycopy(src, soff, dst, dstBase + doff, neblock)
        } else {
          codecDecompress(codec, src, soff, cb, dst, dstBase + doff, neblock)
        }
        soff += cb
        doff += neblock
        j += 1
      }
      if (shuffled) unshuffle(typesize, bsize, tmp, out, i * blocksize)
      i += 1
    }
    out
  }

  /** Encode one blosc1 frame readable by c-blosc / numcodecs:
    * dont-split streams (the split bit records the layout, so any
    * blosc1 decoder honours it), byte shuffle when `shuffle` and
    * typesize > 1, stored-stream fallback per block, whole-frame
    * memcpy fallback when compression doesn't pay.
    */
  def compress(raw: Array[Byte], typesize: Int, cname: String,
      clevel: Int, shuffle: Boolean): Array[Byte] = {
    val ts = math.max(1, math.min(255, typesize))
    val codec = cname match {
      case "lz4" | "lz4hc" => CodeLz4
      case "zlib" => CodeZlib
      case "zstd" => CodeZstd
      case "snappy" => CodeSnappy
      case other => throw new IllegalArgumentException(
        s"blosc cname '$other' unsupported (lz4/lz4hc/zlib/zstd/snappy)")
    }
    val nbytes = raw.length
    def memcpyFrame(): Array[Byte] = {
      val f = new Array[Byte](16 + nbytes)
      f(0) = 2; f(1) = 1
      f(2) = (MemCpyed | (codec << 5)).toByte
      f(3) = ts.toByte
      putLeInt(f, 4, nbytes)
      putLeInt(f, 8, math.max(nbytes, 1))
      putLeInt(f, 12, 16 + nbytes)
      System.arraycopy(raw, 0, f, 16, nbytes)
      f
    }
    if (nbytes == 0) return memcpyFrame()
    // block size: 256 KiB target rounded to a typesize multiple —
    // small enough to bound the decoder's per-block scratch, big
    // enough that the inner codec sees real runs
    val blocksize = {
      val b = math.min(nbytes, 256 * 1024)
      math.max(ts, b / ts * ts)
    }
    val doShuffle = shuffle && ts > 1
    val nblocks = ((nbytes.toLong + blocksize - 1) / blocksize).toInt
    val leftover = nbytes % blocksize
    val header = 16 + 4 * nblocks
    val outBuf = new java.io.ByteArrayOutputStream(nbytes / 2 + header)
    val bstarts = new Array[Int](nblocks)
    val tmp = if (doShuffle) new Array[Byte](blocksize) else null
    var i = 0
    while (i < nblocks) {
      val isLeftover = i == nblocks - 1 && leftover != 0
      val bsize = if (isLeftover) leftover else blocksize
      val srcBlock = if (doShuffle) {
        shuffleBlock(ts, bsize, raw, i * blocksize, tmp); tmp
      } else raw
      val srcOff = if (doShuffle) 0 else i * blocksize
      bstarts(i) = header + outBuf.size()
      val comp = codecCompress(codec, cname, clevel, srcBlock, srcOff, bsize)
      val prefix = new Array[Byte](4)
      if (comp == null || comp.length >= bsize) {
        putLeInt(prefix, 0, bsize)
        outBuf.write(prefix)
        outBuf.write(srcBlock, srcOff, bsize)
      } else {
        putLeInt(prefix, 0, comp.length)
        outBuf.write(prefix)
        outBuf.write(comp)
      }
      i += 1
    }
    val payload = outBuf.toByteArray
    if (header + payload.length >= 16 + nbytes) return memcpyFrame()
    val f = new Array[Byte](header + payload.length)
    f(0) = 2; f(1) = 1
    f(2) = ((if (doShuffle) DoShuffle else 0) | DontSplit | (codec << 5)).toByte
    f(3) = ts.toByte
    putLeInt(f, 4, nbytes)
    putLeInt(f, 8, blocksize)
    putLeInt(f, 12, f.length)
    var k = 0
    while (k < nblocks) { putLeInt(f, 16 + 4 * k, bstarts(k)); k += 1 }
    System.arraycopy(payload, 0, f, header, payload.length)
    f
  }

  /** Per-block byte shuffle: byte j of element i → `j*nelem + i`;
    * the sub-element tail is carried verbatim (the generic c-blosc
    * shuffle's leftover rule).
    */
  private def shuffleBlock(ts: Int, bsize: Int, src: Array[Byte],
      srcOff: Int, dst: Array[Byte]): Unit = {
    val nelem = bsize / ts
    var j = 0
    while (j < ts) {
      var i = 0
      val base = j * nelem
      while (i < nelem) {
        dst(base + i) = src(srcOff + i * ts + j)
        i += 1
      }
      j += 1
    }
    val rem = bsize % ts
    if (rem != 0)
      System.arraycopy(src, srcOff + bsize - rem, dst, bsize - rem, rem)
  }

  /** Inverse of [[shuffleBlock]], writing into `out` at `outOff`. */
  private def unshuffle(ts: Int, bsize: Int, src: Array[Byte],
      out: Array[Byte], outOff: Int): Unit = {
    val nelem = bsize / ts
    var j = 0
    while (j < ts) {
      var i = 0
      val base = j * nelem
      while (i < nelem) {
        out(outOff + i * ts + j) = src(base + i)
        i += 1
      }
      j += 1
    }
    val rem = bsize % ts
    if (rem != 0)
      System.arraycopy(src, bsize - rem, out, outOff + bsize - rem, rem)
  }

  private def codecDecompress(codec: Int, src: Array[Byte], srcOff: Int,
      srcLen: Int, dst: Array[Byte], dstOff: Int, dstLen: Int): Unit =
    codec match {
      case CodeLz4 =>
        val n = net.jpountz.lz4.LZ4Factory.fastestInstance()
          .safeDecompressor().decompress(src, srcOff, srcLen, dst, dstOff)
        require(n == dstLen, s"lz4 stream decoded ${n}B, want ${dstLen}B")
      case CodeZlib =>
        val inf = new Inflater()
        inf.setInput(src, srcOff, srcLen)
        var off = dstOff
        val end = dstOff + dstLen
        while (off < end && !inf.finished()) {
          val n = inf.inflate(dst, off, end - off)
          if (n == 0 && inf.needsInput())
            throw new java.io.IOException("truncated zlib blosc stream")
          off += n
        }
        inf.end()
        require(off == end, s"zlib stream decoded ${off - dstOff}B, want ${dstLen}B")
      case CodeZstd =>
        val n = com.github.luben.zstd.Zstd.decompressByteArray(
          dst, dstOff, dstLen, src, srcOff, srcLen)
        require(n == dstLen, s"zstd stream decoded ${n}B, want ${dstLen}B")
      case CodeSnappy =>
        val n = org.xerial.snappy.Snappy.uncompress(
          src, srcOff, srcLen, dst, dstOff)
        require(n == dstLen, s"snappy stream decoded ${n}B, want ${dstLen}B")
      case other => throw new IllegalArgumentException(
        s"blosc inner codec code $other unsupported")
    }

  /** Compress one stream; null = incompressible (store raw). */
  private def codecCompress(codec: Int, cname: String, clevel: Int,
      src: Array[Byte], srcOff: Int, len: Int): Array[Byte] =
    codec match {
      case CodeLz4 =>
        val fac = net.jpountz.lz4.LZ4Factory.fastestInstance()
        val c = if (cname == "lz4hc") fac.highCompressor()
          else fac.fastCompressor()
        val max = c.maxCompressedLength(len)
        val buf = new Array[Byte](max)
        val n = c.compress(src, srcOff, len, buf, 0, max)
        java.util.Arrays.copyOf(buf, n)
      case CodeZlib =>
        val d = new Deflater(math.max(1, math.min(9, clevel)))
        d.setInput(src, srcOff, len); d.finish()
        val out = new java.io.ByteArrayOutputStream(len / 2 + 64)
        val buf = new Array[Byte](8192)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end()
        out.toByteArray
      case CodeZstd =>
        val slice =
          if (srcOff == 0 && len == src.length) src
          else java.util.Arrays.copyOfRange(src, srcOff, srcOff + len)
        com.github.luben.zstd.Zstd.compress(
          slice, math.max(1, math.min(22, clevel)))
      case CodeSnappy =>
        val slice =
          if (srcOff == 0 && len == src.length) src
          else java.util.Arrays.copyOfRange(src, srcOff, srcOff + len)
        org.xerial.snappy.Snappy.compress(slice)
      case other => throw new IllegalArgumentException(
        s"blosc inner codec code $other unsupported")
    }
}
