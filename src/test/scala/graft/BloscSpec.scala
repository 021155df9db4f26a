package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.zarr.Blosc

/** Pure-JVM blosc1 codec, tested at the byte level against the PUBLIC
  * frame format (c-blosc README_HEADER.rst): encoder→decoder round
  * trips across every inner codec / typesize / payload shape (partial
  * last block, sub-element tail, incompressible data, empty), PLUS
  * hand-assembled frames exercising the layouts only a FOREIGN writer
  * produces — split streams (what c-blosc emits for lz4, the
  * numcodecs default the reference's stores use), per-block byte
  * shuffle verified against an independent element-wise oracle, and
  * memcpy frames. Corrupt frames must fail cleanly: every length is
  * attacker-controlled.
  */
class BloscSpec extends AnyFunSuite {

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putLeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }

  /** Deterministic compressible payload: repeating doubles with a
    * drifting low byte, `n` bytes.
    */
  private def payload(n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var i = 0
    while (i < n) { b(i) = ((i / 8) % 251 + (i % 8) * 3).toByte; i += 1 }
    b
  }

  test("round trip: every codec, shuffle on/off, multi-block + partial last block") {
    // 300_000 bytes over 256 KiB blocks = 2 blocks, second partial
    for (cname <- Seq("lz4", "lz4hc", "zlib", "zstd", "snappy");
         shuffle <- Seq(true, false);
         n <- Seq(300000, 8192)) {
      val raw = payload(n)
      val frame = Blosc.compress(raw, 8, cname, 5, shuffle)
      assert(frame.length < raw.length, s"$cname should compress $n")
      val back = Blosc.decompress(frame, n)
      assert(java.util.Arrays.equals(back, raw), s"$cname shuffle=$shuffle n=$n")
    }
  }

  test("round trip: typesize 1 (no shuffle possible) and sub-element tail") {
    val raw = payload(1003) // 1003 % 8 = 3-byte tail inside one block
    for (ts <- Seq(1, 8)) {
      val frame = Blosc.compress(raw, ts, "lz4", 5, shuffle = true)
      assert(java.util.Arrays.equals(Blosc.decompress(frame, 1003), raw),
        s"ts=$ts")
    }
  }

  test("incompressible payload falls back to a valid memcpy frame") {
    val rnd = new scala.util.Random(42)
    val raw = new Array[Byte](4096)
    rnd.nextBytes(raw)
    val frame = Blosc.compress(raw, 8, "lz4", 5, shuffle = true)
    assert(frame.length == raw.length + 16, "memcpy frame = payload + header")
    assert((frame(2) & 0x2) != 0, "memcpy flag set")
    assert((frame(2) & 0x1) == 0, "shuffle flag cleared in memcpy mode")
    assert(java.util.Arrays.equals(Blosc.decompress(frame, 4096), raw))
  }

  test("empty payload") {
    val frame = Blosc.compress(Array.emptyByteArray, 8, "lz4", 5, shuffle = true)
    assert(Blosc.decompress(frame, 0).isEmpty)
  }

  test("foreign split-stream frame (c-blosc's lz4 layout) decodes: " +
    "shuffle + typesize streams verified against an element-wise oracle") {
    // Hand-assemble the layout c-blosc writes when split_block() is
    // true (lz4, typesize<=255, blocksize/typesize>=128): the split
    // bit CLEAR, each block = `typesize` streams over the SHUFFLED
    // block, each stream length-prefixed; stored (cb == neblock)
    // streams keep the format self-describing, so the container
    // decode path is fully exercised without an inner codec.
    val ts = 4
    val nelem = 256 // one full block: 1024 bytes
    val nbytes = ts * nelem
    val raw = new Array[Byte](nbytes)
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    (0 until nelem).foreach(i => bb.putInt(i * 4, i * 7919 + 13))
    // byte-shuffle the block: byte j of element i -> j*nelem + i
    val shuf = new Array[Byte](nbytes)
    for (i <- 0 until nelem; j <- 0 until ts)
      shuf(j * nelem + i) = raw(i * ts + j)
    val neblock = nbytes / ts
    val header = 16 + 4 // one block -> one bstart
    val frame = new Array[Byte](header + ts * (4 + neblock))
    frame(0) = 2; frame(1) = 1
    frame(2) = (0x1 | (1 << 5)).toByte // shuffle | lz4 code; split bit CLEAR
    frame(3) = ts.toByte
    putLeInt(frame, 4, nbytes)
    putLeInt(frame, 8, nbytes) // blocksize = nbytes: single block
    putLeInt(frame, 12, frame.length)
    putLeInt(frame, 16, header) // bstart[0]
    var off = header
    for (j <- 0 until ts) {
      putLeInt(frame, off, neblock) // cb == neblock -> stored stream
      System.arraycopy(shuf, j * neblock, frame, off + 4, neblock)
      off += 4 + neblock
    }
    val back = Blosc.decompress(frame, nbytes)
    assert(java.util.Arrays.equals(back, raw),
      "split+shuffle frame must reassemble the original elements")
  }

  test("randomized round-trip sweep: sizes x typesizes x codecs x shuffle") {
    val rnd = new scala.util.Random(7)
    val codecs = Array("lz4", "zlib", "zstd", "snappy")
    (1 to 40).foreach { _ =>
      val n = rnd.nextInt(300000) + 1
      val ts = Array(1, 2, 3, 4, 8, 16)(rnd.nextInt(6))
      val cname = codecs(rnd.nextInt(codecs.length))
      val shuffle = rnd.nextBoolean()
      // mixed compressibility: runs + noise
      val raw = new Array[Byte](n)
      var i = 0
      while (i < n) {
        raw(i) = if ((i / 64) % 3 == 0) rnd.nextInt(256).toByte
          else ((i / 8) % 251).toByte
        i += 1
      }
      val frame = Blosc.compress(raw, ts, cname, 5, shuffle)
      val back = Blosc.decompress(frame, n)
      assert(java.util.Arrays.equals(back, raw),
        s"n=$n ts=$ts cname=$cname shuffle=$shuffle")
    }
  }

  test("foreign split frame with lz4-COMPRESSED streams decodes " +
    "(the full c-blosc default layout)") {
    // like the stored-stream split test, but each byte-plane stream is
    // a real lz4 block — the exact layout c-blosc emits for
    // compressible data under its split heuristic
    val ts = 4
    val nelem = 4096
    val nbytes = ts * nelem
    val raw = new Array[Byte](nbytes)
    (0 until nelem).foreach { i =>
      val v = i / 3 // runs -> compressible planes
      raw(i * ts) = v.toByte
      raw(i * ts + 1) = (v >>> 8).toByte
      raw(i * ts + 2) = 7
      raw(i * ts + 3) = 9
    }
    val shuf = new Array[Byte](nbytes)
    for (i <- 0 until nelem; j <- 0 until ts)
      shuf(j * nelem + i) = raw(i * ts + j)
    val neblock = nbytes / ts
    val comp = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val streams = (0 until ts).map { j =>
      val max = comp.maxCompressedLength(neblock)
      val buf = new Array[Byte](max)
      val n = comp.compress(shuf, j * neblock, neblock, buf, 0, max)
      java.util.Arrays.copyOf(buf, n)
    }
    assert(streams.forall(_.length < neblock), "planes should compress")
    val header = 16 + 4
    val frame = new Array[Byte](header + streams.map(_.length + 4).sum)
    frame(0) = 2; frame(1) = 1
    frame(2) = (0x1 | (1 << 5)).toByte // shuffle | lz4; split bit CLEAR
    frame(3) = ts.toByte
    putLeInt(frame, 4, nbytes)
    putLeInt(frame, 8, nbytes)
    putLeInt(frame, 12, frame.length)
    putLeInt(frame, 16, header)
    var off = header
    streams.foreach { s =>
      putLeInt(frame, off, s.length)
      System.arraycopy(s, 0, frame, off + 4, s.length)
      off += 4 + s.length
    }
    assert(java.util.Arrays.equals(Blosc.decompress(frame, nbytes), raw))
  }

  test("corrupt frames fail cleanly") {
    val good = Blosc.compress(payload(4096), 8, "lz4", 5, shuffle = true)
    // truncated header
    intercept[IllegalArgumentException] {
      Blosc.decompress(java.util.Arrays.copyOf(good, 8), 4096)
    }
    // nbytes disagrees with the chunk's expected size
    intercept[IllegalArgumentException] { Blosc.decompress(good, 4097) }
    // cbytes pointing past the buffer
    val overrun = good.clone()
    putLeInt(overrun, 12, good.length + 100)
    intercept[IllegalArgumentException] { Blosc.decompress(overrun, 4096) }
    // a stream length running past the frame end
    val cut = java.util.Arrays.copyOf(good, good.length - 8)
    intercept[Exception] { Blosc.decompress(cut, 4096) }
    // blosclz code (5 bits up) rejected by name
    val blz = good.clone()
    blz(2) = (blz(2) & 0x1f).toByte // codec code 0 = blosclz
    val e = intercept[IllegalArgumentException] { Blosc.decompress(blz, 4096) }
    assert(e.getMessage.contains("blosclz"))
  }

  test("encoder frames carry the documented header fields") {
    val raw = payload(300000)
    val frame = Blosc.compress(raw, 8, "zstd", 5, shuffle = true)
    assert(frame(0) == 2 && frame(1) == 1)
    val flags = frame(2) & 0xff
    assert((flags & 0x1) != 0, "shuffle bit")
    assert((flags & 0x10) != 0, "dont-split bit (streams are whole blocks)")
    assert((flags >>> 5) == 4, "zstd codec code")
    assert(frame(3) == 8)
    assert(leInt(frame, 4) == 300000)
    assert(leInt(frame, 12) == frame.length)
  }
}
