package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.zarr.Blosc

/** Adversarial fuzz over the blosc1 FRAME decoder, completing the
  * untrusted-input family (Hdf5FuzzSpec, NetCdfSpec's corrupt-granule
  * sweep, ZarrFuzzSpec): chunk files are store content an attacker can
  * write, so random mutations of valid frames must either decode (a
  * data-region flip yields wrong bytes — the caller's checksum layer's
  * problem) or raise a clean, typed error. Never an OOM-sized
  * allocation (the output buffer is sized by the CALLER's
  * expectNBytes, not the frame), a hang, or an exotic exception from
  * the codec internals. Seeded: failures reproduce.
  */
class BloscFuzzSpec extends AnyFunSuite {

  /** The complete allowed failure set for hostile frames. */
  private def cleanFailure(t: Throwable): Boolean = t match {
    case _: IllegalArgumentException => true // require() / explicit throws
    case _: java.io.IOException => true // truncated zlib stream
    case _: java.util.zip.DataFormatException => true // corrupt zlib
    case _: net.jpountz.lz4.LZ4Exception => true // corrupt lz4
    case t if t.getClass.getName.startsWith("com.github.luben.zstd") => true
    case _ => false
  }

  private val raw: Array[Byte] = {
    val rnd = new scala.util.Random(42)
    val bb = java.nio.ByteBuffer.allocate(8192 * 8)
    // compressible-but-not-constant doubles, like real telemetry
    (0 until 8192).foreach(i => bb.putDouble(i / 7 + rnd.nextDouble() * 0.01))
    bb.array()
  }

  private def sweep(cname: String): (Int, Int) = {
    val frame = Blosc.compress(raw, typesize = 8, cname = cname, clevel = 5,
      shuffle = true)
    val rnd = new scala.util.Random(20260814L)
    var ok = 0
    var rejected = 0
    for (trial <- 0 until 2000) {
      val bytes = frame.clone()
      val mutated =
        if (trial % 7 == 0) java.util.Arrays.copyOf(bytes, rnd.nextInt(bytes.length))
        else {
          // bias half the trials into the 16B header + bstarts table,
          // where the interesting decode decisions live
          val zone = if (trial % 2 == 0) math.min(64, bytes.length) else bytes.length
          for (_ <- 0 to rnd.nextInt(4))
            bytes(rnd.nextInt(zone)) = rnd.nextInt(256).toByte
          bytes
        }
      try {
        val out = Blosc.decompress(mutated, raw.length)
        assert(out.length == raw.length) // never a frame-controlled size
        ok += 1
      } catch {
        case t: Throwable =>
          assert(cleanFailure(t),
            s"$cname trial $trial escaped the clean-failure set: " +
              s"${t.getClass.getName}: ${t.getMessage}")
          rejected += 1
      }
    }
    (ok, rejected)
  }

  for (cname <- Seq("lz4", "zlib", "zstd", "snappy"))
    test(s"$cname frames: 2000 seeded mutations all decode or fail cleanly") {
      val (ok, rejected) = sweep(cname)
      // both outcomes must occur or the sweep proves nothing
      assert(ok > 0 && rejected > 0, s"degenerate sweep: ok=$ok rejected=$rejected")
    }

  test("adversarial headers: huge declared sizes never size an allocation") {
    val hostile = new Array[Byte](32)
    // flags=0 (compressed), typesize 8
    hostile(2) = 0; hostile(3) = 8
    def le(off: Int, v: Int): Unit = {
      hostile(off) = v.toByte; hostile(off + 1) = (v >>> 8).toByte
      hostile(off + 2) = (v >>> 16).toByte; hostile(off + 3) = (v >>> 24).toByte
    }
    le(4, Int.MaxValue) // nbytes: 2 GiB claim
    le(8, Int.MaxValue) // blocksize
    le(12, Int.MaxValue) // cbytes
    val t = intercept[Throwable](Blosc.decompress(hostile, 65536))
    assert(cleanFailure(t), s"${t.getClass.getName}: ${t.getMessage}")
    // memcpy flag + wrapping nbytes (the r10-advice long-arithmetic fix)
    hostile(2) = 0x2 // MemCpyed
    val t2 = intercept[Throwable](Blosc.decompress(hostile, Int.MaxValue))
    assert(cleanFailure(t2), s"${t2.getClass.getName}: ${t2.getMessage}")
  }
}
