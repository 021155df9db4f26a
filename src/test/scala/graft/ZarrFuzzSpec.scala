package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.zarr.ZarrMeta

/** Adversarial fuzz over the Zarr metadata JSON path, mirroring
  * Hdf5FuzzSpec / NetCdfSpec's corrupt-granule sweeps: `.zarray` and
  * `.zmetadata` documents are untrusted store content, so random
  * mutations of valid metadata must either still parse to a
  * VALIDATED ArrayMeta (bounded chunk extent, plausible dtype) or
  * raise a clean, typed error — never an OOM-sized allocation, hang,
  * or an exotic exception escaping the decode layer. Seeded:
  * failures reproduce.
  */
class ZarrFuzzSpec extends AnyFunSuite {

  private val validZarray = ZarrMeta.emit(ZarrMeta.ArrayMeta(
    shape = Seq(60175L), chunks = Seq(8192), dtype = "<f8",
    compressor = Some(ZarrMeta.Compressor("blosc", 5, "lz4", 1)),
    fillValue = 0.0, order = "C", dimSeparator = "."))

  private val validZmeta = ZarrMeta.emitConsolidated(Seq(
    "h_corr" -> ZarrMeta.ArrayMeta(Seq(100L, 3), Seq(10, 3), "<f8",
      None, Double.NaN, "C", "."),
    "ref_pt" -> ZarrMeta.ArrayMeta(Seq(100L), Seq(10), "<i4",
      Some(ZarrMeta.Compressor("zlib", 6)), 0.0, "C", ".")))

  /** The complete allowed failure set for hostile metadata. */
  private def cleanFailure(t: Throwable): Boolean = t match {
    case _: IllegalArgumentException => true // require() / explicit throws
    case _: com.fasterxml.jackson.core.JacksonException => true // malformed JSON
    case _ => false
  }

  private def sweep(doc: String, parse: String => Any): (Int, Int) = {
    val rnd = new scala.util.Random(20260814L)
    var ok = 0
    var rejected = 0
    val printable = (' ' to '~').toArray
    for (trial <- 0 until 3000) {
      val chars = doc.toCharArray
      val mutated =
        if (trial % 7 == 0) new String(chars, 0, rnd.nextInt(chars.length)) // truncate
        else {
          for (_ <- 0 to rnd.nextInt(5))
            chars(rnd.nextInt(chars.length)) = printable(rnd.nextInt(printable.length))
          new String(chars)
        }
      val before = Runtime.getRuntime.totalMemory()
      try { parse(mutated); ok += 1 }
      catch {
        case t: Throwable =>
          assert(cleanFailure(t),
            s"trial $trial escaped the clean-failure set: " +
              s"${t.getClass.getName}: ${t.getMessage}\ndoc: $mutated")
          rejected += 1
      }
      // a mutation that survives parse must not have smuggled in an
      // absurd chunk extent (the ArrayMeta require gates it, but this
      // asserts the gate is actually wired) — heap growth across one
      // parse should be nil
      assert(Runtime.getRuntime.totalMemory() - before < (1L << 30),
        s"trial $trial grew the heap by over 1 GiB")
    }
    (ok, rejected)
  }

  test(".zarray: 3000 seeded mutations all parse or fail cleanly") {
    val (ok, rejected) = sweep(validZarray, ZarrMeta.parse)
    // both outcomes must actually occur or the sweep proves nothing
    assert(ok > 0 && rejected > 0, s"degenerate sweep: ok=$ok rejected=$rejected")
  }

  test(".zmetadata: 3000 seeded mutations all parse or fail cleanly") {
    val (ok, rejected) = sweep(validZmeta, ZarrMeta.parseConsolidated)
    assert(ok > 0 && rejected > 0, s"degenerate sweep: ok=$ok rejected=$rejected")
  }

  test("targeted hostile values raise clean errors, never allocations") {
    val hostile = Seq(
      // 2 EiB chunk — would be a single new Array[Byte] if unchecked
      """{"zarr_format":2,"shape":[9e18],"chunks":[2305843009213693952],
         "dtype":"<f8","compressor":null,"fill_value":0,"order":"C"}""",
      // negative shape
      """{"zarr_format":2,"shape":[-5],"chunks":[5],"dtype":"<f8",
         "compressor":null,"fill_value":0,"order":"C"}""",
      // zero chunk (division by zero downstream if unchecked)
      """{"zarr_format":2,"shape":[10],"chunks":[0],"dtype":"<f8",
         "compressor":null,"fill_value":0,"order":"C"}""",
      // non-numeric dtype width
      """{"zarr_format":2,"shape":[10],"chunks":[5],"dtype":"<fx",
         "compressor":null,"fill_value":0,"order":"C"}""",
      // uint64: no lossless JVM type
      """{"zarr_format":2,"shape":[10],"chunks":[5],"dtype":"<u8",
         "compressor":null,"fill_value":0,"order":"C"}""",
      // Fortran order
      """{"zarr_format":2,"shape":[10],"chunks":[5],"dtype":"<f8",
         "compressor":null,"fill_value":0,"order":"F"}""",
      // unknown compressor
      """{"zarr_format":2,"shape":[10],"chunks":[5],"dtype":"<f8",
         "compressor":{"id":"lzma"},"fill_value":0,"order":"C"}""",
      // rank mismatch between shape and chunks
      """{"zarr_format":2,"shape":[10,3],"chunks":[5],"dtype":"<f8",
         "compressor":null,"fill_value":0,"order":"C"}""")
    hostile.foreach { doc =>
      val t = intercept[Throwable](ZarrMeta.parse(doc))
      assert(cleanFailure(t),
        s"hostile doc escaped: ${t.getClass.getName}: ${t.getMessage}")
    }
  }
}
