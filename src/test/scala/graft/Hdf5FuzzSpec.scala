package graft

import java.nio.file.Files

import graft.sources.hdf5.{Hdf5Reader, Hdf5Writer}
import graft.sources.hdf5.Hdf5Writer.{Dset, Group}

/** Seeded randomized round-trip sweep over the HDF5 byte layer: every
  * iteration draws a dtype, rank, dims, layout (contiguous / chunked
  * with random non-dividing chunk dims), filter pipeline, chunk-index
  * generation (v1 B-tree vs latest Single-Chunk/Fixed-Array), and
  * file generation (superblock v0/v2, compact/dense groups, v1/v2
  * object headers), then asserts the reassembled RAW BYTES equal the
  * input exactly. Byte-level comparison (not typed values) is the
  * strongest check and sidesteps NaN-payload equality for float
  * dtypes. The seed is fixed — failures reproduce.
  */
class Hdf5FuzzSpec extends SparkSpec {

  test("60 randomized write/read byte round trips across the format matrix") {
    val rnd = new scala.util.Random(20260813L)
    val dir = Files.createTempDirectory("graft_hdf5_fuzz").toString
    val dtypes = Seq("f64", "f32", "i64", "i32", "i16", "i8", "u8", "u16", "u32")
    (1 to 60).foreach { i =>
      val rank = 1 + rnd.nextInt(2)
      val dims = Seq.fill(rank)(1 + rnd.nextInt(40))
      val dtype = dtypes(rnd.nextInt(dtypes.length))
      val esz = Hdf5Writer.elemSize(dtype)
      val data = new Array[Byte](dims.product * esz)
      rnd.nextBytes(data)
      // chunk dims chosen so the grid stays small but edge chunks
      // (non-dividing shapes) appear often
      val chunk =
        if (rnd.nextBoolean())
          Some(dims.map(d => math.max(1, (d + rnd.nextInt(3)) / (1 + rnd.nextInt(3)))))
        else None
      val deflate =
        if (chunk.isDefined && rnd.nextBoolean()) Some(1 + rnd.nextInt(8)) else None
      val idx =
        if (chunk.isDefined && deflate.isEmpty && rnd.nextInt(4) == 0) "implicit"
        else if (chunk.isDefined) Seq("latest", "btree1", "extarray", "btree2")(rnd.nextInt(4))
        else "btree1"
      val unlimited = idx == "extarray" && rnd.nextBoolean()
      val be = rnd.nextInt(4) == 0 // big-endian storage
      val sb = if (rnd.nextBoolean()) 2 else 0
      val dense = sb == 2 && rnd.nextBoolean()
      val v2h = sb == 2 && rnd.nextBoolean()
      val path = s"$dir/f$i.h5"
      val cfg = s"i=$i dtype=$dtype dims=$dims chunk=$chunk deflate=$deflate " +
        s"idx=$idx unlimited=$unlimited be=$be sb=$sb dense=$dense v2h=$v2h"
      Hdf5Writer.write(path, Seq(Group("g", Seq(
        Dset("d", dtype, dims, data, chunkDims = chunk, deflate = deflate,
          chunkIndex = idx, unlimited = unlimited, bigEndian = be)))),
        sbVersion = sb, denseGroups = dense, v2Headers = v2h)
      val r = new Hdf5Reader(path)
      try {
        val meta = r.groupChildren("g")
          .collectFirst { case ("d", a) => r.dataset("d", a) }.get
        assert(meta.dims == dims.map(_.toLong), cfg)
        val got = r.readRaw(meta)
        assert(got.sameElements(data), s"byte round trip diverged: $cfg")
      } finally r.close()
    }
  }
}
