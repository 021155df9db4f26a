package graft

import java.nio.file.Files

import graft.sources.hdf5.{Hdf5Reader, Hdf5Writer}
import graft.sources.hdf5.Hdf5Writer.{Dset, Group}

/** Byte-level round-trip gate for the from-scratch HDF5 format layer
  * (S2 ingest): writer and reader are independent encodings of the
  * public HDF5 spec, so a mistaken structure on either side breaks
  * the round trip. Chunked cases deliberately use non-dividing chunk
  * shapes to exercise edge-chunk clipping, and both superblock
  * generations (v0 symbol-table groups, v2 link-message groups) are
  * pinned.
  */
class Hdf5FormatSpec extends SparkSpec {

  private def tmpFile(name: String): String = {
    val d = Files.createTempDirectory("graft_hdf5").toString
    s"$d/$name"
  }

  private def openGroup(path: String, group: String) = {
    val r = new Hdf5Reader(path)
    (r, r.groupChildren(group).map { case (n, a) => n -> r.dataset(n, a) }.toMap)
  }

  test("contiguous f64/i64 1-D round trip (superblock v0)") {
    val path = tmpFile("basic.h5")
    val xs = Array.tabulate(100)(i => i * 0.25 - 3.0)
    val ks = Array.tabulate(100)(i => i.toLong * 7 - 50)
    Hdf5Writer.write(path, Seq(Group("g1", Seq(
      Dset("x", "f64", Seq(100), Hdf5Writer.f64Bytes(xs)),
      Dset("k", "i64", Seq(100), Hdf5Writer.i64Bytes(ks))))))
    val (r, ds) = openGroup(path, "g1")
    try {
      assert(ds("x").dims == Seq(100L))
      assert(r.readDoubles(ds("x")).sameElements(xs))
      assert(r.readLongs(ds("k")).sameElements(ks))
    } finally r.close()
  }

  test("chunked + shuffle + deflate 2-D with edge chunks round trips") {
    val path = tmpFile("chunked.h5")
    val n = 23; val c = 5 // chunks 7x3 do NOT divide 23x5
    val vals = Array.tabulate(n * c)(i => math.sin(i.toDouble) * 1000.0)
    Hdf5Writer.write(path, Seq(Group("pt1", Seq(
      Dset("h_corr", "f64", Seq(n, c), Hdf5Writer.f64Bytes(vals),
        chunkDims = Some(Seq(7, 3)), deflate = Some(6))))))
    val (r, ds) = openGroup(path, "pt1")
    try {
      assert(ds("h_corr").dims == Seq(n.toLong, c.toLong))
      assert(ds("h_corr").filters.map(_.id) == Seq(2, 1)) // shuffle, deflate
      assert(r.readDoubles(ds("h_corr")).sameElements(vals))
    } finally r.close()
  }

  test("narrow integer types and f32 decode exactly") {
    val path = tmpFile("types.h5")
    val i32 = Array.tabulate(40)(i => i * -3)
    val i16 = Array.tabulate(40)(i => (i * 5 - 100).toShort)
    val i8 = Array.tabulate(40)(i => (i - 20).toByte)
    val f32 = Array.tabulate(40)(i => i * 0.5f)
    val i16b = {
      val bb = java.nio.ByteBuffer.allocate(80).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      i16.foreach(bb.putShort); bb.array()
    }
    Hdf5Writer.write(path, Seq(Group("g", Seq(
      Dset("a", "i32", Seq(40), Hdf5Writer.i32Bytes(i32)),
      Dset("b", "i16", Seq(40), i16b),
      Dset("c", "i8", Seq(40), Hdf5Writer.i8Bytes(i8)),
      Dset("d", "f32", Seq(40), Hdf5Writer.f32Bytes(f32))))))
    val (r, ds) = openGroup(path, "g")
    try {
      assert(r.readLongs(ds("a")).sameElements(i32.map(_.toLong)))
      assert(r.readLongs(ds("b")).sameElements(i16.map(_.toLong)))
      assert(r.readLongs(ds("c")).sameElements(i8.map(_.toLong)))
      assert(r.readDoubles(ds("d")).sameElements(f32.map(_.toDouble)))
    } finally r.close()
  }

  test("scalar f64 attributes surface (the _FillValue contract)") {
    val path = tmpFile("attrs.h5")
    Hdf5Writer.write(path, Seq(Group("pt2", Seq(
      Dset("h", "f64", Seq(4), Hdf5Writer.f64Bytes(Array(1.0, 2.0, 3.0e38, 4.0)),
        attrs = Seq("_FillValue" -> 3.0e38, "scale_factor" -> 1.0))))))
    val (r, ds) = openGroup(path, "pt2")
    try {
      assert(ds("h").attrs("_FillValue") == 3.0e38)
      assert(ds("h").attrs("scale_factor") == 1.0)
    } finally r.close()
  }

  test("superblock v2 with link-message groups round trips") {
    val path = tmpFile("v2.h5")
    val xs = Array.tabulate(17)(i => i * 2.0)
    Hdf5Writer.write(path, Seq(
      Group("pt1", Seq(Dset("x", "f64", Seq(17), Hdf5Writer.f64Bytes(xs)))),
      Group("pt3", Seq(Dset("k", "i64", Seq(3),
        Hdf5Writer.i64Bytes(Array(9L, 8L, 7L)))))), sbVersion = 2)
    val r = new Hdf5Reader(path)
    try {
      assert(r.children(r.rootAddr).map(_._1).sorted == Seq("pt1", "pt3"))
      val (_, ds1) = (r, r.groupChildren("pt1").map { case (n, a) => n -> r.dataset(n, a) }.toMap)
      assert(r.readDoubles(ds1("x")).sameElements(xs))
      val ds3 = r.groupChildren("pt3").map { case (n, a) => n -> r.dataset(n, a) }.toMap
      assert(r.readLongs(ds3("k")).sameElements(Array(9L, 8L, 7L)))
    } finally r.close()
  }

  test("many datasets per group and multi-group files list correctly") {
    val path = tmpFile("many.h5")
    val groups = (1 to 3).map { g =>
      Group(s"pt$g", (1 to 9).map { d =>
        Dset(s"var_$d", "f64", Seq(5),
          Hdf5Writer.f64Bytes(Array.tabulate(5)(i => g * 100.0 + d * 10.0 + i)))
      })
    }
    Hdf5Writer.write(path, groups)
    val r = new Hdf5Reader(path)
    try {
      assert(r.children(r.rootAddr).map(_._1) == Seq("pt1", "pt2", "pt3"))
      val ds = r.groupChildren("pt2").map { case (n, a) => n -> r.dataset(n, a) }.toMap
      assert(ds.keySet == (1 to 9).map(d => s"var_$d").toSet)
      assert(r.readDoubles(ds("var_4"))(2) == 100.0 * 2 + 40.0 + 2)
    } finally r.close()
  }

  test("nested groups round-trip (the ATL06 /laser/land_ice_segments shape)") {
    val path = tmpFile("nested.h5")
    val xs = Array.tabulate(9)(i => i + 0.5)
    Hdf5Writer.write(path, Seq(
      Group("gt1l", Nil, Seq(
        Group("land_ice_segments", Seq(
          Dset("h_li", "f64", Seq(9), Hdf5Writer.f64Bytes(xs)))))),
      Group("gt1r", Nil, Seq(
        Group("land_ice_segments", Seq(
          Dset("h_li", "f64", Seq(9),
            Hdf5Writer.f64Bytes(xs.map(_ * 2)))))))))
    val r = new Hdf5Reader(path)
    try {
      assert(r.children(r.rootAddr).map(_._1) == Seq("gt1l", "gt1r"))
      val ds = r.groupChildren("gt1l/land_ice_segments")
        .map { case (n, a) => n -> r.dataset(n, a) }.toMap
      assert(r.readDoubles(ds("h_li")).sameElements(xs))
      val ds2 = r.groupChildren("gt1r/land_ice_segments")
        .map { case (n, a) => n -> r.dataset(n, a) }.toMap
      assert(r.readDoubles(ds2("h_li")).sameElements(xs.map(_ * 2)))
    } finally r.close()
  }

  test("dense (fractal-heap) groups round-trip, incl. nesting and growth") {
    // Real NSIDC ATL11 granules store beam-pair group links densely
    // (fractal heap + v2 B-tree name index) — the layout round 7's
    // reader rejected. 40 datasets push the link content past the 512-
    // byte starting block so the doubling-size path is exercised too.
    val path = tmpFile("dense.h5")
    val groups = Seq(
      Group("pt1", (1 to 40).map { d =>
        Dset(f"cyc_stat_var_$d%02d", "f64", Seq(4),
          Hdf5Writer.f64Bytes(Array.tabulate(4)(i => d * 10.0 + i)))
      }),
      Group("pt2", Nil, Seq(
        Group("ref_surf", Seq(Dset("slope_x", "f64", Seq(3),
          Hdf5Writer.f64Bytes(Array(0.1, 0.2, 0.3))))))))
    Hdf5Writer.write(path, groups, sbVersion = 2, denseGroups = true)
    val r = new Hdf5Reader(path)
    try {
      assert(r.children(r.rootAddr).map(_._1) == Seq("pt1", "pt2"))
      val ds = r.groupChildren("pt1").map { case (n, a) => n -> r.dataset(n, a) }.toMap
      assert(ds.keySet == (1 to 40).map(d => f"cyc_stat_var_$d%02d").toSet)
      assert(r.readDoubles(ds("cyc_stat_var_07")).sameElements(
        Array(70.0, 71.0, 72.0, 73.0)))
      val nested = r.groupChildren("pt2/ref_surf")
        .map { case (n, a) => n -> r.dataset(n, a) }.toMap
      assert(r.readDoubles(nested("slope_x")).sameElements(Array(0.1, 0.2, 0.3)))
    } finally r.close()
  }

  test("v2 object headers with zero chunk-0 gap keep their last message") {
    // chunk-0's stored size excludes the trailing checksum; a reader
    // that holds 4 bytes back silently drops the LAST message when the
    // gap is < 4 bytes. The writer's v2 headers have gap 0 by
    // construction, so the final attribute message only survives if
    // the accounting is right.
    val path = tmpFile("v2ohdr.h5")
    val vals = Array.tabulate(30)(i => i * 1.5)
    Hdf5Writer.write(path, Seq(Group("pt1", Seq(
      Dset("h_corr", "f64", Seq(30), Hdf5Writer.f64Bytes(vals),
        chunkDims = Some(Seq(8)), deflate = Some(6),
        attrs = Seq("_FillValue" -> 3.0e38))))),
      sbVersion = 2, v2Headers = true)
    val (r, ds) = openGroup(path, "pt1")
    try {
      assert(ds("h_corr").attrs("_FillValue") == 3.0e38) // the last message
      assert(ds("h_corr").filters.map(_.id) == Seq(2, 1))
      assert(r.readDoubles(ds("h_corr")).sameElements(vals))
    } finally r.close()
  }

  test("unsigned fixed-point zero-extends; uint64 is rejected") {
    val path = tmpFile("unsigned.h5")
    val u8vals = Seq(0, 1, 127, 128, 255)
    val u16vals = Seq(0, 40000, 65535, 2, 3)
    val u32vals = Seq(7L, 4000000000L, 0L, 1L, 2L)
    val u16raw = {
      val bb = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      u16vals.foreach(v => bb.putShort(v.toShort)); bb.array()
    }
    val u32raw = {
      val bb = java.nio.ByteBuffer.allocate(20).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      u32vals.foreach(v => bb.putInt(v.toInt)); bb.array()
    }
    Hdf5Writer.write(path, Seq(Group("g", Seq(
      Dset("a", "u8", Seq(5), u8vals.map(_.toByte).toArray,
        attrs = Seq("_FillValue" -> 255.0)), // u8 fill of 255 must not read as -1
      Dset("b", "u16", Seq(5), u16raw),
      Dset("c", "u32", Seq(5), u32raw)))))
    val (r, ds) = openGroup(path, "g")
    try {
      assert(r.readLongs(ds("a")).sameElements(u8vals.map(_.toLong)))
      assert(r.readLongs(ds("b")).sameElements(u16vals.map(_.toLong)))
      assert(r.readLongs(ds("c")).sameElements(u32vals))
      assert(r.readDoubles(ds("c")).sameElements(u32vals.map(_.toDouble)))
      assert(ds("a").attrs("_FillValue") == 255.0)
    } finally r.close()
    // the DSv2 schema widens each unsigned type one JVM type up
    val df = spark.read.format("hdf5").option("groups", "g").load(path)
    assert(df.schema("a").dataType.toString == "ShortType")
    assert(df.schema("b").dataType.toString == "IntegerType")
    assert(df.schema("c").dataType.toString == "LongType")
    val rows = df.orderBy("_index").selectExpr("a", "b", "c").collect()
    assert(rows.map(_.getShort(0).toInt).toSeq == u8vals)
    assert(rows.map(_.getInt(1)).toSeq == u16vals)
    assert(rows.map(_.getLong(2)).toSeq == u32vals)

    val path2 = tmpFile("u64.h5")
    Hdf5Writer.write(path2, Seq(Group("g", Seq(
      Dset("x", "u64", Seq(1), Array.fill[Byte](8)(0xff.toByte))))))
    val r2 = new Hdf5Reader(path2)
    try {
      val ex = intercept[IllegalArgumentException] {
        r2.groupChildren("g").foreach { case (n, a) => r2.dataset(n, a) }
      }
      assert(ex.getMessage.contains("uint64"))
    } finally r2.close()
  }

  test("latest-format fixture: v4 chunk indexes + dense groups + v2 headers") {
    // the full libhdf5 "latest format" shape in one file: dense group
    // links, v2 object headers (zero chunk-0 gap), and layout-v4 chunk
    // indexes — Fixed Array client 1 (filtered, edge chunks), Fixed
    // Array client 0 (unfiltered), and Single Chunk (filtered)
    val path = tmpFile("latest.h5")
    val n = 23; val c = 5
    val vals = Array.tabulate(n * c)(i => math.cos(i.toDouble) * 500.0)
    val plain = Array.tabulate(40)(i => i * 3.0 - 7.5)
    val one = Array.tabulate(12)(i => i * 11.0)
    Hdf5Writer.write(path, Seq(Group("pt1", Seq(
      Dset("h_corr", "f64", Seq(n, c), Hdf5Writer.f64Bytes(vals),
        chunkDims = Some(Seq(7, 3)), deflate = Some(6), chunkIndex = "latest",
        attrs = Seq("_FillValue" -> 3.0e38)),
      Dset("plain", "f64", Seq(40), Hdf5Writer.f64Bytes(plain),
        chunkDims = Some(Seq(16)), chunkIndex = "latest"),
      Dset("single", "f64", Seq(12), Hdf5Writer.f64Bytes(one),
        chunkDims = Some(Seq(12)), deflate = Some(6), chunkIndex = "latest"),
      // index type 2: no per-chunk records, contiguous chunk run with
      // an edge chunk (40 = 3x16 grid slots, last one partial)
      Dset("impl", "f64", Seq(40), Hdf5Writer.f64Bytes(plain),
        chunkDims = Some(Seq(16)), chunkIndex = "implicit")))),
      sbVersion = 2, denseGroups = true, v2Headers = true)
    val (r, ds) = openGroup(path, "pt1")
    try {
      assert(r.readDoubles(ds("h_corr")).sameElements(vals))
      assert(ds("h_corr").attrs("_FillValue") == 3.0e38)
      assert(r.readDoubles(ds("plain")).sameElements(plain))
      assert(r.readDoubles(ds("single")).sameElements(one))
      assert(r.readDoubles(ds("impl")).sameElements(plain))
    } finally r.close()
    // and the DSv2 source reads it like any classic file (select the
    // column: this fixture group mixes leading dims, so a fully-pruned
    // count() would probe an arbitrary sibling dataset instead)
    val df = spark.read.format("hdf5").option("groups", "pt1")
      .option("datasets", "plain").load(path)
    val got = df.select("plain").collect().map(_.getDouble(0)).sorted
    assert(got.sameElements(plain.sorted))
  }

  test("extensible-array chunk index round trips, incl. secondary blocks") {
    // the 1-unlimited-dim shape real ATL11 granules use. 251 chunks
    // of 4 elements exercises every EA region: 4 inline index-block
    // elements, the 6 collapsed direct data blocks (secondary blocks
    // 0-3: 16+32+2x32+2x64 = 240 elements), and a partially-filled
    // EASB secondary block (s=4), with an edge chunk at the end.
    val path = tmpFile("earray.h5")
    val big = Array.tabulate(1001)(i => i * 0.5 - 100.0)
    val n = 23; val c = 5
    val filt = Array.tabulate(n * c)(i => math.sin(i * 0.1) * 250.0)
    Hdf5Writer.write(path, Seq(Group("pt2", Seq(
      Dset("big", "f64", Seq(1001), Hdf5Writer.f64Bytes(big),
        chunkDims = Some(Seq(4)), chunkIndex = "extarray", unlimited = true),
      // filtered client-1 elements (addr + stored size + mask), small
      // enough to stay inline + direct blocks
      Dset("filt", "f64", Seq(n, c), Hdf5Writer.f64Bytes(filt),
        chunkDims = Some(Seq(7, 3)), deflate = Some(6),
        chunkIndex = "extarray", unlimited = true)))),
      sbVersion = 2, v2Headers = true)
    val (r, ds) = openGroup(path, "pt2")
    try {
      assert(ds("big").dims == Seq(1001L))
      assert(r.readDoubles(ds("big")).sameElements(big))
      assert(r.readDoubles(ds("filt")).sameElements(filt))
    } finally r.close()
    // DSv2 source path over the EA-indexed file
    val df = spark.read.format("hdf5").option("groups", "pt2")
      .option("datasets", "big").load(path)
    assert(df.select("big").collect().map(_.getDouble(0)).sorted
      .sameElements(big.sorted))
  }

  test("v2 B-tree chunk index round trips (records 10 and 11)") {
    // the >1-unlimited-dims index: scaled-offset records in a single
    // leaf, unfiltered (type 10) and filtered (type 11), edge chunks
    // in both dimensions
    val path = tmpFile("btree2.h5")
    val n = 23; val c = 5
    val a = Array.tabulate(n * c)(i => i * 2.0 - 31.0)
    val b = Array.tabulate(n * c)(i => math.cos(i * 0.2) * 77.0)
    Hdf5Writer.write(path, Seq(Group("pt3", Seq(
      Dset("plain2", "f64", Seq(n, c), Hdf5Writer.f64Bytes(a),
        chunkDims = Some(Seq(7, 3)), chunkIndex = "btree2"),
      Dset("filt2", "f64", Seq(n, c), Hdf5Writer.f64Bytes(b),
        chunkDims = Some(Seq(7, 3)), deflate = Some(6), chunkIndex = "btree2")))),
      sbVersion = 2, v2Headers = true)
    val (r, ds) = openGroup(path, "pt3")
    try {
      assert(r.readDoubles(ds("plain2")).sameElements(a))
      assert(r.readDoubles(ds("filt2")).sameElements(b))
    } finally r.close()
  }

  test("big-endian numerics decode to the little-endian contract") {
    val path = tmpFile("bigend.h5")
    val xs = Array.tabulate(50)(i => i * 1.5 - 10.0)
    val ks = Array.tabulate(50)(i => i.toLong * 13 - 100)
    Hdf5Writer.write(path, Seq(Group("g", Seq(
      Dset("x", "f64", Seq(50), Hdf5Writer.f64Bytes(xs), bigEndian = true),
      Dset("k", "i64", Seq(50), Hdf5Writer.i64Bytes(ks),
        chunkDims = Some(Seq(16)), deflate = Some(6), bigEndian = true)))))
    val (r, ds) = openGroup(path, "g")
    try {
      assert(ds("x").dtype.bigEndian)
      assert(r.readDoubles(ds("x")).sameElements(xs))
      assert(r.readLongs(ds("k")).sameElements(ks))
    } finally r.close()
  }

  test("vlen (h5py-style) string attributes round-trip via the global heap") {
    val path = tmpFile("vlen.h5")
    val xs = Array.tabulate(10)(_ * 2.0)
    Hdf5Writer.write(path, Seq(Group("g", Seq(
      Dset("x", "f64", Seq(10), Hdf5Writer.f64Bytes(xs),
        attrs = Seq("_FillValue" -> 9.9e9),
        sattrs = Seq("units" -> "meters"),
        vsattrs = Seq("long_name" -> "height above ellipsoid",
          "description" -> "synthetic"))))))
    val (r, ds) = openGroup(path, "g")
    try {
      assert(ds("x").strAttrs("units") == "meters")
      assert(ds("x").strAttrs("long_name") == "height above ellipsoid")
      assert(ds("x").strAttrs("description") == "synthetic")
      assert(ds("x").attrs("_FillValue") == 9.9e9)
      assert(r.readDoubles(ds("x")).sameElements(xs))
    } finally r.close()
  }

  test("an attribute of an unmodeled datatype is skipped, not fatal") {
    // hand-corrupt a written attr's datatype class to 6 (compound):
    // the dataset must still read, with that attr absent
    val path = tmpFile("weirdattr.h5")
    val xs = Array.tabulate(8)(_ * 1.0)
    Hdf5Writer.write(path, Seq(Group("g", Seq(
      Dset("x", "f64", Seq(8), Hdf5Writer.f64Bytes(xs),
        attrs = Seq("good" -> 1.5),
        sattrs = Seq("weird" -> "zzz"))))))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    // find the attr named "weird" and flip its datatype class byte:
    // the attr message layout is header(8) + name + pad, then the
    // datatype whose first byte is (version<<4)|class
    val nameB = "weird".getBytes("UTF-8") :+ 0.toByte
    val at = bytes.indexOfSlice(nameB.toSeq)
    assert(at > 0)
    val dtOff = at + ((nameB.length + 7) & ~7)
    assert((bytes(dtOff) & 0x0f) == 3) // sanity: it IS the string dtype
    bytes(dtOff) = ((1 << 4) | 6).toByte // class 6: compound
    val path2 = tmpFile("weirdattr2.h5")
    Files.write(java.nio.file.Paths.get(path2), bytes)
    val (r, ds) = openGroup(path2, "g")
    try {
      assert(!ds("x").strAttrs.contains("weird"), "unmodeled attr must be skipped")
      assert(ds("x").attrs("good") == 1.5)
      assert(r.readDoubles(ds("x")).sameElements(xs))
    } finally r.close()
  }

  test("fixed-length strings: datasets, attributes, and the DSv2 column") {
    // real granules carry string metadata (units, description) and the
    // odd string dataset; class-3 fixed-length NUL-padded is the shape
    val path = tmpFile("strings.h5")
    val names = Seq("gt1l", "gt1r", "gt2l", "gt2r")
    val vals = Array(1.5, 2.5, 3.5, 4.5)
    Hdf5Writer.write(path, Seq(Group("meta", Seq(
      Dset("beam", "s8", Seq(4), Hdf5Writer.strBytes(names, 8)),
      Dset("h", "f64", Seq(4), Hdf5Writer.f64Bytes(vals),
        attrs = Seq("_FillValue" -> 3.0e38),
        sattrs = Seq("units" -> "meters", "long_name" -> "mean height"))))))
    val (r, ds) = openGroup(path, "meta")
    try {
      assert(r.readStrings(ds("beam")).toSeq == names)
      assert(ds("h").strAttrs == Map("units" -> "meters",
        "long_name" -> "mean height"))
      assert(ds("h").attrs("_FillValue") == 3.0e38) // numeric attrs coexist
    } finally r.close()
    val df = spark.read.format("hdf5").option("groups", "meta").load(path)
    assert(df.schema("beam").dataType.toString == "StringType")
    val rows = df.orderBy("_index").selectExpr("beam", "h").collect()
    assert(rows.map(_.getString(0)).toSeq == names)
    assert(rows.map(_.getDouble(1)).toSeq == vals.toSeq)
  }

  test("a non-HDF5 file is rejected at open, not misparsed") {
    val path = tmpFile("bad.h5")
    Files.write(java.nio.file.Paths.get(path), "PAR1 not hdf5 at all".getBytes)
    val ex = intercept[IllegalArgumentException] { new Hdf5Reader(path) }
    assert(ex.getMessage.contains("signature"))
  }
}
