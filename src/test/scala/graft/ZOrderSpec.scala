package graft

import org.apache.spark.sql.functions._

import graft.functions.{zorder_key, Geo}

/** Z-order layout contracts: (1) the codegen interleave matches a
  * naive per-bit reference; (2) the point of the key — writing a table
  * range-partitioned + sorted by zkey makes the per-FILE extent of the
  * raw x/y columns collapse, which is exactly what parquet min/max
  * file skipping needs for bbox scans (a round-robin write leaves
  * every file covering the whole domain, extent ratio near 1).
  */
class ZOrderSpec extends SparkSpec {

  private def naive(x: Long, y: Long): Long = {
    var z = 0L
    for (b <- 0 until 32)
      z |= ((x >> b) & 1L) << (2 * b) | ((y >> b) & 1L) << (2 * b + 1)
    z
  }

  test("interleave matches the per-bit reference") {
    assert(Geo.zorder(0, 0) == 0L)
    assert(Geo.zorder(1, 0) == 1L)
    assert(Geo.zorder(0, 1) == 2L)
    assert(Geo.zorder(3, 3) == 15L)
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val x = rnd.nextLong().abs & 0xFFFFFFFFL
      val y = rnd.nextLong().abs & 0xFFFFFFFFL
      assert(Geo.zorder(x, y) == naive(x, y), s"($x,$y)")
    }
    // monotone within a row: fixing y, increasing x increases the key
    assert(Geo.zorder(5, 9) < Geo.zorder(6, 9))
  }

  test("zorder-sorted write collapses per-file x/y extents (file-skipping locality)") {
    val sess = spark
    import sess.implicits._
    // uniform 256x256 scatter, deterministic
    val pts = (0 until 20000).map { i =>
      val x = (i * 2654435761L) % 256
      val y = (i * 40503L) % 256
      (x, y)
    }.toDF("xc", "yc").withColumn("zkey", zorder_key($"xc", $"yc"))

    val parts = 16
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    pts.repartitionByRange(parts, $"zkey").sortWithinPartitions($"zkey")
      .write.mode("overwrite").parquet(s"$base/sorted")
    pts.repartition(parts)
      .write.mode("overwrite").parquet(s"$base/shuffled")

    def meanExtent(path: String): Double = {
      val byFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max($"xc") - min($"xc")) + (max($"yc") - min($"yc"))).as("ext"))
        .select(avg($"ext")).head.getDouble(0)
      byFile
    }
    val sortedExt = meanExtent(s"$base/sorted")
    val shuffledExt = meanExtent(s"$base/shuffled")
    // 16 z-range files over a 256x256 grid ≈ 4x4 tiles: extent ~128
    // per axis (~256 summed) vs ~510 for round-robin files. Require a
    // conservative 1.5x margin so the property, not the constant, is
    // pinned.
    assert(sortedExt * 1.5 < shuffledExt,
      s"sorted=$sortedExt shuffled=$shuffledExt")
  }
}
