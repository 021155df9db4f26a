package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.hdf5.Hdf5Sink

/** Distributed HDF5 sink round trips, scalar and rank-2: the
  * DataFrame-level write path (one granule file per partition) read
  * back through the DSv2 hdf5 source. Rank-2 arrays are the
  * reference's per-cycle ATL11 layout (h_corr: ref_pt × cycle,
  * /root/reference/atl06_to_atl11.py:170-196).
  */
class Hdf5SinkSpec extends SparkSpec {

  test("rank-2 (array column) granules round trip through the source") {
    val sess = spark
    import sess.implicits._
    val df = (0 until 500)
      .map(i => (i.toLong, Seq(i * 0.5, i * 1.5, i * 2.5), i * 1.0))
      .toDF("k", "h_corr", "v")
    val dir = Files.createTempDirectory("h5sink2d").toString
    Hdf5Sink.write(df.repartition(3), dir, group = "pt1")
    val back = spark.read.format("hdf5")
      .option("groups", "pt1")
      .option("datasets", "k,h_corr,v")
      .load(s"$dir/part-*.h5")
      .select("k", "h_corr", "v")
    assert(back.schema("h_corr").dataType == ArrayType(DoubleType))
    val a = df.orderBy("k").collect().map(_.toSeq)
    val b = back.orderBy("k").collect().map(_.toSeq)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"row mismatch: $x vs $y") }
  }

  test("integer arrays keep their element type") {
    val sess = spark
    import sess.implicits._
    val df = (0 until 40)
      .map(i => (i.toLong, Seq(i, i + 1, i + 2)))
      .toDF("k", "cycles")
    val dir = Files.createTempDirectory("h5sinkint").toString
    Hdf5Sink.write(df.coalesce(1), dir, group = "g")
    val back = spark.read.format("hdf5")
      .option("groups", "g").option("datasets", "k,cycles")
      .load(s"$dir/part-*.h5").select("k", "cycles")
    assert(back.schema("cycles").dataType == ArrayType(IntegerType))
    assert(back.orderBy("k").collect().map(_.getSeq[Int](1)).toSeq ==
      (0 until 40).map(i => Seq(i, i + 1, i + 2)))
  }

  test("ragged array widths are rejected at write time") {
    val sess = spark
    import sess.implicits._
    val bad = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0))).toDF("k", "arr")
    val e = intercept[org.apache.spark.SparkException] {
      Hdf5Sink.write(bad.coalesce(1),
        Files.createTempDirectory("h5ragged").toString)
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }

  test("null array elements are rejected, never silently zeroed") {
    val sess = spark
    import sess.implicits._
    val bad = Seq((1L, Seq[java.lang.Double](1.0, null)))
      .toDF("k", "arr")
    val e = intercept[org.apache.spark.SparkException] {
      Hdf5Sink.write(bad.coalesce(1),
        Files.createTempDirectory("h5nullelem").toString)
    }
    assert(e.getMessage.contains("null") ||
      Option(e.getCause).exists(_.getMessage.contains("null")))
  }
}
