package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.ConvexHull

/** pruneInterior losslessness: the hull over the survivors must be
  * IDENTICAL to the hull over all points, interior mass must actually
  * be pruned, and degenerate geometry must fall back to keep-all.
  */
class ConvexHullPruneSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("g", IntegerType),
    StructField("x", DoubleType),
    StructField("y", DoubleType)))

  private def df(rows: (Int, Double, Double)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
      schema)

  private def hullOf(d: org.apache.spark.sql.DataFrame): Map[Int, Seq[(Double, Double)]] =
    d.groupBy("g")
      .agg(ConvexHull.convex_hull(org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y")).as("h"))
      .collect()
      .map(r => r.getInt(0) ->
        r.getSeq[Row](1).map(p => (p.getDouble(0), p.getDouble(1))).toSeq)
      .toMap

  test("hull over survivors is identical to hull over all points; interior pruned") {
    // dense integer lattice: hull = the 4 square corners
    val pts = for (i <- 0 until 20; j <- 0 until 20)
      yield (1, i.toDouble, j.toDouble)
    val all = df(pts: _*)
    val pruned = ConvexHull.pruneInterior(all, "g", "x", "y")
    val n = pruned.count()
    assert(n < 400, s"prune removed nothing ($n of 400 kept)")
    assert(hullOf(pruned) == hullOf(all))
    // every true hull vertex must have survived
    val kept = pruned.collect().map(r => (r.getDouble(1), r.getDouble(2))).toSet
    for (v <- hullOf(all)(1)) assert(kept.contains(v), s"hull vertex $v was pruned")
  }

  test("degenerate (collinear) group prunes nothing") {
    val line = df((0 until 10).map(i => (1, i.toDouble, 2.0 * i)): _*)
    assert(ConvexHull.pruneInterior(line, "g", "x", "y").count() == 10)
  }

  test("single-point group survives (all octagon edges degenerate)") {
    val one = df((1, 5.0, 5.0))
    assert(ConvexHull.pruneInterior(one, "g", "x", "y").count() == 1)
  }

  test("groups prune independently") {
    val pts = (for (i <- 0 until 10; j <- 0 until 10)
      yield (7, i.toDouble, j.toDouble)) ++ Seq((8, 0.0, 0.0), (8, 1.0, 1.0))
    val pruned = ConvexHull.pruneInterior(df(pts: _*), "g", "x", "y")
    val byG = pruned.collect().groupBy(_.getInt(0)).view.mapValues(_.length).toMap
    assert(byG(8) == 2, "tiny group must keep all points")
    assert(byG(7) < 100, "dense group must prune interior")
    assert(hullOf(pruned) == hullOf(df(pts: _*)))
  }
}
