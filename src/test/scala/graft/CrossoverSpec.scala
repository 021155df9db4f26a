package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Crossover

/** Crossover join on constructed tracks with analytically-known
  * intersections (SURVEY.md §2.3 J2).
  */
class CrossoverSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("track", StringType),
    StructField("ord", IntegerType),
    StructField("x", DoubleType), StructField("y", DoubleType),
    StructField("h", DoubleType), StructField("t", DoubleType)))

  private def df(rows: Seq[(String, Int, Double, Double, Double, Double)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3, r._4, r._5, r._6))),
      schema)

  test("two straight tracks cross at the analytic point with interpolated h/t") {
    // track A along y=1 (left->right), track B along x=3 (bottom->top):
    // crossing at (3, 1). A: h 10->20 over x 0->10 => h_1 = 13.
    // B: h 100->140 over y -2->2 => at y=1, u=0.75 => h_2 = 130.
    val pts =
      (0 to 10).map(i => ("A", i, i.toDouble, 1.0, 10.0 + i, 1000.0 + i)) ++
        (0 to 4).map(i => ("B", i, 3.0, -2.0 + i, 100.0 + 10 * i, 2000.0 + i))
    val xo = Crossover.crossovers(df(pts), "track", "ord",
      "x", "y", "h", "t", cellSize = 5.0, maxGap = 5.0).collect()
    assert(xo.length == 1, s"expected 1 crossing, got ${xo.toSeq}")
    val r = xo.head
    assert(r.getAs[String]("track1") == "A" && r.getAs[String]("track2") == "B")
    assert(math.abs(r.getAs[Double]("x") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("y") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("h_1") - 13.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("h_2") - 130.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("t_1") - 1003.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("t_2") - 2003.0) < 1e-12)
  }

  test("crossing near a cell boundary is emitted exactly once (owner cell)") {
    // both segments straddle cells 0 and 1 in x (two shared cells ->
    // the pair joins twice); crossing at (4.75, 1) must come out once
    val pts = Seq(
      ("A", 0, 4.0, 1.0, 0.0, 0.0), ("A", 1, 6.0, 1.0, 0.0, 0.0),
      ("B", 0, 4.0, 0.0, 0.0, 0.0), ("B", 1, 5.5, 2.0, 0.0, 0.0))
    val xo = Crossover.crossovers(df(pts), "track", "ord",
      "x", "y", "h", "t", cellSize = 5.0, maxGap = 5.0).collect()
    assert(xo.length == 1)
    assert(math.abs(xo.head.getAs[Double]("x") - 4.75) < 1e-12)
  }

  test("parallel tracks produce no crossings; pairSkip filters pairs") {
    val pts =
      (0 to 5).map(i => ("A", i, i.toDouble, 0.0, 0.0, 0.0)) ++
        (0 to 5).map(i => ("B", i, i.toDouble, 1.0, 0.0, 0.0)) ++
        (0 to 5).map(i => ("C", i, i.toDouble, -1.0 + 0.4 * i, 0.0, 0.0))
    val all = Crossover.crossovers(df(pts), "track", "ord",
      "x", "y", "h", "t", cellSize = 5.0, maxGap = 5.0).collect()
    // A-B parallel (no crossing); C crosses A at x=2.5, B at x=5 (but
    // x=5 is the last vertex of B/C -> half-open rule may include it
    // via the s=0 side only if a later segment starts there; accept 1+)
    assert(all.exists(r => r.getAs[String]("track1") == "A" && r.getAs[String]("track2") == "C"))
    assert(!all.exists(r => r.getAs[String]("track1") == "A" && r.getAs[String]("track2") == "B"))
    val skipped = Crossover.crossovers(df(pts), "track", "ord",
      "x", "y", "h", "t", cellSize = 5.0, maxGap = 5.0,
      pairSkip = (a, b) => !(a === "A" && b === "C")).collect()
    assert(!skipped.exists(r => r.getAs[String]("track1") == "A" && r.getAs[String]("track2") == "C"))
  }

  test("max-gap rule drops long segments") {
    // same crossing geometry but track A has a 20-unit gap at the
    // crossing -> segment dropped -> no crossover
    val pts = Seq(
      ("A", 0, -10.0, 1.0, 0.0, 0.0), ("A", 1, 10.0, 1.0, 0.0, 0.0),
      ("B", 0, 3.0, -2.0, 0.0, 0.0), ("B", 1, 3.0, 2.0, 0.0, 0.0))
    val xo = Crossover.crossovers(df(pts), "track", "ord",
      "x", "y", "h", "t", cellSize = 25.0, maxGap = 5.0).collect()
    assert(xo.isEmpty)
  }

  test("withDeltas computes h_X, t_D, dhdt") {
    val pts =
      (0 to 10).map(i => ("A", i, i.toDouble, 1.0, 10.0, 0.0)) ++
        (0 to 4).map(i => ("B", i, 3.0, -2.0 + i, 25.0, 365.25 * 86400.0))
    val xo = Crossover.withDeltas(Crossover.crossovers(df(pts), "track", "ord",
      "x", "y", "h", "t", cellSize = 5.0, maxGap = 5.0)).collect()
    assert(xo.length == 1)
    val r = xo.head
    assert(math.abs(r.getAs[Double]("h_X") - 15.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("dhdt") - 15.0) < 1e-9) // 15 m over exactly 1 yr
  }
}
