package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Surface
import graft.ops.Surface.GridCell

class SurfaceSpec extends SparkSpec {

  test("interpolation reproduces a harmonic (planar) surface at empty cells") {
    val sess = spark
    import sess.implicits._
    // plane z = 2x + 3y sampled on a sparse checkerboard of a 12x12
    // grid; Laplace relaxation must recover the plane in the holes
    // (planes are harmonic)
    val pts = for {
      x <- 0 until 12; y <- 0 until 12
      if (x + y) % 2 == 0 || x == 0 || y == 0 || x == 11 || y == 11
    } yield GridCell("lake1", x, y, 2.0 * x + 3.0 * y)
    val out = Surface.interpolate(pts.toDS(), iters = 500).collect()
    assert(out.length == 144) // full bbox, all within mask
    val err = out.map(c => math.abs(c.z - (2.0 * c.xb + 3.0 * c.yb))).max
    assert(err < 1e-6, s"max interpolation error $err")
  }

  test("mask drops cells farther than maskCells from data") {
    val sess = spark
    import sess.implicits._
    // two data cells 20 apart: cells between them beyond the 3-cell
    // mask must be absent
    val pts = Seq(GridCell("g", 0, 0, 1.0), GridCell("g", 20, 0, 2.0))
    val out = Surface.interpolate(pts.toDS(), iters = 10, maskCells = 3).collect()
    val xs = out.map(_.xb).toSet
    assert(xs.contains(0) && xs.contains(3) && xs.contains(20) && xs.contains(17))
    assert(!xs.contains(10), "cell 10 is 7 cells from data — must be masked")
  }

  test("keys are solved independently") {
    val sess = spark
    import sess.implicits._
    val pts = Seq(
      GridCell("a", 0, 0, 5.0), GridCell("a", 2, 0, 5.0),
      GridCell("b", 0, 0, -5.0), GridCell("b", 2, 0, -5.0))
    val out = Surface.interpolate(pts.toDS(), iters = 100).collect()
    assert(out.filter(_.key == "a").forall(c => math.abs(c.z - 5.0) < 1e-9))
    assert(out.filter(_.key == "b").forall(c => math.abs(c.z + 5.0) < 1e-9))
  }

  test("tension=1 is bit-identical to the round-5 Laplace solver") {
    val sess = spark
    import sess.implicits._
    val pts = for {
      x <- 0 until 10; y <- 0 until 10
      if (x * 3 + y * 7) % 4 == 0
    } yield GridCell("t", x, y, math.sin(x * 1.7 + y * 0.3) * 10)
    val legacy = Surface.interpolate(pts.toDS(), iters = 150).collect()
      .map(c => (c.xb, c.yb) -> c.z).toMap
    val explicit = Surface.interpolate(pts.toDS(), iters = 150, tension = 1.0)
      .collect().map(c => (c.xb, c.yb) -> c.z).toMap
    assert(legacy == explicit, "tension=1.0 must take the exact legacy path")
  }

  test("tension: planes are exact fixed points at any tension; t=0.35 stays stable and pins data") {
    val sess = spark
    import sess.implicits._
    // planes satisfy both the laplacian and the biharmonic equation,
    // so the blended stencil must reproduce them in the holes too
    val pts = for {
      x <- 0 until 12; y <- 0 until 12
      if (x + y) % 2 == 0 || x == 0 || y == 0 || x == 11 || y == 11
    } yield GridCell("lake1", x, y, 2.0 * x + 3.0 * y)
    val out = Surface.interpolate(pts.toDS(), iters = 2000, tension = 0.35).collect()
    assert(out.length == 144)
    assert(out.forall(c => java.lang.Double.isFinite(c.z)),
      "damped Jacobi must not diverge at tension 0.35")
    val err = out.map(c => math.abs(c.z - (2.0 * c.xb + 3.0 * c.yb))).max
    assert(err < 1e-3, s"max interpolation error $err at tension 0.35")
    // pinned cells are Dirichlet at every tension
    val pinnedErr = out.filter(c => (c.xb + c.yb) % 2 == 0)
      .map(c => math.abs(c.z - (2.0 * c.xb + 3.0 * c.yb))).max
    assert(pinnedErr == 0.0, "data cells must stay exactly pinned")
  }

  test("grdtrack samples grid cells and median-fills misses") {
    val grid = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, 0L, 10.0), Row(1L, 0L, 20.0), Row(0L, 1L, 30.0))),
      StructType(Seq(StructField("x_bin", LongType), StructField("y_bin", LongType),
        StructField("z", DoubleType))))
    val track = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, 0L, 0L), Row(2, 1L, 0L), Row(3, 9L, 9L))),
      StructType(Seq(StructField("pt", IntegerType),
        StructField("x_bin", LongType), StructField("y_bin", LongType))))
    val out = Surface.grdtrack(track, grid).collect()
      .map(r => r.getAs[Int]("pt") -> r.getAs[Double]("z")).toMap
    assert(out(1) == 10.0 && out(2) == 20.0)
    assert(out(3) == 20.0) // median of (10,20,30)
  }
}
