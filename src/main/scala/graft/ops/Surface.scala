package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Gridded-surface operators (SURVEY.md §2.9 M2/M3): spline-style
  * interpolation of scattered points onto a regular grid, and grid
  * sampling at arbitrary points (GMT surface / grdtrack analogues,
  * reference /root/reference/deepicedrain/spatiotemporal.py:415-449,
  * vizplots.py:633-649).
  *
  * Distribution model mirrors the data: ONE grid is small (a lake at
  * 250 m spacing is ~10^4 cells — the reference solves it in a single
  * GMT call), but there are MANY (lake x cycle), so the engine
  * distributes across groups via groupByKey.mapGroups and solves each
  * grid densely in-task. Divergence from GMT's minimum-curvature
  * solver: we run tension-free Laplace relaxation seeded with the
  * blockmedian values (data cells pinned) — documented tolerance, not
  * bit-parity, as SURVEY.md §7.8 prescribes.
  */
object Surface {

  case class GridCell(key: String, xb: Int, yb: Int, z: Double)

  /** Interpolate per-key scattered cells onto the full bbox grid of
    * that key. Data cells are pinned (Dirichlet); empty cells start at
    * 0 and relax to the average of their neighbors (JACOBI sweeps —
    * double-buffered, fixed left/right/up/down accumulation order, so
    * the result is bit-deterministic at any parallelism AND exactly
    * reproducible by the DuckDB recursive-CTE oracle, which replays
    * the identical IEEE op sequence; a Gauss-Seidel in-place sweep or
    * a data-order-dependent seed mean would both break that); cells
    * farther than `maskCells` from any data cell are dropped, like GMT
    * surface's mask radius.
    */
  def interpolate(cells: Dataset[GridCell], iters: Int = 300,
      maskCells: Int = 3, maxCellsPerKey: Int = 1 << 17): Dataset[GridCell] = {
    val spark = cells.sparkSession
    import spark.implicits._
    cells.groupByKey(_.key).flatMapGroups { (key, it) =>
      val pts = it.toArray
      val xmin = pts.map(_.xb).min; val xmax = pts.map(_.xb).max
      val ymin = pts.map(_.yb).min; val ymax = pts.map(_.yb).max
      val w = xmax - xmin + 1; val h = ymax - ymin + 1
      require(w.toLong * h <= maxCellsPerKey,
        s"grid $key is ${w}x$h cells; raise maxCellsPerKey or coarsen spacing")
      val z = Array.fill(w * h)(0.0)
      val pinned = Array.fill(w * h)(false)
      for (p <- pts) { val i = (p.yb - ymin) * w + (p.xb - xmin); z(i) = p.z; pinned(i) = true }
      // distance-to-data mask (Chebyshev, BFS-free approximation via
      // maskCells dilation passes)
      val near = pinned.clone()
      for (_ <- 0 until maskCells) {
        val prev = near.clone()
        var yy = 0
        while (yy < h) {
          var xx = 0
          while (xx < w) {
            if (!near(yy * w + xx)) {
              var dy = -1
              var found = false
              while (dy <= 1 && !found) {
                var dx = -1
                while (dx <= 1 && !found) {
                  val nx = xx + dx; val ny = yy + dy
                  if (nx >= 0 && nx < w && ny >= 0 && ny < h && prev(ny * w + nx))
                    found = true
                  dx += 1
                }
                dy += 1
              }
              if (found) near(yy * w + xx) = true
            }
            xx += 1
          }
          yy += 1
        }
      }
      // Jacobi Laplace relaxation on non-pinned cells. Missing
      // neighbors contribute +0.0 — an exact fp no-op — so the
      // accumulation is always the SAME four additions in the same
      // order, matching the oracle's (((zl+zr)+zu)+zd)/n expression.
      var cur = z
      var nxt = new Array[Double](w * h)
      var sweep = 0
      while (sweep < iters) {
        var yy = 0
        while (yy < h) {
          var xx = 0
          while (xx < w) {
            val i = yy * w + xx
            if (pinned(i)) nxt(i) = cur(i)
            else {
              val zl = if (xx > 0) cur(i - 1) else 0.0
              val zr = if (xx < w - 1) cur(i + 1) else 0.0
              val zu = if (yy > 0) cur(i - w) else 0.0
              val zd = if (yy < h - 1) cur(i + w) else 0.0
              var n = 0
              if (xx > 0) n += 1
              if (xx < w - 1) n += 1
              if (yy > 0) n += 1
              if (yy < h - 1) n += 1
              nxt(i) = if (n > 0) (((zl + zr) + zu) + zd) / n else cur(i)
            }
            xx += 1
          }
          yy += 1
        }
        val t = cur; cur = nxt; nxt = t
        sweep += 1
      }
      for {
        yy <- 0 until h
        xx <- 0 until w
        if near(yy * w + xx)
      } yield GridCell(key, xx + xmin, yy + ymin, cur(yy * w + xx))
    }
  }

  /** grdtrack (M3): sample a raster-as-table grid at track points by
    * bin key, filling off-grid points with the grid's median z
    * (vizplots.py:633-649's NaN->median). Pure equi-join + broadcast
    * of the 1-row median — no shuffle of the track.
    */
  def grdtrack(track: DataFrame, grid: DataFrame,
      xBin: String = "x_bin", yBin: String = "y_bin", zCol: String = "z"): DataFrame = {
    val med = grid.agg(median(col(zCol)).as("_zmed"))
    track
      .join(grid.select(col(xBin), col(yBin), col(zCol)), Seq(xBin, yBin), "left")
      .crossJoin(broadcast(med))
      .withColumn(zCol, coalesce(col(zCol), col("_zmed")))
      .drop("_zmed")
  }
}
