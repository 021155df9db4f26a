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
    * 0 and relax (JACOBI sweeps — double-buffered, fixed accumulation
    * order, so the result is bit-deterministic at any parallelism AND
    * exactly reproducible by the DuckDB recursive-CTE oracle, which
    * replays the identical IEEE op sequence; a Gauss-Seidel in-place
    * sweep or a data-order-dependent seed mean would both break
    * that); cells farther than `maskCells` from any data cell are
    * dropped, like GMT surface's mask radius.
    *
    * `tension` follows GMT surface -T (reference runs 0.35,
    * /root/reference/deepicedrain/spatiotemporal.py:417-424): the
    * relaxed equation is (1-T)*biharmonic - T*laplacian = 0. T=1 is
    * the membrane/harmonic limit and keeps round 5's exact 4-neighbor
    * update (undamped, bit-identical to the old output); T<1 blends
    * in the 13-point minimum-curvature stencil, iterated as DAMPED
    * Jacobi z' = 0.5*z + 0.5*stencil — plain Jacobi on the biharmonic
    * term diverges (the checkerboard mode amplifies ~2.1x at T=0.35;
    * halving the step caps every mode's spectral radius below 1 for
    * omega <= ~0.65). Boundary cells renormalize by the weights of
    * the neighbors actually present, so constants stay exact fixed
    * points. All weight arithmetic is written in the same literal op
    * order here and in the SQL oracle.
    */
  def interpolate(cells: Dataset[GridCell], iters: Int = 300,
      maskCells: Int = 3, maxCellsPerKey: Int = 1 << 17,
      tension: Double = 1.0): Dataset[GridCell] = {
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
      // Relaxation on non-pinned cells. Missing neighbors contribute
      // +0.0 — an exact fp no-op — so the accumulation is always the
      // SAME additions in the same order, matching the oracle's
      // expression tree term for term.
      val laplace = tension == 1.0
      // weight arithmetic written EXACTLY as in the SQL oracle
      val wa = 8 * (1 - tension) + tension
      val wd = 2 * (1 - tension)
      val w2 = 1 - tension
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
            else if (laplace) {
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
            } else {
              @inline def at(nx: Int, ny: Int): Double =
                if (nx >= 0 && nx < w && ny >= 0 && ny < h) cur(ny * w + nx) else 0.0
              @inline def in(nx: Int, ny: Int): Int =
                if (nx >= 0 && nx < w && ny >= 0 && ny < h) 1 else 0
              val axis = ((at(xx - 1, yy) + at(xx + 1, yy)) + at(xx, yy - 1)) + at(xx, yy + 1)
              val diag = ((at(xx - 1, yy - 1) + at(xx + 1, yy - 1)) + at(xx - 1, yy + 1)) + at(xx + 1, yy + 1)
              val far = ((at(xx - 2, yy) + at(xx + 2, yy)) + at(xx, yy - 2)) + at(xx, yy + 2)
              val na = in(xx - 1, yy) + in(xx + 1, yy) + in(xx, yy - 1) + in(xx, yy + 1)
              val nd = in(xx - 1, yy - 1) + in(xx + 1, yy - 1) + in(xx - 1, yy + 1) + in(xx + 1, yy + 1)
              val n2 = in(xx - 2, yy) + in(xx + 2, yy) + in(xx, yy - 2) + in(xx, yy + 2)
              // the blended stencil only applies to FULL-interior
              // cells (all 12 neighbors in-grid): renormalizing its
              // mixed-sign weights at the boundary stops planes from
              // being fixed points. Edge-adjacent cells fall back to
              // the (damped) 4-neighbor membrane update, whose
              // symmetric form is plane-preserving — the same
              // boundary semantics the Laplace path has always had.
              nxt(i) =
                if (na == 4 && nd == 4 && n2 == 4) {
                  val num = ((wa * axis) - (wd * diag)) - (w2 * far)
                  val den = ((wa * 4) - (wd * 4)) - (w2 * 4)
                  0.5 * cur(i) + 0.5 * (num / den)
                } else if (na > 0) 0.5 * cur(i) + 0.5 * (axis / na)
                else cur(i)
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
