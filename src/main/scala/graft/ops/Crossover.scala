package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Track-crossover join — the Spark re-expression of the reference's
  * x2sys_cross stage (/root/reference/atlxi_xover.py:118-158; GMT
  * x2sys engine with the 250 m max-gap rule,
  * X2SYS/ICESAT2/ICESAT2.tag:6).
  *
  * Where the reference enumerates track pairs on the driver and ships
  * each pair to a GMT subprocess, this is ONE dataflow:
  *
  *   points --window--> consecutive segments (W3, no shuffle beyond
  *   the per-track sort) --explode--> covering grid cells (<= 4 per
  *   segment because cellSize >= maxGap) --equi-join on cell--> pair
  *   candidates (the grid key IS the J3 prefilter) --arithmetic-->
  *   exact intersection + linear interpolation --owner-cell filter-->
  *   exactly-once output with NO dedup shuffle.
  *
  * The owner-cell trick: a crossing found in a shared cell is kept
  * only when floor(xi/cell) equals that cell, so a pair of segments
  * sharing several cells emits the crossing exactly once.
  */
object Crossover {

  /** Consecutive-point segments per track (W3 lead-segmentization),
    * dropping segments longer than `maxGap` (the 250 m rule) and
    * degenerate zero-length segments.
    */
  def segments(
      points: DataFrame, trackCol: String, orderCol: String,
      x: String, y: String, h: String, t: String,
      maxGap: Double): DataFrame = {
    val w = Window.partitionBy(col(trackCol)).orderBy(col(orderCol))
    points.select(
        col(trackCol).as("track"),
        col(x).as("x1"), col(y).as("y1"),
        col(h).as("h1"), col(t).as("t1"),
        lead(col(x), 1).over(w).as("x2"),
        lead(col(y), 1).over(w).as("y2"),
        lead(col(h), 1).over(w).as("h2"),
        lead(col(t), 1).over(w).as("t2"))
      .filter(col("x2").isNotNull)
      .filter((col("x2") - col("x1")) * (col("x2") - col("x1")) +
        (col("y2") - col("y1")) * (col("y2") - col("y1")) <= lit(maxGap * maxGap))
      .filter(!(col("x1") === col("x2") && col("y1") === col("y2")))
  }

  /** All crossings between distinct tracks. `pairSkip(a, b)` is the
    * parallel-track skip (atlxi_xover.py:123-127): return true to
    * KEEP the pair (e.g. different reference ground tracks).
    * Requires cellSize >= maxGap so each segment covers <= 2 cells
    * per axis.
    */
  def crossovers(
      points: DataFrame, trackCol: String, orderCol: String,
      x: String, y: String, h: String, t: String,
      cellSize: Double, maxGap: Double,
      pairSkip: (Column, Column) => Column = (_, _) => lit(true)): DataFrame = {
    require(cellSize >= maxGap, "cellSize must be >= maxGap (<=4 cells/segment)")
    val seg = segments(points, trackCol, orderCol, x, y, h, t, maxGap)
    val segc = seg
      .withColumn("cx", explode(sequence(
        floor(least(col("x1"), col("x2")) / cellSize).cast("long"),
        floor(greatest(col("x1"), col("x2")) / cellSize).cast("long"))))
      .withColumn("cy", explode(sequence(
        floor(least(col("y1"), col("y2")) / cellSize).cast("long"),
        floor(greatest(col("y1"), col("y2")) / cellSize).cast("long"))))

    val a = segc.as("a")
    val b = segc.as("b")
    val joined = a.join(b,
      col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
        col("a.track") < col("b.track") &&
        pairSkip(col("a.track"), col("b.track")))

    val d1x = col("a.x2") - col("a.x1"); val d1y = col("a.y2") - col("a.y1")
    val d2x = col("b.x2") - col("b.x1"); val d2y = col("b.y2") - col("b.y1")
    val ex = col("b.x1") - col("a.x1"); val ey = col("b.y1") - col("a.y1")
    val denom = d1x * d2y - d1y * d2x
    // try_divide: parallel segments (denom 0) yield null s/u and fail
    // the range filters — ANSI-safe without a guard the optimizer
    // could reorder past
    val s = try_divide(ex * d2y - ey * d2x, denom)
    val u = try_divide(ex * d1y - ey * d1x, denom)

    joined
      .withColumn("s", s).withColumn("u", u)
      // half-open [0,1): a crossing exactly on a shared vertex of two
      // consecutive segments belongs to the later one (s=0), so it is
      // emitted once, not twice
      .filter(col("s") >= 0 && col("s") < 1 && col("u") >= 0 && col("u") < 1)
      .withColumn("xi", col("a.x1") + col("s") * d1x)
      .withColumn("yi", col("a.y1") + col("s") * d1y)
      // exactly-once: only the crossing's owner cell emits it
      .filter(floor(col("xi") / cellSize).cast("long") === col("a.cx") &&
        floor(col("yi") / cellSize).cast("long") === col("a.cy"))
      .select(
        col("a.track").as("track1"), col("b.track").as("track2"),
        col("xi").as("x"), col("yi").as("y"),
        (col("a.h1") + col("s") * (col("a.h2") - col("a.h1"))).as("h_1"),
        (col("b.h1") + col("u") * (col("b.h2") - col("b.h1"))).as("h_2"),
        (col("a.t1") + col("s") * (col("a.t2") - col("a.t1"))).as("t_1"),
        (col("b.t1") + col("u") * (col("b.t2") - col("b.t1"))).as("t_2"))
  }

  /** Crossover value deltas (atlxi_xover.py:168-173): height
    * difference, time difference, and implied dhdt rate.
    */
  def withDeltas(xo: DataFrame, secPerYear: Double = 365.25 * 86400.0): DataFrame =
    xo.withColumn("h_X", col("h_2") - col("h_1"))
      .withColumn("t_D", col("t_2") - col("t_1"))
      .withColumn("dhdt",
        when(col("t_D") =!= 0, col("h_X") / (col("t_D") / lit(secPerYear))))
}
