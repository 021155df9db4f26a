package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{dist_to_ring, point_in_polygon}

/** Bounding region in projected coordinates — the Spark form of the
  * reference's frozen Region dataclass
  * (/root/reference/deepicedrain/spatiotemporal.py:20-155).
  */
final case class Region(
    name: String, xmin: Double, xmax: Double, ymin: Double, ymax: Double) {
  require(xmax > xmin && ymax > ymin, s"degenerate region $name")

  /** Strict bbox predicate (spatiotemporal.py:135-155 uses > and <,
    * not >=) — a pure conjunction of comparisons, so Catalyst pushes
    * it into the parquet scan and row-group min/max stats prune
    * partitions for free.
    */
  def predicate(x: Column, y: Column): Column =
    x > xmin && x < xmax && y > ymin && y < ymax

  def subset(df: DataFrame, xCol: String = "x", yCol: String = "y"): DataFrame =
    df.filter(predicate(df.col(xCol), df.col(yCol)))

  /** Canvas height preserving aspect ratio (spatiotemporal.py:125-127). */
  def height(plotWidth: Int): Int =
    math.round(plotWidth * (ymax - ymin) / (xmax - xmin)).toInt
}

/** Spatio-temporal grid/aggregation operators (SURVEY.md §2.4 A7/A8,
  * §2.7 F3). All are single hash aggregations keyed by grid cell —
  * embarrassingly partition-parallel at any scale.
  */
object SpatioTemporal {

  /** GPS epoch 2018-01-01T00:00:00Z in microseconds since Unix epoch
    * (spatiotemporal.py:158-176; ATLAS products count leap-second-free
    * nanoseconds from this origin).
    */
  val AtlasEpochUs: Long = 1514764800000000L

  /** ns-since-ATLAS-epoch -> TimestampType (µs) — keep the ns column
    * alongside for exact arithmetic (SURVEY.md §1.2). Integer `div`
    * (IntegralDivide), not `/`: double division loses exactness past
    * 2^53 ns (~104 days) — enough to flip a µs boundary at year-scale
    * ATLAS offsets.
    */
  def deltatimeToUtc(deltaNs: Column): Column =
    timestamp_micros(lit(AtlasEpochUs) +
      call_function("div", deltaNs.cast("long"), lit(1000L)))

  /** Rasterize points onto a width x height canvas over `region`,
    * mean of `z` per cell — the reference's datashader mean-reduction
    * canvas (spatiotemporal.py:109-133). Emits cell indices plus cell
    * centers so the output is a raster-as-table (SURVEY.md §1.1).
    */
  def datashade(
      df: DataFrame, region: Region,
      x: Column, y: Column, z: Column,
      plotWidth: Int = 300): DataFrame = {
    val h = region.height(plotWidth)
    val cellW = (region.xmax - region.xmin) / plotWidth
    val cellH = (region.ymax - region.ymin) / h
    val xb = floor((x - lit(region.xmin)) / lit(cellW)).cast("long")
    val yb = floor((y - lit(region.ymin)) / lit(cellH)).cast("long")
    df.filter(region.predicate(x, y))
      .groupBy(xb.as("x_bin"), yb.as("y_bin"))
      // z_sum lets integral-z callers derive an exact fixed-point mean
      // (sum-of-longs is order-independent; avg of doubles is not)
      .agg(avg(z).as("z_mean"), sum(z).as("z_sum"), count(lit(1)).as("npts"))
      .withColumn("x_center", lit(region.xmin) + (col("x_bin") + lit(0.5)) * lit(cellW))
      .withColumn("y_center", lit(region.ymin) + (col("y_bin") + lit(0.5)) * lit(cellH))
  }

  /** GMT blockmedian analogue: exact median x, y, z per spacing-sized
    * cell (spatiotemporal.py:425-430) — the decimation step before
    * surface fitting. Exact `median` (interpolating percentile), not
    * approx, to stay comparable with GMT/DuckDB.
    */
  def blockmedian(
      df: DataFrame,
      x: Column, y: Column, z: Column,
      spacing: Double): DataFrame =
    df.groupBy(
      floor(x / lit(spacing)).cast("long").as("cell_x"),
      floor(y / lit(spacing)).cast("long").as("cell_y"))
      .agg(
        median(x).as("x_med"),
        median(y).as("y_med"),
        median(z).as("z_med"),
        count(lit(1)).as("npts"))

  /** Label points with the polygon containing them — broadcast
    * nested-loop join with the codegen'd ray-casting predicate
    * (SURVEY.md §2.3 J1). `polys` must be small (basins/lakes:
    * 10^1-10^3 rows with `xs`/`ys` ring arrays); points stream
    * through without shuffling.
    */
  def pointInPolygonJoin(
      points: DataFrame, polys: DataFrame,
      x: Column, y: Column,
      joinType: String = "inner"): DataFrame = {
    // bbox conjuncts first (SURVEY.md §4): four cheap comparisons
    // short-circuit the O(ring) ray-casting for the vast majority of
    // (point x polygon) pairs in the nested-loop join
    val p = polys
      .withColumn("_bxmin", array_min(col("xs")))
      .withColumn("_bxmax", array_max(col("xs")))
      .withColumn("_bymin", array_min(col("ys")))
      .withColumn("_bymax", array_max(col("ys")))
    points.join(broadcast(p),
        x >= p("_bxmin") && x <= p("_bxmax") &&
          y >= p("_bymin") && y <= p("_bymax") &&
          point_in_polygon(p("xs"), p("ys"), x, y), joinType)
      .drop("_bxmin", "_bxmax", "_bymin", "_bymax")
  }

  /** Membership in the 5 km "donut" ring outside a polygon —
    * buffer(d) minus hull (atlxi_lake.py:251-256) without
    * materializing a buffered geometry.
    */
  def inBufferRing(xs: Column, ys: Column, x: Column, y: Column,
      distance: Double): Column =
    !point_in_polygon(xs, ys, x, y) && dist_to_ring(xs, ys, x, y) <= distance
}
