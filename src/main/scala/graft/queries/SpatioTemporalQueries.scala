package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Region, SpatioTemporal}
import graft.functions.{point_in_polygon, ps3031_lat, ps3031_lon, ps3031_x, ps3031_y}

/** Spatio-temporal operator family declared over the driver's test
  * tables (SURVEY.md §2.2 P3/P14, §2.3 J1, §2.4 A7/A8, §2.7 F3/F6).
  * lineitem numeric columns play the role of projected coordinates;
  * events.ts (ns) plays the ATLAS delta_time.
  */
object SpatioTemporalQueries extends QueryPack {

  // Points on a deterministic 2-D scatter derived from lineitem:
  // fmod of identical doubles is bit-identical in Spark and DuckDB.
  private val PX = "l_extendedprice % 97"
  private val PY = "l_extendedprice % 89"

  override def queries: Seq[Q] = Seq(

    // P3 Region.subset — strict bbox; pure comparison conjunction so
    // Catalyst pushes it into the parquet scan (row-group pruning).
    Q("p3_region_subset",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val region = Region("test", 20000.0, 30000.0, 10.0, 40.0)
        region.subset(li, "l_extendedprice", "l_quantity")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"), col("l_quantity"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        FROM lineitem
        WHERE l_extendedprice > 20000 AND l_extendedprice < 30000
          AND l_quantity > 10 AND l_quantity < 40
      """.trim)),

    // A7 datashade: fixed-canvas mean-reduction rasterization.
    Q("a7_datashade",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .withColumn("px", col("l_partkey") % 100)
          .withColumn("py", col("l_suppkey") % 100)
          // rasterize exact integer cents: the cell mean then derives
          // from z_sum by integer floor-division (round(avg(double),4)
          // can land on a 4dp half where the engines' roundings split)
          .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
        val region = Region("canvas", 0.0, 100.0, 0.0, 100.0)
        SpatioTemporal.datashade(li, region,
            col("px").cast("double"), col("py").cast("double"),
            col("cents"), plotWidth = 25)
          .select(col("x_bin"), col("y_bin"),
            (expr("z_sum * 100 div npts").cast("double") / 10000.0).as("z_mean"),
            col("npts"),
            col("x_center"), col("y_center"))
      },
      Some("""
        SELECT CAST(floor((l_partkey % 100) / 4.0) AS BIGINT) AS x_bin,
               CAST(floor((l_suppkey % 100) / 4.0) AS BIGINT) AS y_bin,
               CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                    * 100 // count(*) AS DOUBLE) / 10000.0 AS z_mean,
               count(*) AS npts,
               0.0 + (CAST(floor((l_partkey % 100) / 4.0) AS BIGINT) + 0.5) * 4.0 AS x_center,
               0.0 + (CAST(floor((l_suppkey % 100) / 4.0) AS BIGINT) + 0.5) * 4.0 AS y_center
        FROM lineitem
        WHERE (l_partkey % 100) > 0 AND (l_partkey % 100) < 100
          AND (l_suppkey % 100) > 0 AND (l_suppkey % 100) < 100
        GROUP BY 1, 2
      """.trim)),

    // A8 blockmedian: exact interpolating median x,y,z per cell.
    Q("a8_blockmedian",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        SpatioTemporal.blockmedian(li,
            col("l_extendedprice"), col("l_quantity") * lit(1000.0),
            col("l_discount"), spacing = 10000.0)
          .select(col("cell_x"), col("cell_y"),
            round(col("x_med"), 4).as("x_med"),
            round(col("y_med"), 4).as("y_med"),
            round(col("z_med"), 4).as("z_med"),
            col("npts"))
      },
      Some("""
        SELECT CAST(floor(l_extendedprice / 10000.0) AS BIGINT) AS cell_x,
               CAST(floor(l_quantity * 1000.0 / 10000.0) AS BIGINT) AS cell_y,
               round(median(l_extendedprice), 4) AS x_med,
               round(median(l_quantity * 1000.0), 4) AS y_med,
               round(median(l_discount), 4) AS z_med,
               count(*) AS npts
        FROM lineitem
        GROUP BY 1, 2
      """.trim)),

    // F3 ATLAS epoch shift: ns-since-epoch -> µs timestamp via exact
    // integer division (spatiotemporal.py:158-176).
    Q("f3_epoch_shift",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        ev.select(col("event_id"),
          SpatioTemporal.deltatimeToUtc(col("ts")).as("utc_time"))
      },
      Some("""
        SELECT event_id,
               make_timestamp(1514764800000000 + epoch_ns(ts) // 1000) AS utc_time
        FROM events
      """.trim)),

    // J1/P14 point-in-polygon broadcast join: codegen'd ray-casting
    // predicate against two small diamond polygons (L1-balls, so the
    // oracle can restate membership as |x-cx|+|y-cy| < r; radii are
    // 4-decimal so 2-decimal points can never land on the boundary).
    Q("j1_point_in_polygon",
      (s, dir) => {
        val sess = s
        import sess.implicits._
        val polys = Seq(
          (1, Seq(18.5049, 48.505, 78.5051, 48.505), Seq(44.505, 14.5049, 44.505, 74.5051)),
          (2, Seq(-14.7496, 10.2505, 35.2506, 10.2505), Seq(80.7505, 55.7504, 80.7505, 105.7506))
        ).toDF("poly_id", "xs", "ys")
        val pts = Tables(s, dir, "lineitem")
          .withColumn("px", expr(PX)).withColumn("py", expr(PY))
        SpatioTemporal.pointInPolygonJoin(pts, polys, col("px"), col("py"))
          .select(col("l_orderkey"), col("l_linenumber"), col("poly_id"))
      },
      Some(s"""
        SELECT l_orderkey, l_linenumber, p.poly_id
        FROM lineitem,
             (VALUES (1, 48.505, 44.505, 30.0001),
                     (2, 10.2505, 80.7505, 25.0001)) p(poly_id, cx, cy, r)
        WHERE abs($PX - cx) + abs($PY - cy) < r
      """.trim)),

    // F6 EPSG:3031 forward + inverse round-trip, oracle-checked: the
    // EPSG method 9829 forward (Geo.ps3031X/Y) is plain trig, so the
    // DuckDB oracle re-derives it from the same embedded constants
    // (E/K0/PowE printed to full double precision); the inverse
    // fixed-point iteration is unrolled 8x in chained CTEs exactly as
    // Geo.ps3031Lat iterates. Both sides reduce to integer moments
    // (whole metres; 1e-4 deg) so last-ulp libm differences between
    // JVM Math and DuckDB can't flip the hash. Full-precision golden
    // values stay proven in GeoSpec (reference:
    // deepicedrain/tests/test_spatiotemporal_conversions.py:90-120).
    Q("f6_polar_stereo",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .withColumn("lon", col("l_extendedprice") % lit(360.0) - lit(180.0))
          .withColumn("lat", lit(-60.0) - col("l_quantity") % lit(29.0))
        li.select(col("l_orderkey"), col("l_linenumber"),
            ps3031_x(col("lon"), col("lat")).as("x3031"),
            ps3031_y(col("lon"), col("lat")).as("y3031"))
          .withColumn("lon_rt", ps3031_lon(col("x3031"), col("y3031")))
          .withColumn("lat_rt", ps3031_lat(col("x3031"), col("y3031")))
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("x3031")).cast("long").as("x_m"),
            round(col("y3031")).cast("long").as("y_m"),
            round(col("lon_rt") * lit(1e4)).cast("long").as("lon_rt_e4"),
            round(col("lat_rt") * lit(1e4)).cast("long").as("lat_rt_e4"))
      },
      Some("""
        WITH pt AS (
          SELECT l_orderkey, l_linenumber,
                 l_extendedprice % 360.0 - 180.0 AS lon,
                 -60.0 - l_quantity % 29.0 AS lat,
                 0.081819190842621486 AS e,
                 1.0033565552493156 AS pe,
                 0.97276901289179718 AS k0,
                 6378137.0 AS a
          FROM lineitem),
        fwd AS (
          SELECT *,
                 2*a*k0 * (tan(pi()/4 + radians(lat)/2)
                   / pow((1 + e*sin(radians(lat))) / (1 - e*sin(radians(lat))), e/2)) / pe
                   AS rho
          FROM pt),
        xy AS (
          SELECT *, rho*sin(radians(lon)) AS x, rho*cos(radians(lon)) AS y FROM fwd),
        inv0 AS (
          SELECT *, sqrt(x*x + y*y)*pe/(2*a*k0) AS t,
                 2*atan(sqrt(x*x + y*y)*pe/(2*a*k0)) - pi()/2 AS phi
          FROM xy),
        inv1 AS (SELECT * REPLACE (2*atan(t*pow((1+e*sin(phi))/(1-e*sin(phi)), e/2)) - pi()/2 AS phi) FROM inv0),
        inv2 AS (SELECT * REPLACE (2*atan(t*pow((1+e*sin(phi))/(1-e*sin(phi)), e/2)) - pi()/2 AS phi) FROM inv1),
        inv3 AS (SELECT * REPLACE (2*atan(t*pow((1+e*sin(phi))/(1-e*sin(phi)), e/2)) - pi()/2 AS phi) FROM inv2),
        inv4 AS (SELECT * REPLACE (2*atan(t*pow((1+e*sin(phi))/(1-e*sin(phi)), e/2)) - pi()/2 AS phi) FROM inv3),
        inv5 AS (SELECT * REPLACE (2*atan(t*pow((1+e*sin(phi))/(1-e*sin(phi)), e/2)) - pi()/2 AS phi) FROM inv4),
        inv6 AS (SELECT * REPLACE (2*atan(t*pow((1+e*sin(phi))/(1-e*sin(phi)), e/2)) - pi()/2 AS phi) FROM inv5),
        inv7 AS (SELECT * REPLACE (2*atan(t*pow((1+e*sin(phi))/(1-e*sin(phi)), e/2)) - pi()/2 AS phi) FROM inv6),
        inv8 AS (SELECT * REPLACE (2*atan(t*pow((1+e*sin(phi))/(1-e*sin(phi)), e/2)) - pi()/2 AS phi) FROM inv7)
        SELECT l_orderkey, l_linenumber,
               CAST(round(x) AS BIGINT) AS x_m,
               CAST(round(y) AS BIGINT) AS y_m,
               CAST(round(degrees(atan2(x, y)) * 1e4) AS BIGINT) AS lon_rt_e4,
               CAST(round(degrees(phi) * 1e4) AS BIGINT) AS lat_rt_e4
        FROM inv8
      """.trim)),

    // Z-order (Morton) spatial layout key (functions/Geo.scala
    // ZOrderKey, a codegen'd 5-round magic-number interleave): the
    // write-layout primitive that makes bbox scans cheap at 100 TB —
    // sort/range-partition a write by zkey and spatially adjacent
    // points land in the same files, so parquet min/max stats on the
    // RAW x/y columns prune range queries (ZOrderSpec measures the
    // row-group locality win). The query tiles the lineitem scatter
    // into zkey>>8 buckets (16x16-cell tiles) and hash-gates the
    // exact interleaved keys via per-tile min/max; the oracle replays
    // the bit-spread rounds with BIGINT bit ops.
    Q("geo_zorder_tiles",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val zk = graft.functions.zorder_key(
          floor(col("l_extendedprice") / 250), floor(col("l_quantity")))
        li.select(
            floor(col("l_extendedprice") / 250).cast("long").as("xc"),
            floor(col("l_quantity")).cast("long").as("yc"),
            zk.as("zkey"))
          .groupBy(shiftright(col("zkey"), 8).as("tile"))
          .agg(count(lit(1)).as("n"),
            min(col("zkey")).as("min_zkey"), max(col("zkey")).as("max_zkey"),
            min(col("xc")).as("min_xc"), max(col("xc")).as("max_xc"),
            min(col("yc")).as("min_yc"), max(col("yc")).as("max_yc"))
      },
      Some("""
        WITH g AS (
          SELECT CAST(floor(l_extendedprice / 250) AS BIGINT) AS xc,
                 CAST(floor(l_quantity) AS BIGINT) AS yc
          FROM lineitem),
        z AS (
          SELECT xc, yc,
            (xc & 4294967295) AS x0,
            ((x0 | (x0 << 16)) & 281470681808895) AS x1,
            ((x1 | (x1 << 8)) & 71777214294589695) AS x2,
            ((x2 | (x2 << 4)) & 1085102592571150095) AS x3,
            ((x3 | (x3 << 2)) & 3689348814741910323) AS x4,
            ((x4 | (x4 << 1)) & 6148914691236517205) AS x5,
            (yc & 4294967295) AS y0,
            ((y0 | (y0 << 16)) & 281470681808895) AS y1,
            ((y1 | (y1 << 8)) & 71777214294589695) AS y2,
            ((y2 | (y2 << 4)) & 1085102592571150095) AS y3,
            ((y3 | (y3 << 2)) & 3689348814741910323) AS y4,
            ((y4 | (y4 << 1)) & 6148914691236517205) AS y5,
            (x5 | (y5 << 1)) AS zkey
          FROM g)
        SELECT zkey >> 8 AS tile,
               count(*) AS n,
               min(zkey) AS min_zkey, max(zkey) AS max_zkey,
               min(xc) AS min_xc, max(xc) AS max_xc,
               min(yc) AS min_yc, max(yc) AS max_yc
        FROM z GROUP BY 1
      """.trim))
  )

  /** Diamond polygon helper kept for tests: ring of the L1-ball. */
  private[graft] def diamond(cx: Double, cy: Double, r: Double): (Seq[Double], Seq[Double]) =
    (Seq(cx - r, cx, cx + r, cx), Seq(cy, cy - r, cy, cy + r))
}
