package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Crossover

/** Crossover-analysis pipeline (reference atlxi_xover.py, SURVEY.md
  * §3.3) declared over deterministic synthetic tracks derived from
  * lineitem: 10 straight-line tracks with distinct slopes/intercepts,
  * so every pairwise crossing is analytic and the DuckDB oracle can
  * mirror the exact segment-intersection arithmetic.
  */
object XoverQueries extends QueryPack {

  private val SecPerYear = 365.25 * 86400.0

  private def trackPoints(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val li = Tables(s, dir, "lineitem")
    li.withColumn("track", (col("l_suppkey") % 10).cast("int"))
      .withColumn("px", (col("l_orderkey") % 9973).cast("double"))
      .groupBy(col("track"), col("px"))
      .agg(max(col("l_extendedprice")).as("h"),
        max(unix_timestamp(col("l_shipdate")).cast("double")).as("t"))
      .withColumn("y",
        ((col("track") * 7) % 13) * lit(0.3) * col("px") +
          ((col("track") * 11) % 17) * lit(200.0))
  }

  override def queries: Seq[Q] = Seq(

    // J2/J3/W3: the full crossover join — lead-segmentization, grid
    // cell equi-join, exact intersection, owner-cell exactly-once —
    // plus the h_X/t_D/dhdt deltas (F1/F2).
    Q("j2_crossover_join",
      (s, dir) => {
        val xo = Crossover.crossovers(trackPoints(s, dir),
          trackCol = "track", orderCol = "px",
          x = "px", y = "y", h = "h", t = "t",
          cellSize = 100.0, maxGap = 100.0)
        Crossover.withDeltas(xo, SecPerYear)
          .select(col("track1"), col("track2"),
            round(col("x"), 6).as("x"), round(col("y"), 6).as("y"),
            round(col("h_1"), 4).as("h_1"), round(col("h_2"), 4).as("h_2"),
            round(col("h_X"), 4).as("h_x"),
            round(col("dhdt"), 6).as("dhdt"))
      },
      Some(s"""
        WITH pts AS (
          SELECT CAST(l_suppkey % 10 AS INTEGER) AS track,
                 CAST(l_orderkey % 9973 AS DOUBLE) AS px,
                 max(l_extendedprice) AS h,
                 max(CAST(epoch(l_shipdate) AS DOUBLE)) AS t
          FROM lineitem GROUP BY 1, 2),
        p2 AS (
          SELECT track, px, h, t,
                 ((track * 7) % 13) * 0.3 * px + ((track * 11) % 17) * 200.0 AS y
          FROM pts),
        seg AS (
          SELECT track, px AS x1, y AS y1, h AS h1, t AS t1,
                 lead(px) OVER w AS x2, lead(y) OVER w AS y2,
                 lead(h) OVER w AS h2, lead(t) OVER w AS t2
          FROM p2 WINDOW w AS (PARTITION BY track ORDER BY px)),
        seg2 AS (
          SELECT * FROM seg
          WHERE x2 IS NOT NULL
            AND (x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1) <= 10000.0
            AND NOT (x1 = x2 AND y1 = y2)),
        segc AS (
          SELECT s.*, u1.cx AS cx, u2.cy AS cy
          FROM seg2 s,
               LATERAL unnest(generate_series(
                 CAST(floor(least(s.x1, s.x2) / 100.0) AS BIGINT),
                 CAST(floor(greatest(s.x1, s.x2) / 100.0) AS BIGINT))) u1(cx),
               LATERAL unnest(generate_series(
                 CAST(floor(least(s.y1, s.y2) / 100.0) AS BIGINT),
                 CAST(floor(greatest(s.y1, s.y2) / 100.0) AS BIGINT))) u2(cy)),
        joined AS (
          SELECT a.track AS tr1, b.track AS tr2, a.cx AS cx, a.cy AS cy,
                 a.x1 AS ax1, a.y1 AS ay1, a.x2 AS ax2, a.y2 AS ay2,
                 a.h1 AS ah1, a.h2 AS ah2, a.t1 AS at1, a.t2 AS at2,
                 b.x1 AS bx1, b.y1 AS by1, b.x2 AS bx2, b.y2 AS by2,
                 b.h1 AS bh1, b.h2 AS bh2, b.t1 AS bt1, b.t2 AS bt2
          FROM segc a JOIN segc b
            ON a.cx = b.cx AND a.cy = b.cy AND a.track < b.track),
        calc AS (
          SELECT *,
                 (ax2 - ax1) AS d1x, (ay2 - ay1) AS d1y,
                 (bx2 - bx1) AS d2x, (by2 - by1) AS d2y,
                 (bx1 - ax1) AS ex, (by1 - ay1) AS ey
          FROM joined),
        calc2 AS (
          SELECT *, d1x * d2y - d1y * d2x AS denom FROM calc
          WHERE d1x * d2y - d1y * d2x <> 0),
        calc3 AS (
          SELECT *, (ex * d2y - ey * d2x) / denom AS s,
                    (ex * d1y - ey * d1x) / denom AS u
          FROM calc2),
        hits AS (
          SELECT *, ax1 + s * d1x AS xi, ay1 + s * d1y AS yi
          FROM calc3
          WHERE s >= 0 AND s < 1 AND u >= 0 AND u < 1),
        owned AS (
          SELECT * FROM hits
          WHERE CAST(floor(xi / 100.0) AS BIGINT) = cx
            AND CAST(floor(yi / 100.0) AS BIGINT) = cy),
        vals AS (
          SELECT tr1, tr2, xi, yi,
                 ah1 + s * (ah2 - ah1) AS h_1v,
                 bh1 + u * (bh2 - bh1) AS h_2v,
                 at1 + s * (at2 - at1) AS t_1v,
                 bt1 + u * (bt2 - bt1) AS t_2v
          FROM owned)
        SELECT tr1 AS track1, tr2 AS track2,
               round(xi, 6) AS x, round(yi, 6) AS y,
               round(h_1v, 4) AS h_1, round(h_2v, 4) AS h_2,
               round(h_2v - h_1v, 4) AS h_x,
               round(CASE WHEN t_2v - t_1v <> 0
                 THEN (h_2v - h_1v) / ((t_2v - t_1v) / $SecPerYear) END, 6) AS dhdt
        FROM vals
      """.trim))
  )
}
