package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{ConvexHull, Dbscan}

/** Lake-finder operator family (reference atlxi_lake.py, SURVEY.md
  * §2.9 M1, §2.4 A13): distributed DBSCAN and the convex-hull
  * aggregate, declared over deterministic blob geometry derived from
  * lineitem — 5 dense separated blobs plus isolated noise points, so
  * the expected clustering is analytic and DuckDB can oracle the
  * (cluster, size) output structurally.
  */
object LakeQueries extends QueryPack {

  /** 5 blobs at separated centers + isolated noise; integer coords,
    * one point per distinct (px, py), id = px*10000000 + py.
    */
  private def blobPoints(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val li = Tables(s, dir, "lineitem")
    li.withColumn("is_noise", col("l_orderkey") % 101 === 0)
      .withColumn("px",
        when(col("is_noise"), lit(10000000L) + col("l_orderkey") * 1000L)
          .otherwise((col("l_suppkey") % 5) * 50000L + col("l_orderkey") % 997))
      .withColumn("py",
        when(col("is_noise"), lit(0L))
          .otherwise((col("l_suppkey") % 5) * 20000L + col("l_partkey") % 997))
      .select(col("px"), col("py")).distinct()
      .withColumn("id", col("px") * 10000000L + col("py"))
      .withColumn("x", col("px").cast("double"))
      .withColumn("y", col("py").cast("double"))
  }

  override def queries: Seq[Q] = Seq(

    // M1 distributed DBSCAN: 5 separated dense blobs must come out as
    // exactly 5 clusters labeled by their min point id (deterministic),
    // isolated points as noise. The oracle reconstructs the expected
    // (cluster, n) table from the blob construction itself.
    Q("m1_dbscan",
      (s, dir) => {
        val pts = blobPoints(s, dir)
        Dbscan.dbscan(pts, "id", Seq("x", "y"), eps = 100.0, minPts = 5)
          .filter(col("cluster").isNotNull)
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""
        WITH pts AS (
          SELECT DISTINCT
            CASE WHEN l_orderkey % 101 = 0
              THEN 10000000 + l_orderkey * 1000
              ELSE (l_suppkey % 5) * 50000 + l_orderkey % 997 END AS px,
            CASE WHEN l_orderkey % 101 = 0
              THEN 0
              ELSE (l_suppkey % 5) * 20000 + l_partkey % 997 END AS py,
            (l_orderkey % 101 = 0) AS is_noise,
            CASE WHEN l_orderkey % 101 = 0 THEN -1
                 ELSE CAST(l_suppkey % 5 AS INTEGER) END AS blob
          FROM lineitem)
        SELECT min(px * 10000000 + py) AS cluster, count(*) AS n
        FROM pts
        WHERE NOT is_noise
        GROUP BY blob
      """.trim)),

    // A13 convex hull per cluster (memory-bounded pruning Aggregator):
    // hull vertex count + bbox per blob. Not SQL-expressible as a
    // hull; the bbox corners of each blob's hull ARE its coordinate
    // extremes, which DuckDB can check structurally.
    Q("a13_convex_hull",
      (s, dir) => {
        val pts = blobPoints(s, dir)
          .filter(col("px") < lit(10000000L))
          .withColumn("blob", (col("px") / 50000L).cast("int"))
        pts.groupBy(col("blob"))
          .agg(ConvexHull.convex_hull(col("x"), col("y")).as("hull"))
          .select(col("blob"),
            size(col("hull")).as("n_vertices"),
            aggregate(transform(col("hull"), p => p.getField("x")),
              lit(Double.MaxValue), (a, v) => least(a, v)).as("xmin"),
            aggregate(transform(col("hull"), p => p.getField("x")),
              lit(Double.MinValue), (a, v) => greatest(a, v)).as("xmax"),
            aggregate(transform(col("hull"), p => p.getField("y")),
              lit(Double.MaxValue), (a, v) => least(a, v)).as("ymin"),
            aggregate(transform(col("hull"), p => p.getField("y")),
              lit(Double.MinValue), (a, v) => greatest(a, v)).as("ymax"))
          .drop("n_vertices")
      },
      Some("""
        WITH pts AS (
          SELECT DISTINCT
            (l_suppkey % 5) * 50000 + l_orderkey % 997 AS px,
            (l_suppkey % 5) * 20000 + l_partkey % 997 AS py,
            CAST(l_suppkey % 5 AS INTEGER) AS blob
          FROM lineitem
          WHERE l_orderkey % 101 <> 0)
        SELECT blob,
               CAST(min(px) AS DOUBLE) AS xmin, CAST(max(px) AS DOUBLE) AS xmax,
               CAST(min(py) AS DOUBLE) AS ymin, CAST(max(py) AS DOUBLE) AS ymax
        FROM pts
        GROUP BY blob
      """.trim))
  )
}
