package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.GeoJson

/** GeoJSON source + sink declared as an oracle-checked round-trip
  * (SURVEY.md §2.1 S6/S7): diamond polygons constructed from the
  * nation table, written as a FeatureCollection, read back, exploded
  * to vertices — the oracle reconstructs the vertex table analytically
  * from nation, so any write- or read-side corruption breaks the hash.
  */
object GeoJsonQueries extends QueryPack {

  override def queries: Seq[Q] = Seq(

    Q("s6_s7_geojson_roundtrip",
      (s, dir) => {
        val n = Tables(s, dir, "nation")
          .withColumn("cx", (col("n_nationkey") * 1000).cast("double"))
          .withColumn("cy", (col("n_regionkey") * 500).cast("double"))
          .withColumn("r", (col("n_nationkey") + lit(100)).cast("double"))
        val polys = n.select(
          col("n_name").as("name"),
          array(col("cx") - col("r"), col("cx"), col("cx") + col("r"), col("cx")).as("xs"),
          array(col("cy"), col("cy") - col("r"), col("cy"), col("cy") + col("r")).as("ys"))
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_geojson_roundtrip.json"
        GeoJson.writePolygons(polys, path)
        GeoJson.readPolygons(s, path)
          .select(col("name"), posexplode(zip_with(col("xs"), col("ys"),
            (x, y) => struct(x.as("x"), y.as("y")))).as(Seq("idx", "p")))
          .select(col("name"), (col("idx") + 1).as("vertex"),
            col("p.x").as("x"), col("p.y").as("y"))
      },
      Some("""
        WITH n AS (
          SELECT n_name AS name,
                 CAST(n_nationkey * 1000 AS DOUBLE) AS cx,
                 CAST(n_regionkey * 500 AS DOUBLE) AS cy,
                 CAST(n_nationkey + 100 AS DOUBLE) AS r
          FROM nation)
        SELECT name, 1 AS vertex, cx - r AS x, cy AS y FROM n
        UNION ALL SELECT name, 2, cx, cy - r FROM n
        UNION ALL SELECT name, 3, cx + r, cy FROM n
        UNION ALL SELECT name, 4, cx, cy + r FROM n
      """.trim))
  )
}
