package graft.queries

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.Tables

/** Source/sink surface (SURVEY.md §2.1 S1/S4/S8/S11, §2.7 F8): each
  * declared as a write -> read-back round-trip whose oracle
  * reconstructs the expected table analytically, so either side of
  * the round-trip breaking fails the hash.
  */
object SourceSinkQueries extends QueryPack {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_$name"

  override def queries: Seq[Q] = Seq(

    // S1 multi-file scan + F8 filename-pattern extraction: write one
    // parquet directory per region key, scan them with a glob, and
    // recover the key from input_file_name() — the reference's
    // ATL11_xxxx_.zarr -> referencegroundtrack preprocessing
    // (atlxi_dhdt.py:64-70).
    Q("s1_multifile_filename",
      (s, dir) => {
        val base = tmp("multifile")
        val n = Tables(s, dir, "nation")
        for (rk <- 0 until 5) {
          n.filter(col("n_regionkey") === rk)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$base/region_$rk.parquet")
        }
        s.read.parquet(s"$base/region_*.parquet")
          .withColumn("region_from_file",
            regexp_extract(input_file_name(), "region_(\\d+)\\.parquet", 1).cast("int"))
          .select(col("n_nationkey"), col("n_name"), col("region_from_file"))
      },
      Some("""
        SELECT n_nationkey, n_name, n_regionkey AS region_from_file
        FROM nation
      """.trim)),

    // S4+S8 sink round-trips: aggregate -> TSV (tab-separated, the
    // reference's volume time-series sink, lake_algorithms.py:208-225)
    // -> read back with an explicit schema.
    Q("s8_tsv_roundtrip",
      (s, dir) => {
        val base = tmp("tsv_sink")
        val agg = Tables(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            (expr("sum(cast(round(value * 100) as bigint)) * 100 div count(1)")
              .cast("double") / 10000.0).as("avg_value"))
        agg.coalesce(1).write.mode("overwrite")
          .option("sep", "\t").option("header", "true")
          .csv(base)
        s.read.option("sep", "\t").option("header", "true")
          .schema("event_type STRING, n BIGINT, avg_value DOUBLE")
          .csv(base)
      },
      Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) * 100
                    // count(*) AS DOUBLE) / 10000.0 AS avg_value
        FROM events
        GROUP BY event_type
      """.trim)),

    // S11 REST-style JSON source: a records payload with a nested
    // array (the OpenAltimetry shape, atl06_play.py:498-531) written
    // driver-side, read with spark.read.json, exploded and normalized.
    Q("s11_json_records",
      (s, dir) => {
        val regions = Tables(s, dir, "region").collect()
          .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
        val payload = regions.map { case (k, name) =>
          val series = (1 to 3).map(i => s"""{"t":$i,"v":${k * 10 + i}}""").mkString(",")
          s"""{"region":$k,"name":"$name","data":[$series]}"""
        }.mkString("\n")
        val path = tmp("json_records") + ".json"
        Files.write(Paths.get(path), payload.getBytes(StandardCharsets.UTF_8))
        s.read.json(path)
          .select(col("region"), col("name"), explode(col("data")).as("d"))
          .select(col("region"), col("name"), col("d.t").as("t"), col("d.v").as("v"))
      },
      Some("""
        SELECT r.r_regionkey AS region, r.r_name AS name, u.i AS t,
               r.r_regionkey * 10 + u.i AS v
        FROM region r, LATERAL unnest(generate_series(1, 3)) u(i)
      """.trim))
  )
}
