package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table registry over the driver-generated parquet directory.
  *
  * Mirrors the reference's intake catalog idea (named parameterized
  * sources, /root/reference/deepicedrain/atlas_catalog.yaml:4-326) as a
  * plain function: the catalog's `placename`/`cycle` template params
  * become the `dir` argument here. Schemas come from the parquet
  * footers (they are stable, driver-generated); core engine tables
  * (ATL11-style point clouds) use explicit StructTypes in their
  * readers instead (SURVEY.md §1.3).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    // default; read it as LongType nanoseconds instead. This matches
    // the engine's ns-precision discipline (SURVEY.md §1.2): keep the
    // raw ns column for arithmetic, derive a µs TimestampType view
    // only for display/windowing (see [[eventsWithTime]]). Scoped to
    // the one nanos table so other readers keep default behavior.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events` with a µs `ts_utc` TimestampType derived from the ns
    * `ts` column (floor µs, matching DuckDB's CAST(ts AS TIMESTAMP)).
    */
  def eventsWithTime(spark: SparkSession, dir: String): DataFrame = {
    val df = apply(spark, dir, "events")
    df.withColumn("ts_utc",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
