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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
