package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a
  * named query over the driver's test tables; `oracleSql` carries the
  * DuckDB-equivalent SQL for the hash-match correctness gate.
  */
object SparkEntry {

  /** All capability packs, in SURVEY.md §7 build order. */
  def packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    DeltaMathQueries,
    SpatioTemporalQueries,
    WindowQueries,
    CleanupQueries,
    DhdtQueries,
    LlmQueries,
    XoverQueries,
    JoinQueries,
    LakeQueries,
    GeoJsonQueries,
    MediaQueries,
    SourceSinkQueries,
    MiscQueries,
    StreamingQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The composed dhdt chain is the reference's flagship
    * pipeline (SURVEY.md §3.1) fused into one shuffle.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_dhdt_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. A duplicate
    * name across packs would silently shadow an implementation in
    * toMap (last pack wins) — rejected loudly instead.
    */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val pairs = packs.flatMap(_.queries).map(q => q.name -> q.run)
    val dups = pairs.groupBy(_._1).filter(_._2.sizeIs > 1).keys
    require(dups.isEmpty, s"duplicate query names across packs: ${dups.mkString(", ")}")
    pairs.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  lazy val oracleSql: Map[String, String] =
    packs.flatMap(_.queries).flatMap(q => q.oracle.map(q.name -> _)).toMap
}
