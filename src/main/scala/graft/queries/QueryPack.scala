package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a named DataFrame program over the
  * test tables plus (when SQL-expressible) an equivalent DuckDB oracle
  * query. Queries with `oracle = None` get a weaker rows-only check
  * from the driver; keep those to genuinely non-SQL ops (DBSCAN,
  * MinHash-LSH, convex hull, ...).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryPack {
  def queries: Seq[Q]
}
