package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distinct-count sketching. The engine's sketch family member is KMV
  * (k minimum values) rather than HyperLogLog for one reason: KMV is
  * DETERMINISTIC given the hash function, so the sketch state and the
  * estimate are oracle-exact cross-engine — the same gate every other
  * operator passes — while HLL++'s register layout is
  * implementation-defined. Accuracy is comparable at equal state
  * (relative std error ~ 1/sqrt(k-2)).
  *
  * Scale shape: the state is the k smallest 52-bit hashes of the
  * DISTINCT values. The plan is a map-side-combined distinct on the
  * hash followed by a distributed top-k (per-partition k-min heaps,
  * O(k) merged at the driver) — exactly the mergeable-union shape a
  * 1000-executor partial aggregation needs, and the union of two KMV
  * sketches is re-top-k of their concatenation, so per-partition /
  * per-day sketches compose.
  *
  * Estimate: with u_(k) the k-th smallest of n distinct uniform
  * 52-bit hashes, E[u_(k)/2^52] = k/(n+1), so n ≈ (k-1)*2^52/u_(k)
  * (the unbiased form). The division is INTEGER (div / //): floor of
  * an exact integer ratio is bit-identical cross-engine, where a
  * double round-trip of (k-1)*2^52 > 2^53 would not be. When fewer
  * than k distinct values exist the sketch IS the exact set and the
  * exact count is returned.
  */
object Sketches {

  private val Pow52 = 4503599627370496L // 2^52

  /** One-row sketch summary: (k_actual, kth_min_u, est_distinct,
    * exact_distinct). `exact_distinct` is the true distinct count —
    * kept alongside so accuracy is an oracle-gated number, not a
    * claim (the spec asserts the relative error bound).
    */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k >= 2 required, got $k")
    val u = expr(s"cast(conv(substring(md5(concat(cast(`$valueCol` as string), " +
      s"'#kmv')), 1, 13), 16, 10) as long)")
    val topk = df.select(u.as("u")).distinct()
      .orderBy(col("u").asc).limit(k)
    val sketch = topk.agg(
      count(lit(1)).as("k_actual"),
      max(col("u")).as("kth_min_u"))
    val exact = df.agg(countDistinct(col(valueCol)).as("exact_distinct"))
    sketch.crossJoin(exact)
      .select(
        col("k_actual"),
        col("kth_min_u"),
        when(col("k_actual") < k, col("k_actual"))
          .otherwise(expr(s"${(k - 1).toLong * Pow52}L div kth_min_u"))
          .as("est_distinct"),
        col("exact_distinct"))
  }

  /** DuckDB oracle replaying [[kmvDistinct]] verbatim. */
  def kmvOracleSql(table: String, valueCol: String, k: Int): String =
    s"""WITH h AS (
       |  SELECT DISTINCT CAST(concat('0x', substring(md5(concat(
       |    CAST($valueCol AS VARCHAR), '#kmv')), 1, 13)) AS BIGINT) AS u
       |  FROM $table),
       |t AS (SELECT u FROM h ORDER BY u ASC LIMIT $k),
       |s AS (SELECT count(*) AS k_actual, max(u) AS kth_min_u FROM t),
       |x AS (SELECT count(DISTINCT $valueCol) AS exact_distinct FROM $table)
       |SELECT s.k_actual, s.kth_min_u,
       |       CASE WHEN s.k_actual < $k THEN s.k_actual
       |            ELSE ${(k - 1).toLong * Pow52} // s.kth_min_u END
       |         AS est_distinct,
       |       x.exact_distinct
       |FROM s, x""".stripMargin
}
