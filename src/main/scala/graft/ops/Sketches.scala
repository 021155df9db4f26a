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
    // null inputs are excluded, not counted: Spark sorts nulls FIRST
    // under asc while DuckDB sorts them LAST, so an unfiltered null
    // would silently occupy a sketch slot in one engine only
    val topk = df.select(u.as("u")).filter(col("u").isNotNull).distinct()
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

  /** KMV summary row emitted by [[KmvAgg]]. */
  final case class KmvSummary(k_actual: Long, kth_min_u: Long, est_distinct: Long)

  /** Typed Aggregator form of the KMV sketch — the shape a WINDOWED
    * (including Structured Streaming) distinct-count estimate needs:
    * per-group state is the sorted array of the <= k smallest distinct
    * hashes, reduce is a dedup-insert, merge is the sketch UNION
    * (merge-sort + trim) — associative, commutative, duplicate-
    * tolerant, so micro-batch boundaries and shuffle merge order
    * cannot perturb the result. O(k) state per group, evicted with the
    * window by the watermark.
    */
  final class KmvAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], KmvSummary] {
    require(k >= 2)

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(state: Array[Long], u: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(state, u)
      if (pos >= 0) state // already present
      else {
        val ins = -pos - 1
        if (ins >= k) state // larger than the current k-th minimum
        else {
          val n = math.min(state.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(state, 0, out, 0, ins)
          out(ins) = u
          System.arraycopy(state, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // merge two sorted distinct arrays, keep the k smallest
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) a(i) else b(j)
        if (takeA) i += 1 else j += 1
        if (o == 0 || out(o - 1) != v) { // drop cross-array dups
          out(o) = v
          o += 1
        }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(state: Array[Long]): KmvSummary = {
      val n = state.length
      if (n == 0) KmvSummary(0L, 0L, 0L)
      else if (n < k) KmvSummary(n, state(n - 1), n)
      else KmvSummary(n, state(n - 1), (k - 1).toLong * Pow52 / state(n - 1))
    }

    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

    override def outputEncoder: org.apache.spark.sql.Encoder[KmvSummary] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KmvSummary]()
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
