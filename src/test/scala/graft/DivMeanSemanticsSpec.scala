package graft

import org.apache.spark.sql.functions._

/** Executable form of the sign-safety argument at the shared
  * integer-cents div-mean shape (CleanupQueries p6_p8 et al.): the
  * oracle equality `sum(cents) * 100 div count(*)` == DuckDB's
  * `... * 100 // count(*)` holds for NEGATIVE sums only because both
  * engines truncate integer division toward zero (DuckDB verified
  * round 6: SELECT -7 // 2 = -3; only DOUBLE `//` floors there).
  * Spark's side of that contract is pinned here so an engine/version
  * change that flips `div` to flooring cannot silently break every
  * div-mean oracle on a future negative-sum fixture.
  */
class DivMeanSemanticsSpec extends SparkSpec {

  test("div truncates toward zero, including negative dividends") {
    val r = spark.sql(
      "SELECT -7 div 2, 7 div 2, -7 div -2, CAST(-700 AS BIGINT) div 3").head()
    assert(r.getLong(0) == -3L, "div must truncate toward zero (floor gives -4)")
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == 3L)
    assert(r.getLong(3) == -233L, "floor semantics would give -234")
  }

  test("the shared div-mean shape is sign-safe on a negative-sum group") {
    val sess = spark
    import sess.implicits._
    // cents sum to -7 over 3 rows: -700 div 3 = -233 under truncation
    // (both engines), -234 under flooring — the discriminating case
    val df = Seq(("a", -3L), ("a", -2L), ("a", -2L), ("b", 5L))
      .toDF("k", "cents")
    val got = df.groupBy(col("k"))
      .agg((expr("sum(cents) * 100 div count(1)").cast("double") / 10000.0)
        .as("avg_value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") == -233.0 / 10000.0,
      s"negative-sum div-mean flipped semantics: ${got("a")}")
    assert(got("b") == 500.0 / 10000.0)
  }
}
