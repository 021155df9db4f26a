package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.SpanDedup

/** C4-style span dedup semantics on hand-built corpora where the
  * expected survivor set is computable by eye.
  */
class SpanDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def corpus(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))),
      schema)

  private def result(rows: (Long, String)*): Map[Long, (Long, String)] =
    SpanDedup(corpus(rows: _*), n = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("the first occurrence of a repeated span survives; later ones are cut") {
    val out = result(
      1L -> "a b c d e",
      2L -> "x a b c y") // "a b c" duplicates doc 1's span at pos 1
    assert(out(1L) == (5L, "a b c d e"))
    // doc 2 loses tokens 2..4 ("a b c"), keeps "x" and "y"
    assert(out(2L) == (2L, "x y"))
  }

  test("overlapping duplicate spans union their token ranges") {
    val out = result(
      1L -> "a b c d",
      2L -> "a b c d") // spans "a b c"@1 and "b c d"@2 both dup -> all 4 tokens covered
    assert(out(1L) == (4L, "a b c d"))
    assert(!out.contains(2L), "fully-covered doc must disappear")
  }

  test("intra-document repetition is also cut (second occurrence in the SAME doc)") {
    val out = result(1L -> "p q r z p q r")
    // "p q r"@1 canonical; "p q r"@5 duplicate -> tokens 5,6,7 removed
    assert(out(1L) == (4L, "p q r z"))
  }

  test("docs shorter than the span width pass through untouched") {
    val out = result(1L -> "a b", 2L -> "a b")
    assert(out(1L) == (2L, "a b"))
    assert(out(2L) == (2L, "a b"))
  }

  test("tie-break is the smallest (doc_id, pos) regardless of input partitioning") {
    val rows = Seq(
      5L -> "m n o tail5",
      3L -> "head3 m n o",
      9L -> "m n o tail9")
    // canonical "m n o" is doc 3 pos 2 (smallest doc_id)
    val out = result(rows: _*)
    assert(out(3L) == (4L, "head3 m n o"))
    assert(out(5L) == (1L, "tail5"))
    assert(out(9L) == (1L, "tail9"))
    // same answer when the input arrives in one partition, reversed
    val rev = SpanDedup(corpus(rows.reverse: _*).coalesce(1), n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rev == out)
  }
}
