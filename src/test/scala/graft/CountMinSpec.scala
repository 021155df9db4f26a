package graft

import org.apache.spark.sql.functions._

import graft.ops.CountMin

/** Count-Min sketch contracts: (1) the over-estimate theorem
  * est >= exact holds for every probe (a counter only ever gains
  * collision mass); (2) the sketch STATE is invariant to physical
  * partitioning — every counter is a pure sum, so unlike Misra-Gries
  * the internal state itself hash-matches across merge trees; (3) a
  * deliberately tiny width forces collisions and the estimate
  * strictly over-counts, proving the probe actually reads shared
  * counters rather than exact counts; (4) at generous width the
  * estimates are exact for the heavy probes (collision mass from a
  * small vocabulary is zero); (5) the HLL gate used by
  * llm_hll_distinct holds with margin at the test fixtures.
  */
class CountMinSpec extends SparkSpec {

  private def toks(dir: String) =
    Tables(spark, dir, "documents")
      .select(explode(graft.ops.Text.tokens(col("text"))).as("term"))

  test("over-estimate theorem: est >= exact for every probe at sf0.001") {
    val r = CountMin.topKWithEstimates(toks(sf001), "term",
      d = 4, w = 1024, k = 20).collect()
    assert(r.length == 20)
    r.foreach { row =>
      assert(row.getAs[Long]("cms_est") >= row.getAs[Long]("n_exact"),
        s"CMS under-counted ${row.getAs[String]("term")}")
      assert(row.getAs[Boolean]("ok_lower"))
    }
  }

  test("sketch state is partitioning-independent (counters are sums)") {
    val t = toks(sf001)
    def grid(parts: Int): Seq[(Int, Long, Long)] =
      CountMin.sketch(t.repartition(parts), "term", d = 3, w = 64)
        .collect()
        .map(r => (r.getAs[Int]("i"), r.getAs[Long]("bucket"),
          r.getAs[Long]("cnt"))).toSeq.sorted
    assert(grid(1) == grid(7))
  }

  test("tiny width forces collisions: some probe strictly over-counts") {
    val sess = spark
    import sess.implicits._
    // 64 distinct terms into w=4 buckets: pigeonhole guarantees
    // collision mass lands on every heavy term's counters
    val df = (0 until 2048).map(i => s"t${i % 64}").toDF("term")
    val r = CountMin.topKWithEstimates(df, "term", d = 2, w = 4, k = 8)
      .collect()
    assert(r.forall(row =>
      row.getAs[Long]("cms_est") >= row.getAs[Long]("n_exact")))
    assert(r.exists(row =>
      row.getAs[Long]("cms_est") > row.getAs[Long]("n_exact")),
      "w=4 over 64 terms must over-count at least one probe")
  }

  test("null terms share one discipline: dropped from sketch AND probes, k rows survive") {
    val sess = spark
    import sess.implicits._
    // 2048 nulls would RANK FIRST in the top-k; before the shared
    // upstream filter they probed null buckets, never joined the
    // sketch, and the output silently shrank to k-1 rows
    val df = (Seq.fill(2048)(null: String) ++
      (0 until 512).map(i => s"t${i % 8}")).toDF("term")
    val r = CountMin.topKWithEstimates(df, "term", d = 2, w = 4096, k = 8)
      .collect()
    assert(r.length == 8, s"null term swallowed a probe row: got ${r.length}")
    assert(r.forall(_.getAs[String]("term") != null))
    assert(r.forall(row => row.getAs[Long]("n_exact") == 64L))
  }

  test("generous width over a tiny vocabulary: estimates are exact") {
    val sess = spark
    import sess.implicits._
    // 8 distinct terms, w=4096: P(any md5 collision) is negligible and
    // FIXED given the hash — deterministic, not flaky
    val df = (0 until 800).map(i => s"term_number_$i".take(12) + s"${i % 8}")
      .toDF("term")
    val r = CountMin.topKWithEstimates(df, "term", d = 4, w = 4096, k = 8)
      .collect()
    assert(r.length == 8)
    r.foreach(row =>
      assert(row.getAs[Long]("cms_est") == row.getAs[Long]("n_exact")))
  }

  test("HLL++ gate: both rsd envelopes hold with >= 2x margin at sf0.001 and sf0.01") {
    for (dir <- Seq(sf001, sf01)) {
      val docs = Tables(spark, dir, "documents")
      val row = docs.agg(
        countDistinct(col("text")).as("exact"),
        approx_count_distinct(col("text"), 0.05).as("coarse"),
        approx_count_distinct(col("text"), 0.015).as("fine")).head
      val exact = row.getAs[Long]("exact").toDouble
      val relCoarse = math.abs(row.getAs[Long]("coarse") - exact) / exact
      val relFine = math.abs(row.getAs[Long]("fine") - exact) / exact
      // the query gates at 4*rsd; require the fixtures sit at <= 2*rsd
      // so the declared gate has at least 2x headroom
      assert(relCoarse <= 2 * 0.05, s"$dir coarse rel err $relCoarse")
      assert(relFine <= 2 * 0.015, s"$dir fine rel err $relFine")
    }
  }

  test("argument guards reject degenerate sketch shapes loudly") {
    val sess = spark
    import sess.implicits._
    val df = Seq("a").toDF("term")
    intercept[IllegalArgumentException](CountMin.sketch(df, "term", d = 0, w = 16))
    intercept[IllegalArgumentException](CountMin.sketch(df, "term", d = 9, w = 16))
    intercept[IllegalArgumentException](CountMin.sketch(df, "term", d = 4, w = 1))
    intercept[IllegalArgumentException](
      CountMin.topKWithEstimates(df, "term", d = 4, w = 16, k = 0))
    intercept[IllegalArgumentException](
      graft.ops.BpeTrain.train(Seq("a b").toDF("text"), "text", steps = 0))
    intercept[IllegalArgumentException](
      graft.ops.BpeTrain.train(Seq("a b").toDF("text"), "text", steps = 65))
  }

  test("HLL++ estimate is partitioning-independent (register max-merge)") {
    val docs = Tables(spark, sf001, "documents")
    def est(parts: Int): Long =
      docs.repartition(parts)
        .agg(approx_count_distinct(col("text"), 0.05).as("e"))
        .head.getAs[Long]("e")
    assert(est(1) == est(5))
  }
}
