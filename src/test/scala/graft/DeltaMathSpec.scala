package graft

import org.apache.spark.sql.functions._

import graft.ops.DeltaMath

/** Mirrors the reference's deltamath unit tests
  * (/root/reference/deepicedrain/tests/test_nanptp.py,
  * test_calculate_delta.py, test_nanlinregress.py) on hand-built
  * frames with NaN/null handling and a closed-form regression golden.
  */
class DeltaMathSpec extends SparkSpec {
  import spark.implicits._

  test("nanptp skips nulls and applies min-count HAVING") {
    val df = Seq(
      (1L, Some(2.0)), (1L, Some(5.5)), (1L, None),
      (2L, Some(7.0)),
      (3L, Some(1.0)), (3L, Some(4.0)), (3L, Some(0.5))
    ).toDF("ref_pt", "h_corr")
    val out = DeltaMath.nanptp(df, Seq("ref_pt"), "h_corr", minCount = 2)
      .orderBy("ref_pt").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(out(0).getDouble(1) == 3.5)
    assert(out(1).getDouble(1) == 3.5)
    assert(out(0).getLong(2) == 2L) // null not counted
  }

  test("calculateDelta = value@new - value@old per key, null when absent") {
    val df = Seq(
      (10L, 3, 100.0), (10L, 7, 103.25),
      (11L, 3, 50.0) // no cycle 7 -> delta null
    ).toDF("ref_pt", "cycle_number", "h_corr")
    val out = DeltaMath.calculateDelta(
      df, Seq("ref_pt"), "cycle_number", "h_corr", lit(7), lit(3))
      .orderBy("ref_pt").collect()
    assert(out(0).getDouble(1) == 3.25)
    assert(out(1).isNullAt(1))
  }

  test("linregress matches closed-form golden (n=4, df=2)") {
    // goldens computed from the OLS closed forms; p via the exact
    // df=2 tail 1 - t/sqrt(2+t^2)
    val df = Seq(
      (1L, 1.0, 2.0), (1L, 2.0, 4.1), (1L, 3.0, 5.9), (1L, 4.0, 8.2)
    ).toDF("ref_pt", "t", "h")
    val r = DeltaMath.linregress(df, Seq("ref_pt"), col("t"), col("h"))
      .collect()(0)
    val m = r.getValuesMap[Any](Seq("slope", "intercept", "rvalue", "stderr", "pvalue", "nobs"))
    assert(math.abs(m("slope").asInstanceOf[Double] - 2.04) < 1e-12)
    assert(math.abs(m("intercept").asInstanceOf[Double] - -0.04999999999999982) < 1e-10)
    assert(math.abs(m("rvalue").asInstanceOf[Double] - 0.9989922980237592) < 1e-12)
    assert(math.abs(m("stderr").asInstanceOf[Double] - 0.0648074069840789) < 1e-12)
    assert(math.abs(m("pvalue").asInstanceOf[Double] - 0.0010077019762407824) < 1e-12)
    assert(m("nobs").asInstanceOf[Long] == 4L)
  }

  test("linregress: perfect fit has pvalue 0; degenerate x has null stderr") {
    val df = Seq(
      (1L, 1.0, 2.0), (1L, 2.0, 4.0), (1L, 3.0, 6.0), // exact line
      (2L, 5.0, 1.0), (2L, 5.0, 2.0), (2L, 5.0, 3.0)  // varx = 0
    ).toDF("ref_pt", "t", "h")
    val rows = DeltaMath.linregress(df, Seq("ref_pt"), col("t"), col("h"))
      .orderBy("ref_pt").collect()
    assert(rows(0).getAs[Double]("pvalue") == 0.0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("stderr")))
  }
}
