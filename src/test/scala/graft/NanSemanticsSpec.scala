package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.DeltaMath

/** Locks the numpy nan-skipping semantics (ADVICE r1): Spark's
  * max/count treat NaN as a real, largest value — the deltamath
  * operators must mask it like np.nanmax / nan_linregress do.
  */
class NanSemanticsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", IntegerType),
    StructField("t", DoubleType), StructField("h", DoubleType)))

  private def df(rows: Seq[(Int, Double, Double)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))), schema)

  test("nanptp skips NaN like np.nanptp") {
    val d = df(Seq((1, 0.0, 2.0), (1, 1.0, 5.0), (1, 2.0, Double.NaN),
      (2, 0.0, Double.NaN), (2, 1.0, Double.NaN)))
    val out = DeltaMath.nanptp(d, Seq("k"), "h", minCount = 1)
      .collect().map(r => r.getInt(0) -> (r.get(1), r.getLong(2))).toMap
    assert(out(1)._1 == 3.0, s"NaN must not poison the range: ${out(1)}")
    assert(out(1)._2 == 2L, "NaN must not count as an observation")
    assert(!out.contains(2), "all-NaN group fails minCount")
  }

  test("linregress masks NaN pairs like scipy's nan mask") {
    // y = 2t + 1 on clean points; one NaN y and one NaN t injected
    val d = df(Seq((1, 0.0, 1.0), (1, 1.0, 3.0), (1, 2.0, 5.0), (1, 3.0, 7.0),
      (1, 4.0, Double.NaN), (1, Double.NaN, 99.0)))
    val r = DeltaMath.linregress(d, Seq("k"), col("t"), col("h")).head()
    assert(r.getAs[Long]("nobs") == 4)
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("intercept") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("rvalue") - 1.0) < 1e-12)
  }

  test("calculateDelta ignores NaN observations in the max-picking") {
    val schema2 = StructType(Seq(
      StructField("k", IntegerType), StructField("cyc", IntegerType),
      StructField("h", DoubleType)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, 1, 10.0), Row(1, 2, 14.5))), schema2)
    val out = DeltaMath.calculateDelta(d, Seq("k"), "cyc", "h", lit(2), lit(1))
      .head()
    assert(math.abs(out.getDouble(1) - 4.5) < 1e-12)
  }
}
