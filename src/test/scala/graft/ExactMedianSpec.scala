package graft

import org.apache.spark.sql.functions._

import graft.ops.ExactMedian

/** The counting median must be BIT-identical to Spark's built-in
  * `median` aggregate on conforming (fixed-decimal) data — including
  * the even-count interpolation ulp chain — or the DuckDB oracle
  * hashes would silently diverge between the two formulations.
  */
class ExactMedianSpec extends SparkSpec {

  test("global median matches the built-in bit-for-bit (even and odd counts)") {
    val li = Tables(spark, sf001, "lineitem").select(col("l_extendedprice"))
    for (n <- Seq(1000, 1001, 6000)) {
      val d = li.limit(n).cache()
      val builtin = d.agg(median(col("l_extendedprice"))).head.getDouble(0)
      val counted = ExactMedian.medianByUnits(d, Nil, "l_extendedprice", "m")
        .head.getDouble(0)
      assert(java.lang.Double.doubleToLongBits(builtin) ==
        java.lang.Double.doubleToLongBits(counted),
        s"n=$n: builtin $builtin != counted $counted")
      d.unpersist()
    }
  }

  test("grouped median matches the built-in per group") {
    val li = Tables(spark, sf001, "lineitem")
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(median(col("l_extendedprice")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val counted = ExactMedian
      .medianByUnits(li, Seq("l_returnflag"), "l_extendedprice", "m")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(builtin.keySet == counted.keySet)
    for ((k, v) <- builtin)
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(counted(k)), s"group $k")
  }

  test("half-unit scale handles derived deviation columns") {
    val sess = spark
    import sess.implicits._
    // deviations |x - median| of 2dp values are exact half-cent
    // multiples -> scale 200 quantizes losslessly
    val xs = Seq(1.00, 2.50, 3.75, 9.25, 4.50).toDF("v")
    val med = xs.agg(median(col("v"))).head.getDouble(0)
    val dev = xs.select(abs(col("v") - lit(med)).as("d"))
    val builtin = dev.agg(median(col("d"))).head.getDouble(0)
    val counted = ExactMedian.medianByUnits(dev, Nil, "d", "m", scale = 200)
      .head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(builtin) ==
      java.lang.Double.doubleToLongBits(counted))
  }
}
