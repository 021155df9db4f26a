package graft

import org.apache.spark.sql.functions._

import graft.functions.point_in_polygon
import graft.plans.PipBboxInjection

class PipBboxRuleSpec extends SparkSpec {

  test("rule injects pushable bbox conjuncts for literal-ring PIP filters") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PipBboxInjection
    try {
      val df = Tables(spark, sf001, "lineitem")
        .filter(point_in_polygon(
          lit(Array(10.0, 40.0, 40.0, 10.0)), lit(Array(0.0, 0.0, 0.09, 0.09)),
          col("l_quantity"), col("l_discount")))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains(">= 10.0") && optimized.contains("<= 40.0"),
        s"x bbox not injected:\n$optimized")
      assert(optimized.contains(">= 0.0") && optimized.contains("<= 0.09"),
        s"y bbox not injected:\n$optimized")
      // pushed to the scan: quantity bounds appear as data filters
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("PushedFilters") &&
        physical.contains("GreaterThanOrEqual(l_quantity,10.0)"),
        s"bbox not pushed to parquet:\n${physical.take(2000)}")
      // and the result matches the unoptimized semantics
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PipBboxInjection)
      val plain = Tables(spark, sf001, "lineitem")
        .filter(point_in_polygon(
          lit(Array(10.0, 40.0, 40.0, 10.0)), lit(Array(0.0, 0.0, 0.09, 0.09)),
          col("l_quantity"), col("l_discount")))
      assert(df.count() == plain.count())
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PipBboxInjection)
    }
  }
}
