package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weight-proportional corpus subsampling — the "keep the best data
  * with probability proportional to quality/length" step of a
  * training-data pipeline, in two deterministic, oracle-replayable
  * forms:
  *
  *  - [[ppsSystematic]]: systematic probability-proportional-to-size
  *    sampling (the classic survey-sampling design): walk the
  *    cumulative-weight axis in id order and keep the unit under each
  *    of k equally-spaced integer thresholds. ALL-INTEGER arithmetic,
  *    so the oracle comparison is exact by construction.
  *  - [[esTopK]]: Efraimidis–Spirakis weighted reservoir (top-k by
  *    key u^(1/w), ranked as ln(u)/w) with the uniform u derived from
  *    the id by the engine's bounded Knuth hash — the form that
  *    composes with a streaming reservoir.
  *
  * Scale shapes: esTopK is `orderBy(...).limit(k)` — Spark plans
  * TakeOrderedAndProject (per-partition top-k, single k-row merge on
  * the driver), NO global sort. ppsSystematic windows per group, so
  * its exchange is the groupCols hash shuffle; the window partition is
  * one group's rows, the same contract every W-row query in the
  * engine already carries.
  */
object WeightedSample {

  /** Bounded Knuth-hash uniform in (0,1) with 1e-6 grain, identical
    * to the deterministic sampler's arithmetic (p11): the id is
    * bounded BEFORE the multiply so the 64-bit product cannot
    * overflow; +0.5 keeps u strictly inside (0,1) so ln(u) is finite.
    */
  private def hashUniform(idCol: String) =
    (((col(idCol) % lit(1000000007L)) * lit(2654435761L)) % lit(1000000L) +
      lit(0.5)) / lit(1000000.0)

  /** Top-k rows by Efraimidis–Spirakis key, deterministic in the id.
    * Returns (idCol, weightCol) for the k winners, the weight as the
    * long it ranked by. Weights must be >= 1 (enforced; a fractional
    * weight column is floored ONCE and that same long drives the key,
    * the filter, and the output — round-11 advice).
    *
    * Libm-independence of the k-boundary: the ES key ln(u)/w is
    * quantized as `round(ln(u) * 1e6) / w` — u has exactly 1e6
    * possible values ((m+0.5)/1e6), and [[WeightedSampleSpec]]
    * verifies EXHAUSTIVELY over that whole domain that ln(u)*1e6 is
    * never within 100x a 2-ulp cross-libm ln() discrepancy of a
    * rounding half-point (worst pointwise margin ~850x). The rounded
    * key numerator is therefore the same exact integer under any
    * correctly-rounded-to-2ulp ln, and an integer/long double
    * division is IEEE-exact, so the ORDER is engine-independent —
    * the guarantee the previous raw ln(u)/w key only held per-fixture.
    */
  def esTopK(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k >= 1 required, got $k")
    val w = col(weightCol).cast("long")
    val key = round(log(hashUniform(idCol)) * lit(1e6)) / w.cast("double")
    df.select(col(idCol), w.as(weightCol), key.as("_key"))
      .filter(col(weightCol) >= 1)
      .orderBy(col("_key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col(weightCol))
  }

  /** Systematic PPS per group: in id order, keep the row under each
    * integer threshold j*W/k (j = 1..k), i.e. rows where
    * `(cum*k) div W` strictly increases over `((cum-w)*k) div W`.
    * Exactly k rows per group when every weight < W/k; a heavier unit
    * is kept once (never duplicated). Integer weights >= 1 required.
    */
  def ppsSystematic(df: DataFrame, groupCols: Seq[String], idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k >= 1 required, got $k")
    val w = col(weightCol).cast("long")
    val cumW = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(groupCols.map(col): _*)
    val withCum = df
      .filter(w >= 1)
      .withColumn("_w", w)
      .withColumn("_cum", sum(col("_w")).over(cumW))
      .withColumn("_tot", sum(col("_w")).over(totW))
    withCum
      .filter(expr(s"(_cum * $k) div _tot") >
        expr(s"((_cum - _w) * $k) div _tot"))
      .select(groupCols.map(col) ++ Seq(col(idCol), col("_w").as(weightCol)): _*)
  }
}
