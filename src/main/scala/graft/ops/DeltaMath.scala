package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.t_pvalue

/** Height-difference math over the canonical long layout — the Spark
  * re-expression of /root/reference/deepicedrain/deltamath.py.
  *
  * All operators are single grouped aggregations (partial+final hash
  * aggregate, no joins, no driver loops), so they scale with partition
  * count: at 100 TB the only shuffle is the one groupBy on the key.
  */
object DeltaMath {

  /** NaN-and-null mask: the reference's nanptp/nan_linregress use
    * numpy nan-skipping (np.nanmax, ~np.isnan); Spark's max/count
    * treat NaN as a real (and largest) value, so NaN-encoded missing
    * data must be masked to null explicitly.
    */
  private def nanSafe(c: Column): Column =
    when(!isnan(c.cast("double")), c)

  /** Per-key range max−min, null-skipping — `nanptp`
    * (deltamath.py:34-42). `minCount` re-expresses the reference's
    * "keep points with >= 2 valid cycles" pre-filter
    * (atlxi_dhdt.py:107-112) as a HAVING clause in the same
    * aggregation, instead of a second pass over the data.
    */
  def nanptp(
      df: DataFrame,
      keys: Seq[String],
      value: String,
      out: String = "h_range",
      minCount: Int = 1): DataFrame =
    df.groupBy(keys.map(df.col): _*)
      .agg(
        (max(nanSafe(col(value))) - min(nanSafe(col(value)))).as(out),
        count(nanSafe(col(value))).as("nobs"))
      .filter(col("nobs") >= minCount)

  /** Per-key `value@newCycle − value@oldCycle` — `calculate_delta`
    * (deltamath.py:10-31). Long layout: one conditional aggregation,
    * no self-join (SURVEY.md §2.3 J7).
    */
  def calculateDelta(
      df: DataFrame,
      keys: Seq[String],
      cycleCol: String,
      valueCol: String,
      newCycle: Column,
      oldCycle: Column,
      out: String = "delta"): DataFrame =
    df.groupBy(keys.map(df.col): _*)
      .agg((
        max(when(col(cycleCol) === newCycle, col(valueCol))) -
          max(when(col(cycleCol) === oldCycle, col(valueCol)))).as(out))

  /** Per-key OLS of y on x with the full scipy-linregress output
    * (slope, intercept, rvalue, pvalue, stderr, nobs) —
    * `nan_linregress` (deltamath.py:45-67, atlxi_dhdt.py:253-285).
    *
    * Everything is built-in partial aggregates (regr_slope /
    * regr_intercept / corr / variances), so the hot path is one
    * codegen'd hash aggregate; only the p-value tail is a custom
    * expression ([[graft.functions.TPValue]]) applied to the
    * already-aggregated rows.
    *
    * stderr = sqrt( var(y)·(1−r²) / (var(x)·(n−2)) );
    * p = two-sided t-tail of t = slope/stderr at df = n−2.
    */
  def linregress(
      df: DataFrame,
      keys: Seq[String],
      x: Column,
      y: Column): DataFrame = {
    // pairwise-complete masking (scipy NaN-mask semantics): every
    // moment uses only rows where BOTH x and y are present and finite
    val bothSet = x.isNotNull && y.isNotNull &&
      !isnan(x.cast("double")) && !isnan(y.cast("double"))
    val xx = when(bothSet, x)
    val yy = when(bothSet, y)
    val n = col("nobs")
    val dof = (n - lit(2)).cast("double")
    val varx = col("_varx")
    val vary = col("_vary")
    val r2 = col("rvalue") * col("rvalue")
    // covar_samp/var_samp are Welford-style single-pass aggregates
    // (numerically stable for epoch-scale x); corr is intentionally
    // NOT used: under ANSI mode (Spark 4 default) it throws
    // DIVIDE_BY_ZERO on zero-variance groups, where the reference
    // (and the DuckDB oracle) yield null.
    df.groupBy(keys.map(df.col): _*)
      .agg(
        covar_samp(xx, yy).as("_cov"),
        var_samp(xx).as("_varx"),
        var_samp(yy).as("_vary"),
        avg(xx).as("_avgx"),
        avg(yy).as("_avgy"),
        count(xx).as("nobs"))
      .withColumn("slope", when(varx > 0, col("_cov") / varx))
      .withColumn("intercept", col("_avgy") - col("slope") * col("_avgx"))
      .withColumn("rvalue",
        when(varx > 0 && vary > 0, col("_cov") / sqrt(varx * vary)))
      .withColumn("stderr",
        when(n > 2 && varx > 0 && vary > 0,
          sqrt(vary * greatest(lit(1.0) - r2, lit(0.0)) / (varx * dof))))
      .withColumn("pvalue",
        when(col("stderr") === 0, lit(0.0))
          .otherwise(t_pvalue(col("slope") / col("stderr"), dof)))
      .drop("_cov", "_varx", "_vary", "_avgx", "_avgy")
      .select((keys.map(col) ++ Seq("slope", "intercept", "rvalue",
        "pvalue", "stderr", "nobs").map(col)): _*)
  }
}
