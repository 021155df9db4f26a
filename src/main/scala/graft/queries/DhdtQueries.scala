package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Extraload

/** The flagship composed dhdt pipeline (reference atlxi_dhdt.py:107-296,
  * SURVEY.md §3.1) plus the wide<->long layout converters it feeds
  * (extraload.py:54-200). lineitem plays the ATL11 point cloud:
  * l_orderkey = ref_pt, l_linenumber = cycle_number,
  * l_extendedprice = h_corr, l_shipdate = utc_time.
  */
object DhdtQueries extends QueryPack {

  private val SecPerYear = 86400.0 * 365.25

  override def queries: Seq[Q] = Seq(

    // The dhdt chain: >=2-valid-cycles (P7) -> h_range threshold (A5)
    // -> per-point OLS (A6) -> slope unit conversion (F2), FUSED into
    // one grouped aggregation: all moments (count, min/max, covar,
    // variances, means) come out of a single partial+final hash
    // aggregate, so the whole flagship pipeline is ONE shuffle on
    // ref_pt — at 100 TB this is the plan you want (the reference
    // makes three passes over the array store for the same answer).
    Q("q_dhdt_pipeline",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val x = unix_timestamp(col("l_shipdate")).cast("double")
        val y = col("l_extendedprice")
        li.groupBy(col("l_orderkey"))
          .agg(
            count(y).as("nobs"),
            (max(y) - min(y)).as("h_range"),
            covar_samp(x, y).as("_cov"),
            var_samp(x).as("_varx"),
            var_samp(y).as("_vary"),
            avg(x).as("_avgx"),
            avg(y).as("_avgy"))
          .filter(col("h_range") > lit(2000.0) &&
            col("_varx") > 0 && col("_vary") > 0 && col("nobs") >= 3)
          .withColumn("slope", col("_cov") / col("_varx"))
          .select(
            col("l_orderkey"),
            col("nobs"),
            round(col("h_range"), 2).as("h_range"),
            round(col("slope") * lit(SecPerYear), 6).as("dhdt_slope_yr"),
            round(col("_avgy") - col("slope") * col("_avgx"), 2).as("intercept"),
            round(col("_cov") / sqrt(col("_varx") * col("_vary")), 6).as("rvalue"))
      },
      Some(s"""
        WITH g AS (
          SELECT l_orderkey,
                 count(l_extendedprice) AS nobs,
                 max(l_extendedprice) - min(l_extendedprice) AS h_range,
                 covar_samp(CAST(epoch(l_shipdate) AS DOUBLE), l_extendedprice) AS cov,
                 var_samp(CAST(epoch(l_shipdate) AS DOUBLE)) AS varx,
                 var_samp(l_extendedprice) AS vary,
                 avg(CAST(epoch(l_shipdate) AS DOUBLE)) AS avgx,
                 avg(l_extendedprice) AS avgy
          FROM lineitem
          GROUP BY l_orderkey)
        SELECT l_orderkey, nobs,
               round(h_range, 2) AS h_range,
               round((cov / varx) * $SecPerYear, 6) AS dhdt_slope_yr,
               round(avgy - (cov / varx) * avgx, 2) AS intercept,
               round(cov / sqrt(varx * vary), 6) AS rvalue
        FROM g
        WHERE nobs >= 3 AND h_range > 2000.0 AND varx > 0 AND vary > 0
      """.trim)),

    // long -> wide (extraload.py:54-128): per-cycle value columns via
    // pivot-as-conditional-aggregation (one hash aggregate, no
    // cycle-discovery job because cycles are declared).
    Q("x1_long_to_wide",
      (s, dir) => {
        Extraload.longToWide(
          Tables(s, dir, "lineitem"),
          key = "l_orderkey", cycleCol = "l_linenumber",
          valueCols = Seq("l_extendedprice"), cycles = 1 to 7)
      },
      Some {
        val cols = (1 to 7).map(c =>
          s"max(CASE WHEN l_linenumber = $c THEN l_extendedprice END) AS l_extendedprice_$c")
          .mkString(",\n               ")
        s"""
        SELECT l_orderkey,
               $cols
        FROM lineitem
        GROUP BY l_orderkey
        """.trim
      }),

    // wide -> long round-trip (extraload.py:176-200): stack() the wide
    // table back to (key, cycle, value) rows, all-null rows dropped —
    // recovers the original long table exactly.
    Q("x2_wide_to_long",
      (s, dir) => {
        val wide = Extraload.longToWide(
          Tables(s, dir, "lineitem"),
          key = "l_orderkey", cycleCol = "l_linenumber",
          valueCols = Seq("l_extendedprice"), cycles = 1 to 7)
        Extraload.wideToLong(wide,
          key = "l_orderkey", cycleCol = "l_linenumber",
          valueCols = Seq("l_extendedprice"), cycles = 1 to 7)
      },
      // the generator emits duplicate (orderkey, linenumber) pairs;
      // the pivot collapses them with max(), so the recovered long
      // table is the deduplicated one — the oracle mirrors that.
      Some("""
        SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
               max(l_extendedprice) AS l_extendedprice
        FROM lineitem
        GROUP BY 1, 2
      """.trim))
  )
}
