package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.DeltaMath

/** deltamath operator family (SURVEY.md §2.4 A5/A6, §2.3 J7, §2.2 P7)
  * declared over the driver's test tables: lineitem rows play the role
  * of per-cycle height observations keyed by l_orderkey; orders play a
  * per-customer time series for the dhdt-style regression.
  */
object DeltaMathQueries extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // A5 nanptp + P7 ">= 2 valid cycles" HAVING, in one aggregation.
    Q("a5_nanptp_range",
      (s, dir) => {
        val out = DeltaMath.nanptp(
          Tables(s, dir, "lineitem"),
          keys = Seq("l_orderkey"), value = "l_extendedprice",
          out = "h_range", minCount = 2)
        out.select(col("l_orderkey"),
          round(col("h_range"), 4).as("h_range"), col("nobs"))
      },
      Some("""
        SELECT l_orderkey,
               round(max(l_extendedprice) - min(l_extendedprice), 4) AS h_range,
               count(l_extendedprice) AS nobs
        FROM lineitem
        GROUP BY l_orderkey
        HAVING count(l_extendedprice) >= 2
      """.trim)),

    // J7 calculate_delta: newest minus oldest "cycle" per key, as a
    // conditional aggregation (no self-join).
    Q("j7_calculate_delta",
      (s, dir) => {
        val out = DeltaMath.calculateDelta(
          Tables(s, dir, "events"),
          keys = Seq("user_id"), cycleCol = "event_type",
          valueCol = "value",
          newCycle = lit("purchase"), oldCycle = lit("click"),
          out = "delta")
        out.select(col("user_id"), round(col("delta"), 4).as("delta"))
      },
      Some("""
        SELECT user_id,
               round(max(value) FILTER (WHERE event_type = 'purchase')
                     - max(value) FILTER (WHERE event_type = 'click'), 4) AS delta
        FROM events
        GROUP BY user_id
      """.trim)),

    // A6 nan_linregress (oracle-checkable subset: slope, intercept,
    // rvalue, stderr, nobs — DuckDB has no t-CDF for the p-value).
    Q("a6_linregress",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
        DeltaMath.linregress(
          orders,
          keys = Seq("o_custkey"),
          x = unix_timestamp(col("o_orderdate")).cast("double"),
          y = col("o_totalprice"))
          .filter(col("nobs") >= 3 && col("stderr").isNotNull)
          .select(
            col("o_custkey"),
            round(col("slope") * lit(86400.0 * 365.25), 6).as("slope_yr"),
            round(col("intercept"), 2).as("intercept"),
            round(col("rvalue"), 6).as("rvalue"),
            round(col("stderr") * lit(86400.0 * 365.25), 6).as("stderr_yr"),
            col("nobs"))
      },
      Some("""
        WITH g AS (
          SELECT o_custkey,
                 covar_samp(CAST(epoch(o_orderdate) AS DOUBLE), o_totalprice) AS cov,
                 var_samp(CAST(epoch(o_orderdate) AS DOUBLE)) AS varx,
                 var_samp(o_totalprice) AS vary,
                 avg(CAST(epoch(o_orderdate) AS DOUBLE)) AS avgx,
                 avg(o_totalprice) AS avgy,
                 count(*) AS nobs
          FROM orders
          GROUP BY o_custkey
        )
        -- the year conversion multiplies by the SINGLE constant
        -- 31557600.0 (= 86400*365.25, exactly representable), matching
        -- the Spark side op-for-op: two successive multiplies round
        -- differently by 1 ulp for some slopes
        SELECT o_custkey,
               round((cov / varx) * 31557600.0, 6) AS slope_yr,
               round(avgy - (cov / varx) * avgx, 2) AS intercept,
               round(cov / sqrt(varx * vary), 6) AS rvalue,
               round(sqrt(vary * greatest(1 - (cov * cov) / (varx * vary), 0) / (varx * (nobs - 2))) * 31557600.0, 6) AS stderr_yr,
               nobs
        FROM g
        WHERE nobs >= 3 AND varx > 0 AND vary > 0
      """.trim)),

    // A6 full surface incl. the custom t-tail p-value expression.
    // ORACLE-CHECKED (round 4): the general regularized incomplete
    // beta behind TPValue is not SQL-expressible, but every df here
    // is a SMALL INTEGER (nobs-2, 1..23), where the Student-t CDF has
    // the classic Abramowitz & Stegun 26.7.3/26.7.4 FINITE series in
    // theta = atan(|t|/sqrt(df)) — the oracle evaluates that closed
    // form (coefficients via lgamma) and matches TPValue's
    // continued-fraction betainc to well below the 6dp round on all
    // 1494 groups. StudentTSpec still pins scipy golden values.
    Q("a6_linregress_pvalue",
      (s, dir) => {
        DeltaMath.linregress(
          Tables(s, dir, "orders"),
          keys = Seq("o_custkey"),
          x = unix_timestamp(col("o_orderdate")).cast("double"),
          y = col("o_totalprice"))
          .filter(col("nobs") >= 3 && col("stderr").isNotNull)
          .select(col("o_custkey"),
            round(col("pvalue"), 6).as("pvalue"), col("nobs"))
      },
      Some("""
        WITH g AS (
          SELECT o_custkey,
                 covar_samp(CAST(epoch(o_orderdate) AS DOUBLE), o_totalprice) AS cov,
                 var_samp(CAST(epoch(o_orderdate) AS DOUBLE)) AS varx,
                 var_samp(o_totalprice) AS vary,
                 count(*) AS nobs
          FROM orders GROUP BY o_custkey),
        tv AS (
          SELECT o_custkey, nobs, nobs - 2 AS nu,
                 sqrt(vary * greatest(1 - (cov * cov) / (varx * vary), 0) /
                      (varx * (nobs - 2))) AS stderr,
                 (cov / varx) AS slope
          FROM g WHERE nobs >= 3 AND varx > 0 AND vary > 0),
        th AS (
          SELECT o_custkey, nobs, nu,
                 CASE WHEN stderr = 0 THEN NULL
                      ELSE atan(abs(slope / stderr) / sqrt(CAST(nu AS DOUBLE))) END
                   AS theta
          FROM tv),
        -- A&S 26.7.3/26.7.4: even nu: A = sin(th) * sum_j c_j cos^2j(th),
        -- c_j = C(2j, j)/4^j; odd nu: A = (2/pi)(th + sin(th) *
        -- sum_j d_j cos^(2j+1)(th)), d_j = 4^j (j!)^2 / (2j+1)!.
        -- nu = 1 has an empty series (A = 2 theta / pi): coalesce 0.
        ser AS (
          SELECT t.o_custkey,
                 sum(CASE WHEN t.nu % 2 = 0
                       THEN exp(lgamma(2*j.j + 1.0) - 2*lgamma(j.j + 1.0)
                                - j.j*ln(4.0)) * pow(cos(t.theta), 2*j.j)
                       ELSE exp(j.j*ln(4.0) + 2*lgamma(j.j + 1.0)
                                - lgamma(2*j.j + 2.0))
                            * pow(cos(t.theta), 2*j.j + 1) END) AS s
          FROM th t
          JOIN (SELECT unnest(generate_series(0, 15)) AS j) j
            ON (t.nu % 2 = 0 AND j.j <= (t.nu - 2) // 2)
            OR (t.nu % 2 = 1 AND j.j <= (t.nu - 3) // 2)
          WHERE t.theta IS NOT NULL
          GROUP BY t.o_custkey)
        SELECT t.o_custkey,
               round(CASE WHEN t.theta IS NULL THEN 0.0
                          WHEN t.nu % 2 = 0
                            THEN 1.0 - sin(t.theta) * coalesce(s.s, 0.0)
                          ELSE 1.0 - (2.0/pi()) *
                               (t.theta + sin(t.theta) * coalesce(s.s, 0.0))
                     END, 6) AS pvalue,
               t.nobs
        FROM th t LEFT JOIN ser s ON t.o_custkey = s.o_custkey
      """.trim))
  )
}
