package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Window / time-series family over the `events` table (SURVEY.md
  * §2.5 W1-W6, §2.4 A15/A16). Every operator is a partitioned window
  * — per-key local sort within a hash partition, no global sort, so
  * the only shuffle is the partitionBy exchange and the plan scales
  * with key cardinality.
  *
  * Time discipline: events.ts is LongType nanoseconds; windows order
  * by exact integer µs (`ts div 1000`) so Spark and the DuckDB oracle
  * (µs-precision timestamps) see identical orderings.
  */
object WindowQueries extends QueryPack {

  private val UsPerDay = 86400L * 1000000L

  override def queries: Seq[Q] = Seq(

    // W1 rolling trailing time-range window: mean/std of value over
    // the last 7 days per user (reference: 91-day rolling window,
    // lake_algorithms.py:180-194; min_periods=1 trailing semantics).
    // Exactness: value has 2 decimals, so the window sums run over
    // integer cents (order-independent, engine-independent); mean and
    // std are then derived with identical double ops in both engines.
    Q("w1_rolling_range",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .withColumn("ts_us", expr("ts div 1000"))
          .withColumn("cents", round(col("value") * 100).cast("long"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
          .rangeBetween(-7L * UsPerDay, 0L)
        val n = count(col("cents")).over(w)
        val s1 = sum(col("cents")).over(w)
        // cents^2 sums through decimal(38,0): a long sum of squares
        // wraps silently (non-ANSI) at ~3.8e9 rows/window while the
        // DuckDB oracle sums in HUGEINT — decimal keeps both engines
        // exact to 10^38, far past any physical window (s1 stays
        // long: linear cents overflow needs ~9e14 rows). Same outputs
        // at every fixture; the decimal aggregate costs a few percent.
        val s2 = sum((col("cents") * col("cents")).cast("decimal(38,0)")).over(w)
        // mean at fixed 4-dp scale via integer floor-division: round()
        // on a double is NOT portable when the value lands exactly on
        // a decimal half (Spark rounds the shortest decimal repr,
        // DuckDB the binary value); integer div sidesteps it entirely.
        val meanScaled = call_function("div", s1 * lit(100L), n)
        // sample std from EXACT integer moments pushed through
        // OP-FOR-OP mirrored double arithmetic: the all-long
        // n*s2 - s1*s1 form overflows at ~62k events/window (DuckDB's
        // HUGEINT doesn't — guaranteed divergence); with s2 exact in
        // decimal both engines cast the same integers to double and
        // run the identical IEEE op sequence (exact below 2^53,
        // identically rounded above)
        val m = n.cast("double") * s2.cast("double") -
          s1.cast("double") * s1.cast("double")
        ev.select(col("event_id"), col("user_id"),
            (meanScaled.cast("double") / lit(10000.0)).as("roll_mean"),
            round(when(n > 1,
              sqrt(greatest(m, lit(0.0)) / (n * (n - lit(1))).cast("double")) / lit(100.0))
              .otherwise(lit(0.0)), 4).as("roll_std"),
            n.as("roll_n"))
      },
      Some("""
        WITH c AS (
          SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events),
        wsum AS (
          SELECT event_id, user_id,
                 count(cents) OVER w AS n,
                 sum(cents) OVER w AS s1,
                 sum(cents * cents) OVER w AS s2
          FROM c
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                       RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW))
        SELECT event_id, user_id,
               CAST((s1 * 100) // n AS DOUBLE) / 10000.0 AS roll_mean,
               round(CASE WHEN n > 1
                 THEN sqrt(greatest(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE), 0.0)
                           / CAST(n * (n - 1) AS DOUBLE)) / 100.0
                 ELSE 0.0 END, 4) AS roll_std,
               n AS roll_n
        FROM wsum
      """.trim)),

    // W2 anomaly vs first observation per group (atlxi_xover.py:291-294).
    Q("w2_anomaly_vs_first",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        // order by the µs-truncated axis like every other window query
        // (the oracle's ts IS µs-truncated, so ns ordering could break
        // same-µs ties differently than the oracle's event_id tiebreak)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(expr("ts div 1000"), col("event_id"))
        ev.select(col("event_id"), col("user_id"),
          round(col("value") - first(col("value")).over(w), 4).as("anomaly"))
      },
      Some("""
        SELECT event_id, user_id,
               round(value - first_value(value) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id), 4) AS anomaly
        FROM events
      """.trim)),

    // W3 per-track segmentization via lead() (atlxi_xover.py:128-133):
    // consecutive (this, next) event pairs per user + gap length, with
    // a max-gap rule analogous to x2sys' 250 m (here: <= 1 day).
    Q("w3_lead_segments",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .withColumn("ts_us", expr("ts div 1000"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        ev.select(col("event_id"), col("user_id"), col("value"),
            lead(col("event_id"), 1).over(w).as("next_event_id"),
            lead(col("value"), 1).over(w).as("next_value"),
            (lead(col("ts_us"), 1).over(w) - col("ts_us")).as("gap_us"))
          .filter(col("gap_us").isNotNull && col("gap_us") <= lit(UsPerDay))
          .select(col("event_id"), col("user_id"),
            round(col("value"), 4).as("value"),
            col("next_event_id"),
            round(col("next_value"), 4).as("next_value"), col("gap_us"))
      },
      Some("""
        WITH seg AS (
          SELECT event_id, user_id, value,
                 lead(event_id) OVER w AS next_event_id,
                 lead(value) OVER w AS next_value,
                 lead(epoch_ns(ts) // 1000) OVER w - epoch_ns(ts) // 1000 AS gap_us
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)
        )
        SELECT event_id, user_id, round(value, 4) AS value,
               next_event_id, round(next_value, 4) AS next_value, gap_us
        FROM seg
        WHERE gap_us IS NOT NULL AND gap_us <= 86400000000
      """.trim)),

    // W4 per-group OLS slope (vizplots.py:408-418): regr_slope of
    // value on time per user, then the |slope| plot filter.
    Q("w4_group_slope",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .withColumn("t_sec", (expr("ts div 1000").cast("double")) / lit(1e6))
        ev.groupBy(col("user_id"))
          .agg(
            round(regr_slope(col("value"), col("t_sec")) * lit(86400.0), 6)
              .as("slope_per_day"),
            count(lit(1)).as("n"))
          .filter(abs(col("slope_per_day")) > lit(0.2))
      },
      Some("""
        SELECT user_id,
               round(regr_slope(value, epoch_ns(ts) // 1000 / 1e6) * 86400.0, 6)
                 AS slope_per_day,
               count(*) AS n
        FROM events
        GROUP BY user_id
        HAVING abs(round(regr_slope(value, epoch_ns(ts) // 1000 / 1e6) * 86400.0, 6)) > 0.2
      """.trim)),

    // W6 top-k per group: 3 most valuable events per type, ordered
    // deterministically (value desc, event_id asc tiebreak).
    Q("w6_topk_per_group",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value").desc, col("event_id"))
        ev.select(col("event_type"), col("event_id"), col("value"),
            row_number().over(w).as("rk"))
          .filter(col("rk") <= 3)
      },
      Some("""
        SELECT event_type, event_id, value, rk FROM (
          SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id) AS rk
          FROM events)
        WHERE rk <= 3
      """.trim)),

    // A15 argmax-row selection (atlxi_xover.py:178-180): the row with
    // max |value| per event_type via max_by on a deterministic
    // (metric, tiebreak) struct.
    Q("a15_argmax_row",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        ev.groupBy(col("event_type"))
          .agg(
            max_by(col("event_id"),
              struct(abs(col("value")), col("event_id") * lit(-1L))).as("argmax_event"),
            round(max(abs(col("value"))), 4).as("max_abs_value"))
      },
      Some("""
        SELECT event_type, event_id AS argmax_event,
               round(mx, 4) AS max_abs_value
        FROM (
          SELECT event_type, event_id,
                 max(abs(value)) OVER (PARTITION BY event_type) AS mx,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY abs(value) DESC, event_id) AS rk
          FROM events)
        WHERE rk = 1
      """.trim)),

    // A16 mean timestamp per group (vizplots.py:255-256): average of
    // µs epochs cast back to a timestamp (floor to ms for exactness).
    Q("a16_mean_timestamp",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        // floor-mean via exact integer sum/count (a double-summed avg
        // of ~1e12-scale longs can round differently across engines).
        // Sums run over OFFSETS from the epoch floor of the events
        // contract (2024-01-01): raw ~1.7e12-ms epochs overflow the
        // long sum at ~5.4M rows/group, where DuckDB's HUGEINT sum
        // keeps going — guaranteed divergence; offsets (< 2.6e9 for a
        // 30-day span) push that to ~3.5e9 rows/group. floor(base + x)
        // = base + floor(x) for integer base, so values are unchanged.
        val baseMs = 1704067200000L
        ev.groupBy(col("event_type"))
          .agg(timestamp_millis(lit(baseMs) +
            expr(s"sum(ts div 1000000 - ${baseMs}L) div count(1)")).as("mean_ts"))
      },
      Some("""
        SELECT event_type,
               make_timestamp((1704067200000 +
                 CAST(sum(epoch_ns(ts) // 1000000 - 1704067200000)
                      // count(*) AS BIGINT)) * 1000) AS mean_ts
        FROM events
        GROUP BY event_type
      """.trim))
  )
}
