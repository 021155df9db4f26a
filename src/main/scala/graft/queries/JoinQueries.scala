package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TemporalJoins

/** Temporal-join operators over the `events` table: backward as-of
  * join (point-in-time enrichment) and bucketed interval join. Both
  * oracle-checked — the as-of oracle uses DuckDB's NATIVE `ASOF LEFT
  * JOIN`, a fully independent formulation of the same semantics, so
  * the hash gate pins the union+window dataflow against a second
  * engine's dedicated operator.
  */
object JoinQueries extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // For every click, the user's most recent purchase at-or-before
    // the click (ties match), LEFT semantics for never-purchased
    // users. Both engines match on the SAME µs-truncated long axis
    // (DuckDB's parquet reader truncates TIMESTAMP(NANOS) to µs, so a
    // ns-precision Spark axis would diverge in the last three digits).
    Q("j9_asof_join",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .withColumn("ts_us", expr("ts div 1000"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("value").as("click_value"))
        // dedupe to one purchase per (user, µs): µs truncation could
        // collapse two ns-distinct purchases onto one key, where the
        // asof precondition (unique right timestamps) breaks and each
        // engine would pick an arbitrary row; max(value) makes the
        // representative deterministic in both
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts_us"))
          .agg(max(col("value")).as("purchase_value"))
        TemporalJoins.asofBackward(clicks, purchases, "user_id", "ts_us",
            Seq("purchase_value"))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("click_value"),
            col("matched_ts_us"),
            col("matched_purchase_value").as("purchase_value"))
      },
      Some("""
        WITH l AS (
          SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
                 value AS click_value
          FROM events WHERE event_type = 'click'),
        r AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS ts_us,
                 max(value) AS purchase_value
          FROM events WHERE event_type = 'purchase'
          GROUP BY 1, 2)
        SELECT l.event_id, l.user_id, l.ts_us, l.click_value,
               r.ts_us AS matched_ts_us, r.purchase_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
      """.trim)),

    // Events vs 40 OVERLAPPING [start, start+23h) maintenance windows
    // striding 17h across the month — each event can land in up to two
    // windows, exercising the overlap path of the bucket scheme
    // (bucketWidth 24h >= interval length). Output is exact integer
    // moments only (counts + floor-sum), immune to float sum order.
    Q("j10_interval_join",
      (s, dir) => {
        val base = 1704067200000000000L // 2024-01-01T00:00:00Z in ns
        val strideNs = 61200000000000L // 17 h
        val lenNs = 82800000000000L // 23 h
        val iv = s.range(40).select(
          col("id").as("interval_id"),
          (lit(base) + col("id") * lit(strideNs)).as("start_ns"),
          (lit(base) + col("id") * lit(strideNs) + lit(lenNs)).as("end_ns"))
        val ev = Tables(s, dir, "events")
          .select(col("ts"), col("user_id"), col("value"))
        TemporalJoins.intervalJoin(ev, iv, "ts", "start_ns", "end_ns",
            bucketWidth = 86400000000000L) // 24 h
          .groupBy(col("interval_id"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            sum(floor(col("value"))).as("sum_floor_value"))
      },
      Some("""
        WITH iv AS (
          SELECT i AS interval_id,
                 1704067200000000000 + i * 61200000000000 AS start_ns,
                 1704067200000000000 + i * 61200000000000
                   + 82800000000000 AS end_ns
          FROM generate_series(0, 39) AS t(i)),
        e AS (
          SELECT epoch_ns(ts) AS ts_ns, user_id, value FROM events)
        SELECT iv.interval_id,
               count(*) AS n_events,
               count(DISTINCT e.user_id) AS n_users,
               CAST(sum(CAST(floor(e.value) AS BIGINT)) AS BIGINT)
                 AS sum_floor_value
        FROM e JOIN iv
          ON e.ts_ns >= iv.start_ns AND e.ts_ns < iv.end_ns
        GROUP BY 1
      """.trim))
  )
}
