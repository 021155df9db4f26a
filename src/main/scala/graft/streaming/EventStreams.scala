package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One closed user session: emitted when no event arrives for the
  * session gap (decided by event-time timeout against the watermark).
  */
case class UserSession(
    user_id: Long, start_ms: Long, end_ms: Long, n_events: Int)

/** Open-session state carried between micro-batches. */
case class SessionState(start_ms: Long, last_ms: Long, n: Int)

/** Structured Streaming re-expression of the engine's batch window
  * family (SURVEY.md §2.10 extension): the same tumbling/sliding
  * aggregations that power W1/M4 in batch, driven by event time with
  * watermarked state cleanup. The input contract matches the `events`
  * table: (ts_utc timestamp, user_id long, event_type string, value
  * double).
  */
object EventStreams {

  /** Tumbling event-time window aggregate with watermark: counts and
    * exact integer value moments per (window, event_type). State for
    * windows older than the watermark is dropped — bounded state at
    * any rate. Moments, not round(avg(double), 4): a pane mean can
    * land exactly on a 4dp half, where Spark's shortest-decimal
    * HALF_UP and a relational oracle's binary rounding split (the
    * 22.86125 incident documented at stream_sliding_means).
    */
  def tumblingStats(events: DataFrame, windowLen: String = "1 day",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(window(col("ts_utc"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value") * 100)).cast("long").as("sum_cents"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_cents"))

  /** Sliding-window variant (window/slide) — the streaming analogue of
    * the 91-day trailing range window (W1).
    */
  def slidingMean(events: DataFrame, windowLen: String = "2 days",
      slide: String = "1 day", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(window(col("ts_utc"), windowLen, slide), col("user_id"))
      .agg(round(avg(col("value")), 4).as("roll_mean"), count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("user_id"), col("roll_mean"), col("n"))

  /** Streaming exact dedup — the online half of the batch dedup family
    * (llm_exact_dedup): drop events whose dedup key was already seen
    * within the watermark horizon. State is bounded: keys older than
    * the watermark are evicted, so an unbounded stream can't grow the
    * dedup table forever — the semantics a 100 TB ingest pipeline
    * needs (exactly-once per key per horizon, not per all-time).
    */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment join + windowed aggregate — the shape
    * every production event pipeline runs: a high-rate stream joined
    * to a slowly-changing dimension, then aggregated. The static side
    * is broadcast into EVERY micro-batch (no stream-side shuffle for
    * the join, no state), so the join cost is O(batch) regardless of
    * stream history; only the downstream windowed aggregate keeps
    * watermark-bounded state. At 100 TB/day the dimension table is the
    * broadcast-able side by contract — a dimension too big to
    * broadcast would instead pre-bucket both sides.
    */
  def enrichedStats(events: DataFrame, dim: DataFrame, streamKey: String,
      dimKey: String, dimAttr: String, watermark: String = "1 hour")
      : DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .join(broadcast(dim.select(col(dimKey), col(dimAttr))),
        col(streamKey) === col(dimKey))
      .groupBy(window(col("ts_utc"), "1 day"), col(dimAttr),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value") * 100)).cast("long").as("sum_cents"))
      .select(col("window.start").as("w_start"), col(dimAttr),
        col("event_type"), col("n"), col("sum_cents"))

  /** Stream-stream event-time interval join — correlate two live
    * streams on a key within a bounded lag (right in [left, left +
    * maxLag]): the attribution shape (view -> purchase within N
    * hours). Both sides carry watermarks and the join condition
    * bounds event-time distance, so Spark evicts join state older
    * than watermark + lag on each side — bounded state on an
    * UNBOUNDED pair of streams, which is what distinguishes this from
    * a stream-static join (no state) and from an unconstrained
    * stream-stream join (unbounded state, rejected by the engine).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      maxLag: String = "6 hours", watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts_utc", watermark)
      .select(col(key).as("l_key"), col("ts_utc").as("l_ts"),
        col("value").as("l_value"))
    val r = right.withWatermark("ts_utc", watermark)
      .select(col(key).as("r_key"), col("ts_utc").as("r_ts"),
        col("value").as("r_value"))
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxLag"))
  }

  /** Gap-based sessionization — the custom-state member of the
    * streaming family (`flatMapGroupsWithState` with EVENT-TIME
    * timeout): per user, events closer than `gapMs` coalesce into one
    * session; a session closes when the watermark passes its last
    * event + gap (timeout fires) OR when a later in-batch event
    * arrives beyond the gap. State per key is O(1) (start, last,
    * count) and is evicted on close — bounded at any stream rate,
    * exactly the contract a 100 TB event stream needs.
    */
  def sessionize(
      events: DataFrame, gapMs: Long = 30L * 60 * 1000,
      watermark: String = "1 hour"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts_utc", watermark)
      .select(col("user_id").cast("long"), col("ts_utc"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last event + gap: close and evict
            val s = state.get
            state.remove()
            Iterator.single(UserSession(user, s.start_ms, s.last_ms, s.n))
          } else {
            // fold this batch's events (sorted by event time) into the
            // open session; in-batch gaps close intermediate sessions.
            // Out-of-order events land in one of three regimes relative
            // to the open session [start, last]:
            //  - within gap of [start-gap, last+gap]: merge (extending
            //    backward via math.min when they predate start);
            //  - MORE than gap before start: they belong to a separate
            //    EARLIER session — accumulate them in `late` (they are
            //    sorted, so late sessions build left to right) and, if
            //    a later event bridges within gap of both `late` and
            //    the open session, merge all three. `late` closes at
            //    batch end: with O(1) state only one open session can
            //    carry across batches, so a far-late session is final
            //    once its batch ends (best effort, bounded state —
            //    previously these events were silently MERGED into the
            //    open session across an arbitrarily large gap);
            //  - more than gap after last: close the open session.
            val ts = rows.map(_._2.getTime).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[UserSession]
            var cur = state.getOption
            var late: Option[SessionState] = None
            def closeLate(): Unit = {
              late.foreach(l => closed += UserSession(user, l.start_ms, l.last_ms, l.n))
              late = None
            }
            ts.foreach { t =>
              cur match {
                case Some(s) if t >= s.start_ms - gapMs && t - s.last_ms <= gapMs =>
                  late match {
                    case Some(l) if t - l.last_ms <= gapMs =>
                      // t bridges the late session and the open one
                      cur = Some(SessionState(
                        math.min(l.start_ms, math.min(s.start_ms, t)),
                        math.max(s.last_ms, t), s.n + l.n + 1))
                      late = None
                    case _ =>
                      closeLate()
                      cur = Some(SessionState(math.min(s.start_ms, t),
                        math.max(s.last_ms, t), s.n + 1))
                  }
                case Some(s) if t < s.start_ms - gapMs =>
                  late match {
                    case Some(l) if t - l.last_ms <= gapMs =>
                      late = Some(SessionState(math.min(l.start_ms, t),
                        math.max(l.last_ms, t), l.n + 1))
                    case _ =>
                      closeLate()
                      late = Some(SessionState(t, t, 1))
                  }
                case Some(s) =>
                  closeLate()
                  closed += UserSession(user, s.start_ms, s.last_ms, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            closeLate()
            cur.foreach { s =>
              state.update(s)
              // close when event time reaches last + gap
              state.setTimeoutTimestamp(s.last_ms + gapMs)
            }
            closed.iterator
          }
      }
  }
}