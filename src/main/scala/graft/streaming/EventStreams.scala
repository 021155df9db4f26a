package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming re-expression of the engine's batch window
  * family (SURVEY.md §2.10 extension): the same tumbling/sliding
  * aggregations that power W1/M4 in batch, driven by event time with
  * watermarked state cleanup. The input contract matches the `events`
  * table: (ts_utc timestamp, user_id long, event_type string, value
  * double).
  */
object EventStreams {

  /** Tumbling event-time window aggregate with watermark: counts and
    * mean value per (window, event_type). State for windows older
    * than the watermark is dropped — bounded state at any rate.
    */
  def tumblingStats(events: DataFrame, windowLen: String = "1 day",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(window(col("ts_utc"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("avg_value"))

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
}
