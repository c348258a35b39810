package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming transforms (SURVEY.md §2.10): the reference's
  * S3-event-driven micro-batches map to file/stream sources; these are
  * the watermarked event-time aggregations a streaming deployment runs.
  * Input: a streaming DataFrame with (ts timestamp, user_id, event_type,
  * value). Spec-tested via MemoryStream (no SQL oracle for streams).
  */
object EventStream {

  /** Tumbling 5-minute window counts with a 10-minute watermark —
    * late data beyond the watermark is dropped, state is bounded.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding 10/5-minute windows with watermark. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("window_start"),
        col("n_events"))

  /** Session windows via the built-in session_window (30-minute gap). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))
}
