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

  /** w6's streaming twin — OHLC resampling on an unbounded stream:
    * per (event_type, 5-minute window) first/last/min/max of the cents
    * series, with a 10-minute watermark bounding state. The SAME
    * formulation argument as batch w6: open/close are `min_by`/`max_by`
    * in the ONE watermarked hash aggregate (partial-merge capable, so
    * map-side combine still applies per micro-batch) — a ranking-window
    * form isn't even expressible on a stream, which is the strongest
    * version of the "don't sort every event" point.
    *
    * Ordering key: same packed BIGINT as batch w6 (µs offset within
    * the bucket × 2^30 + event_id, overflow-checked) — deterministic
    * open/close under any micro-batch arrival order.
    * Input: (ts timestamp, event_id long, event_type string, value).
    */
  def ohlcResample(events: DataFrame): DataFrame = {
    val usPerBucket = 5L * 60 * 1000 * 1000
    val idBase = 1073741824L // 2^30, batch w6's OhlcIdBase
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("bus", expr(s"tus div $usPerBucket") * usPerBucket)
      .withColumn("okey",
        when(col("event_id") < idBase,
          (col("tus") - col("bus")) * idBase + col("event_id"))
          .otherwise(raise_error(lit(
            "streaming w6: event_id >= 2^30 overflows the packed OHLC " +
              "ordering key - widen the base or use a struct key"))
            .cast("long")))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        min_by(col("cents"), col("okey")).as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max_by(col("cents"), col("okey")).as("close_cents"))
      .select(
        col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("open_cents"), col("high_cents"),
        col("low_cents"), col("close_cents"))
  }

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
