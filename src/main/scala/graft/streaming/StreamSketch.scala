package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming approximate-distinct — x11 (HLL++) at ingestion time,
  * completing the sketch family's batch↔streaming symmetry the same
  * way w14/w15/w16 twins did for the window family: per (day,
  * event_type) window, the approximate distinct-user count.
  *
  * This is exactly the case where a sketch is the ONLY bounded-state
  * answer on a stream: exact windowed COUNT(DISTINCT) is not
  * expressible in streaming Append mode without keeping the full
  * distinct set per open window (the StreamRollingDistinct twin pays
  * that deliberately for its exactness contract); HLL++ state is a
  * fixed-size mergeable register array per group — micro-batch
  * partials merge associatively, late rows inside the watermark fold
  * in, and the window emits once when the watermark closes it.
  *
  * Like x11/p10, the estimate's bit layout is engine-private, so the
  * contract is spec'd (emission timing + the family's 10% error bound
  * against the exact batch fold) rather than hash-checked.
  */
object StreamSketch {

  val WindowLength = "1 day"

  /** events: streaming frame with (user_id, `timeCol` timestamp,
    * event_type). Emits one row per closed (day, type) window.
    */
  def approxDistinctUsers(
      events: DataFrame, timeCol: String, delay: String): DataFrame =
    events
      .withWatermark(timeCol, delay)
      .groupBy(window(col(timeCol), WindowLength), col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))
      .select(
        col("window.start").as("day_start"),
        col("event_type"),
        col("approx_users"))
}
