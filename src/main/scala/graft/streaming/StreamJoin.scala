package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join (SURVEY §2.10) — the streaming
  * counterpart of the batch AS-OF attribution query (w4): purchases
  * joined to same-user clicks within a bounded look-back interval.
  *
  * Exact as-of ("the single latest click") needs totally-ordered state
  * per user; the streaming-native relaxation is the interval join —
  * every click within the attribution window — which Spark executes
  * with watermark-bounded join state on BOTH sides: a click older than
  * the watermark + interval can never match a future purchase and its
  * state is reclaimed. Without the time-range predicate the join state
  * would grow without bound — the interval is what makes this run
  * forever on an unbounded stream.
  */
object StreamJoin {

  /** Stream-static enrichment join — the most common streaming join in
    * practice: an unbounded event stream joined to a bounded dimension
    * (the reference's podcast/episode lookups, E7, applied to a
    * stream). Stream-static joins are STATELESS on the stream side —
    * no watermark, no join state to bound, because the static side is
    * re-resolved per micro-batch; with the dim `broadcast()` each
    * micro-batch is a map-side hash join, the same no-shuffle shape J1
    * has in batch. Left join keeps unmatched events (a dim miss must
    * not DROP stream rows — late dimension arrivals are the norm).
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** @param clicks    streaming (c_ts timestamp, c_user, click_id)
    * @param purchases streaming (p_ts timestamp, p_user, purchase_id)
    * @param lookback  attribution interval, e.g. "30 minutes"
    * @param delay     watermark delay for late data, e.g. "10 minutes"
    */
  def clickAttribution(
      clicks: DataFrame,
      purchases: DataFrame,
      lookback: String,
      delay: String): DataFrame = {
    val c = clicks.withWatermark("c_ts", delay)
    val p = purchases.withWatermark("p_ts", delay)
    p.join(
      c,
      expr(
        s"""p_user = c_user AND
            c_ts <= p_ts AND
            c_ts >= p_ts - interval $lookback"""))
      .select(
        col("p_user").as("user_id"),
        col("purchase_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
  }
}
