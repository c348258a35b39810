package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rate-anomaly scores — batch w13's spike detector turned
  * into the shape it actually ships as in production: an ALERTING
  * stream. Batch w13 is a retrospective report (global top-K scores
  * per type over the whole history); a stream has no "whole history"
  * to rank, so the twin emits EVERY closed bucket's score — `score =
  * c·K − Σ(trailing K buckets)`, the same integer excess-over-trail
  * statistic — the moment the watermark closes the bucket, and the
  * consumer thresholds or ranks downstream. The spec proves the
  * per-bucket scores equal batch w13's fold (pre-ranking) on the
  * shared range.
  *
  * Same axis contract as [[StreamGapFill]]: interior gap buckets count
  * as zeros (they are real evidence of rate change — batch's axis join
  * does exactly this), the emit frontier advances only on emission,
  * and an idle series emits nothing past its max data bucket. Scores
  * only emit once a full K-bucket trail exists (batch's
  * `trail_n = K` filter). State per key: open-bucket counts (bounded
  * by delay ÷ bucket width + the emitted-to-closed span) plus a
  * K-element ring of trailing closed counts.
  */
object StreamAnomalies {

  val BucketSec: Long = graft.queries.EventWindows.SpikeBucketSec
  val TrailBuckets: Int = graft.queries.EventWindows.SpikeTrailBuckets

  case class Ev(eventType: String, bucket: Long, ts: Timestamp)
  case class AnomState(
      nextEmit: Long, trail: Seq[Long], open: Map[Long, Long])
  case class ScoreRow(
      eventType: String, windowStart: Long, nEvents: Long,
      trailSum: Long, score: Long)

  def update(
      key: String,
      evs: Iterator[Ev],
      state: GroupState[AnomState]): Iterator[ScoreRow] = {
    var st = state.getOption.getOrElse(AnomState(-1L, Vector.empty, Map.empty))
    evs.foreach { e =>
      if (st.nextEmit == -1L || e.bucket >= st.nextEmit)
        st = st.copy(
          open = st.open + (e.bucket -> (st.open.getOrElse(e.bucket, 0L) + 1L)))
    }
    val wmSec =
      if (state.getCurrentWatermarkMs() <= 0) Long.MinValue
      else state.getCurrentWatermarkMs() / 1000L
    val closedData =
      st.open.keys.filter(b => (b + 1L) * BucketSec <= wmSec)
    val out = Vector.newBuilder[ScoreRow]
    if (closedData.nonEmpty) {
      val upTo = closedData.max
      var b = if (st.nextEmit == -1L) st.open.keys.min else st.nextEmit
      while (b <= upTo) {
        val c = st.open.getOrElse(b, 0L)
        if (st.trail.length == TrailBuckets) {
          val trailSum = st.trail.sum
          out += ScoreRow(
            key, b * BucketSec, c, trailSum, c * TrailBuckets - trailSum)
        }
        st = st.copy(
          trail = (st.trail :+ c).takeRight(TrailBuckets),
          open = st.open - b)
        b += 1L
      }
      st = st.copy(nextEmit = upTo + 1L)
    }
    state.update(st)
    st.open.keys.minOption.foreach(b =>
      state.setTimeoutTimestamp((b + 1L) * BucketSec * 1000L))
    out.result().iterator
  }

  /** events: streaming frame with (event_type, `timeCol` timestamp).
    * Emits (event_type, window_start, n_events, trail_sum, score) per
    * closed bucket with a full trailing window.
    */
  def apply(
      events: DataFrame, timeCol: String, delay: String): Dataset[ScoreRow] = {
    implicit val enc = Encoders.product[ScoreRow]
    implicit val eenc = Encoders.product[Ev]
    implicit val senc = Encoders.product[AnomState]
    implicit val kenc = Encoders.STRING
    events
      .withWatermark(timeCol, delay)
      .select(
        col("event_type").as("eventType"),
        expr(s"unix_micros($timeCol) div ${BucketSec * 1000000L}")
          .as("bucket"),
        col(timeCol).as("ts"))
      .as[Ev]
      .groupByKey(_.eventType)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update _)
  }
}
