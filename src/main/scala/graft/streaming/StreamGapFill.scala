package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-fill resample — batch w7 computed at ingestion time:
  * per event_type, 5-minute buckets emit (n_events, is_gap,
  * carry_cents) rows IN BUCKET ORDER, with zero-rows filled in for
  * empty buckets and the last non-gap sum carried forward — the
  * monitoring-dashboard shape ("show every interval, flat-line through
  * silence") that a plain windowed aggregation cannot produce, because
  * an aggregation only emits buckets that HAVE input.
  *
  * Emission contract (= batch w7 on the shared range): a bucket emits
  * once the watermark closes it, and gap rows emit only BETWEEN data
  * buckets — the axis runs min..max of observed buckets per key, so an
  * idle series emits nothing until a later data bucket closes, at
  * which point the elapsed gap run emits in one burst (exactly the
  * rows batch's per-key sequence() axis would produce). This is the
  * same explicit trailing-edge contract StreamRollingDistinct
  * documents, in the opposite direction: no trailing filler.
  *
  * State per key: the (count, cents) aggregates of buckets still open
  * (bounded by the watermark delay ÷ bucket width, plus buckets
  * between the last emitted and the newest closed — the same span
  * batch materializes as its axis), the next bucket to emit, and one
  * carry value. Event-time timeouts flush closable buckets for keys
  * receiving no new input.
  */
object StreamGapFill {

  val TumbleSec: Long = graft.queries.EventWindows.TumbleSec // w7's bucket

  case class Ev(eventType: String, bucket: Long, cents: Long,
      ts: Timestamp)
  case class GapState(
      nextEmit: Long, carry: Long, hasCarry: Boolean,
      open: Map[Long, (Long, Long)])
  case class FillRow(
      eventType: String, windowStart: Long, nEvents: Long,
      isGap: Boolean, carryCents: Long)

  def update(
      key: String,
      evs: Iterator[Ev],
      state: GroupState[GapState]): Iterator[FillRow] = {
    var st = state.getOption.getOrElse(GapState(-1L, 0L, false, Map.empty))
    evs.foreach { e =>
      // the frontier (nextEmit) only advances on EMISSION — any bucket
      // at or past it may still receive arrivals (watermark-legal
      // shuffled order). A bucket BEHIND an emitted frontier is
      // source-watermark-filtered in every non-degenerate config;
      // guard anyway (re-emitting a published bucket would be worse
      // than dropping).
      if (st.nextEmit == -1L || e.bucket >= st.nextEmit) {
        val (n, c) = st.open.getOrElse(e.bucket, (0L, 0L))
        st = st.copy(open = st.open + (e.bucket -> (n + 1L, c + e.cents)))
      }
    }
    val wmSec =
      if (state.getCurrentWatermarkMs() <= 0) Long.MinValue
      else state.getCurrentWatermarkMs() / 1000L
    // newest DATA bucket the watermark has closed: gap rows only emit
    // up to it (the batch axis ends at the per-key max)
    val closedData = st.open.keys.filter(b => b + TumbleSec <= wmSec)
    val out = Vector.newBuilder[FillRow]
    if (closedData.nonEmpty) {
      val upTo = closedData.max
      // the axis starts at the key's min data bucket, lazily: frontier
      // is unset until the first emission
      var b = if (st.nextEmit == -1L) st.open.keys.min else st.nextEmit
      while (b <= upTo) {
        st.open.get(b) match {
          case Some((n, cents)) =>
            st = st.copy(
              carry = cents, hasCarry = true, open = st.open - b)
            out += FillRow(key, b, n, isGap = false, cents)
          case None =>
            out += FillRow(key, b, 0L, isGap = true, st.carry)
        }
        b += TumbleSec
      }
      st = st.copy(nextEmit = upTo + TumbleSec)
    }
    state.update(st)
    // flush the next closable data bucket even if this key goes quiet
    st.open.keys.minOption.foreach(b =>
      state.setTimeoutTimestamp((b + TumbleSec) * 1000L))
    out.result().iterator
  }

  /** events: streaming frame with (event_type, `timeCol` timestamp,
    * value double). Emits w7's row shape per closed bucket:
    * (event_type, window_start, n_events, is_gap, carry_cents).
    */
  def apply(
      events: DataFrame, timeCol: String, delay: String): Dataset[FillRow] = {
    implicit val enc = Encoders.product[FillRow]
    implicit val eenc = Encoders.product[Ev]
    implicit val senc = Encoders.product[GapState]
    implicit val kenc = Encoders.STRING
    events
      .withWatermark(timeCol, delay)
      .select(
        col("event_type").as("eventType"),
        (expr(s"unix_micros($timeCol) div ${TumbleSec * 1000000L}")
          * TumbleSec).as("bucket"),
        round(col("value") * 100).cast("long").as("cents"),
        col(timeCol).as("ts"))
      .as[Ev]
      .groupByKey(_.eventType)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update _)
  }
}
