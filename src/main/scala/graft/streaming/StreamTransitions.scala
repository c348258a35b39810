package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming session transition matrix — w14's semantics (immediate
  * same-user successions within the session gap) computed at ingestion
  * time, extending the batch↔streaming symmetry w8/w9/w10 established
  * to the path-discovery operator.
  *
  * The hard part is that "next event" is an EVENT-TIME notion while
  * micro-batches arrive in PROCESSING order: a pair (a → b) consecutive
  * in today's buffer is torn apart if a later micro-batch delivers an
  * event between them. So a succession is emitted only once it is
  * FINAL — when the watermark has passed the LATER event's time, at
  * which point nothing can land between the two (any such arrival
  * would be behind the watermark; late-beyond-watermark rows are
  * dropped on entry, the standard lateness policy, and equal-timestamp
  * arrivals at exactly the watermark are held one round by the strict
  * `<` finality test). Emitted pairs leave the buffer, with the LAST
  * emitted event retained as the predecessor for the next pair —
  * so every adjacent pair is emitted exactly once.
  *
  * Bounded state: the per-user buffer holds only events at or above
  * the current watermark plus that one predecessor — the watermark
  * horizon, the same bound the interval join keeps; never user
  * lifetime. The predecessor itself is retained until the watermark
  * passes its SESSION-GAP horizon (pred.tus + GapUs): a user quiet
  * for longer than the watermark delay but shorter than the gap can
  * still produce the pair out of that event, so dropping it at the
  * bare watermark would silently undercount vs batch w14. Counts are NOT kept in state at all: the operator emits
  * individual transitions and the downstream aggregation (a plain
  * streaming `groupBy(from, to).count`, or the batch fold in the spec)
  * owns the matrix — the same separation batch w14 has between its
  * window pass and its hash agg.
  */
object StreamTransitions {

  /** Same session gap as batch w14/w3 (`EventWindows.SessionGapSec`). */
  val GapUs: Long = graft.queries.EventWindows.SessionGapSec * 1000000L

  case class Ev(userId: Long, ts: java.sql.Timestamp, eventId: Long,
      eventType: String)
  case class BufEv(tus: Long, eventId: Long, eventType: String)
  case class Buf(events: List[BufEv])
  case class Trans(userId: Long, fromType: String, toType: String,
      fromTus: Long, toTus: Long)

  def update(
      userId: Long,
      evs: Iterator[Ev],
      state: GroupState[Buf]): Iterator[Trans] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val prev =
      if (state.hasTimedOut) state.get.events
      else state.getOption.map(_.events).getOrElse(Nil)
    // drop late-beyond-watermark arrivals — with EventTimeTimeout Spark
    // already filters them before invoking this function, so this is
    // defense-in-depth, not load-bearing; ordering key (tus, eventId)
    // is unique — the same deterministic order batch w14's window uses
    val incoming = evs
      .map(e => BufEv(e.ts.getTime * 1000L, e.eventId, e.eventType))
      .filter(_.tus >= wmUs)
    val all = (prev ++ incoming).distinct
      .sortBy(e => (e.tus, e.eventId))
    // pairs whose LATER event is strictly behind the watermark are
    // final; k = index of the last final event
    val k = all.lastIndexWhere(_.tus < wmUs)
    val out = (1 to k).iterator
      .map(i => (all(i - 1), all(i)))
      .filter { case (a, b) => b.tus - a.tus <= GapUs }
      .map { case (a, b) =>
        Trans(userId, a.eventType, b.eventType, a.tus, b.tus) }
      .toList
    val rest = if (k >= 0) all.drop(k) else all
    // A lone buffered event (the emitted predecessor, or a single
    // not-yet-paired event) can still pair with a FUTURE arrival as
    // long as an in-gap timestamp at-or-above the watermark exists:
    // future rows have tus >= wmUs, so only once wmUs > pred.tus +
    // GapUs is the pair impossible and the state safe to drop. A user
    // quiet for longer than the watermark delay but shorter than the
    // session gap must NOT lose the transition out of their last event.
    if (rest.isEmpty ||
        (rest.length == 1 && wmUs > rest.head.tus + GapUs)) {
      if (state.exists) state.remove()
    } else {
      state.update(Buf(rest))
      // wake when the watermark passes the newest buffered event (so
      // tail pairs emit even if the user goes quiet); once only the
      // predecessor remains, wake when its session gap fully expires —
      // that firing takes the remove branch above. Clamped above the
      // current watermark — Spark rejects a timeout behind it.
      val wakeUs =
        if (rest.length == 1) rest.head.tus + GapUs + 1000L
        else rest.map(_.tus).max + 1000L
      state.setTimeoutTimestamp(
        math.max(wakeUs / 1000L, wmUs / 1000L + 1L))
    }
    out.iterator
  }

  /** events: streaming frame with (user_id, `eventTimeCol` timestamp,
    * event_id, event_type). Emits each finalized same-session
    * succession exactly once.
    */
  def apply(events: DataFrame, eventTimeCol: String, delay: String)
      : Dataset[Trans] = {
    implicit val enc = Encoders.product[Trans]
    implicit val senc = Encoders.product[Buf]
    events
      .withWatermark(eventTimeCol, delay)
      .select(
        col("user_id").as("userId"),
        col(eventTimeCol).as("ts"),
        col("event_id").as("eventId"),
        col("event_type").as("eventType"))
      .as[Ev](Encoders.product[Ev])
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
