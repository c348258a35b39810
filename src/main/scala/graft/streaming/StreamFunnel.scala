package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming windowed conversion funnel — w8's semantics (strict-order
  * view → click → purchase, anchored at the user's FIRST view,
  * completing within `WindowUs` of it) computed at ingestion time.
  * One Flag per user, emitted when the user goes quiet past the
  * watermark (event-time timeout) — the point at which the anchor
  * can no longer move and the stage is final.
  *
  * Out-of-order safety: a greedy "set t1 when a view arrives" state
  * machine silently miscounts when a click's view arrives in a later
  * micro-batch. Instead the state keeps exactly what the batch fold
  * needs — min view time t1 plus the candidate click/purchase time
  * lists — and the stage rule (t2 = min click in (t1, t1+W], t3 = min
  * purchase in (t2, t1+W]) runs ONCE at emission over that state, so
  * arrival order cannot change the answer (`StreamFunnelSpec` pins
  * streaming ≡ batch on shuffled arrivals).
  *
  * Bounded state: t1 only ever DECREASES as late views arrive, so the
  * window (t1, t1+W] only moves left — a step time above the current
  * t1+W can never become relevant again and is pruned on every
  * invocation; below t1 it may (a later, earlier view), so it stays.
  * Per-user state ≈ the user's step times inside one window span —
  * the same state a windowFunnel engine keeps — never raw events.
  */
object StreamFunnel {

  val WindowUs: Long = 86400L * 1000000L

  case class Ev(userId: Long, ts: java.sql.Timestamp, eventType: String)
  case class FunnelState(t1: Long, clicks: List[Long], purchases: List[Long])
  case class Flag(userId: Long, stage: Int)

  private val NoView = Long.MaxValue

  def update(
      userId: Long,
      evs: Iterator[Ev],
      state: GroupState[FunnelState]): Iterator[Flag] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(Flag(userId, stageOf(s)))
    } else {
      val prev = state.getOption.getOrElse(FunnelState(NoView, Nil, Nil))
      var t1 = prev.t1
      var clicks = prev.clicks
      var purchases = prev.purchases
      var maxTs = Long.MinValue
      evs.foreach { e =>
        val us = e.ts.getTime * 1000L
        maxTs = math.max(maxTs, e.ts.getTime)
        e.eventType match {
          case "view"     => t1 = math.min(t1, us)
          case "click"    => clicks ::= us
          case "purchase" => purchases ::= us
          case _          => ()
        }
      }
      // t1 only decreases ⇒ (t1, t1+W] only moves left ⇒ anything
      // above the current right edge is dead forever
      if (t1 != NoView) {
        clicks = clicks.filter(_ <= t1 + WindowUs)
        purchases = purchases.filter(_ <= t1 + WindowUs)
      }
      state.update(FunnelState(t1, clicks, purchases))
      state.setTimeoutTimestamp(maxTs, "1 minute")
      Iterator.empty
    }
  }

  def stageOf(s: FunnelState): Int =
    if (s.t1 == NoView) 0
    else {
      val t2 = s.clicks.filter(c => c > s.t1 && c <= s.t1 + WindowUs)
        .sorted.headOption
      val t3 = t2.flatMap(t =>
        s.purchases.filter(p => p > t && p <= s.t1 + WindowUs)
          .sorted.headOption)
      if (t3.isDefined) 3 else if (t2.isDefined) 2 else 1
    }

  /** events: streaming frame with (user_id, `eventTimeCol` timestamp,
    * event_type). One Flag per user once quiet past the watermark.
    */
  def apply(events: DataFrame, eventTimeCol: String, delay: String): Dataset[Flag] = {
    implicit val enc = Encoders.product[Flag]
    implicit val senc = Encoders.product[FunnelState]
    events
      .withWatermark(eventTimeCol, delay)
      .select(
        col("user_id").as("userId"),
        col(eventTimeCol).as("ts"),
        col("event_type").as("eventType"))
      .as[Ev](Encoders.product[Ev])
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
