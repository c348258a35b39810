package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming linear multi-touch attribution — batch w18's ATTRIBUTION
  * STREAM form: the moment the watermark settles a purchase, its
  * in-window touches (the 30 min strictly before it) emit with their
  * exact integer ppm credits — the per-conversion feed a marketing
  * pipeline actually consumes (batch w18's touch-type report is the
  * downstream fold of exactly these rows, the w13 alerting-twin
  * argument).
  *
  * Settlement is airtight by the watermark algebra: a purchase
  * settles when wm > pus; any touch with t_us < pus either already
  * arrived or is beyond-delay late (dropped by the watermark filter),
  * so the credit set can never change after emission. Credits are
  * batch w18's integer discipline verbatim: each touch gets
  * 1000000 div n, the LATEST touch (t_us desc, tid desc) takes the
  * remainder — Σ ppm = 1,000,000 exactly per conversion.
  *
  * State per user is bounded by the algebra, not history: unsettled
  * purchases all have pus ≥ wm, so touches older than wm − 30 min can
  * never be attributed again and are pruned each trigger; purchases
  * leave state when they settle.
  */
object StreamAttribution {

  val UsPerSec = 1000000L
  /** Mirrors batch w18 (EventWindows.IntervalWindowSec). */
  val WindowUs = 1800L * UsPerSec

  case class Ev(userId: Long, tus: Long, eventId: Long, eventType: String,
      ts: Timestamp)
  case class Touch(tus: Long, tid: Long, touchType: String)
  case class Purch(pus: Long, pid: Long)
  case class AttrState(touches: Seq[Touch], pending: Seq[Purch])
  case class CreditRow(
      userId: Long, pid: Long, tid: Long, touchType: String, ppm: Long)

  def update(
      key: Long,
      evs: Iterator[Ev],
      state: GroupState[AttrState]): Iterator[CreditRow] = {
    var st = state.getOption.getOrElse(AttrState(Vector.empty, Vector.empty))
    evs.foreach { e =>
      e.eventType match {
        case "purchase" =>
          st = st.copy(pending = st.pending :+ Purch(e.tus, e.eventId))
        case "view" | "click" =>
          st = st.copy(
            touches = st.touches :+ Touch(e.tus, e.eventId, e.eventType))
        case _ => // other event types carry no attribution role
      }
    }
    val wmUs =
      if (state.getCurrentWatermarkMs() <= 0) Long.MinValue
      else state.getCurrentWatermarkMs() * 1000L
    val (settled, pending) = st.pending.partition(_.pus < wmUs)
    val out = Vector.newBuilder[CreditRow]
    settled.sortBy(p => (p.pus, p.pid)).foreach { p =>
      val win = st.touches
        .filter(t => t.tus < p.pus && t.tus >= p.pus - WindowUs)
      if (win.nonEmpty) {
        val n = win.size.toLong
        val latest = win.maxBy(t => (t.tus, t.tid))
        win.foreach { t =>
          val ppm = 1000000L / n +
            (if (t == latest) 1000000L % n else 0L)
          out += CreditRow(key, p.pid, t.tid, t.touchType, ppm)
        }
      }
    }
    // touches older than wm − window can never serve a future
    // purchase (all unsettled purchases have pus ≥ wm)
    val keepFrom = if (wmUs == Long.MinValue) Long.MinValue else wmUs - WindowUs
    st = AttrState(st.touches.filter(_.tus >= keepFrom), pending)
    state.update(st)
    pending.map(_.pus).minOption.foreach(t =>
      state.setTimeoutTimestamp(t / 1000L + 1L))
    out.result().iterator
  }

  /** events: streaming frame with (user_id, event_id, event_type,
    * `timeCol` timestamp). Emits one row per (settled purchase,
    * in-window touch): (user_id, pid, tid, touch_type, ppm) — batch
    * w18's pre-report rows with Σ ppm = 10⁶ per conversion.
    */
  def apply(
      events: DataFrame, timeCol: String, delay: String): Dataset[CreditRow] = {
    implicit val enc = Encoders.product[CreditRow]
    implicit val eenc = Encoders.product[Ev]
    implicit val senc = Encoders.product[AttrState]
    implicit val kenc = Encoders.scalaLong
    events
      .withWatermark(timeCol, delay)
      .select(
        col("user_id").as("userId"),
        expr(s"unix_micros($timeCol)").as("tus"),
        col("event_id").as("eventId"),
        col("event_type").as("eventType"),
        col(timeCol).as("ts"))
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update _)
  }
}
