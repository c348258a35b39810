package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 maintenance — batch w21 computed at ingestion time:
  * each user's event-type stream folds into versioned validity
  * intervals AS EVENTS ARRIVE, emitting a version row the moment the
  * interval CLOSES (a type change at a watermark-settled position).
  * This is the dimension-update path a warehouse actually runs —
  * row-at-a-time MERGE replaced by bounded per-key state.
  *
  * Correctness under shuffled arrival: SCD2 is order-sensitive (a
  * run's membership depends on its neighbours), so events buffer in
  * state until the watermark passes them, then drain IN (tus,
  * event_id) ORDER — only settled prefixes fold into versions, so a
  * late-but-in-delay event slots into its true position. State per
  * user = the unsettled suffix (bounded by the watermark delay ×
  * event rate) + the open version's (type, start, count, index) —
  * the open version itself stays in state (append mode cannot revise
  * rows) and emits only when a type change closes it; `is_current`
  * is therefore implicit: a version is current until its closing row
  * appears downstream.
  */
object StreamScd2 {

  case class Ev(userId: Long, tus: Long, eventId: Long, eventType: String,
      ts: Timestamp)
  case class OpenVer(version: Long, eventType: String, fromUs: Long, n: Long)
  case class Scd2State(buffer: Seq[Ev], open: Option[OpenVer])
  case class VersionRow(
      userId: Long, version: Long, eventType: String,
      validFromUs: Long, validToUs: Long, nEvents: Long)

  def update(
      key: Long,
      evs: Iterator[Ev],
      state: GroupState[Scd2State]): Iterator[VersionRow] = {
    var st = state.getOption.getOrElse(Scd2State(Vector.empty, None))
    st = st.copy(buffer = st.buffer ++ evs)
    val wmUs =
      if (state.getCurrentWatermarkMs() <= 0) Long.MinValue
      else state.getCurrentWatermarkMs() * 1000L
    val (settled, pending) = st.buffer.partition(_.tus < wmUs)
    val out = Vector.newBuilder[VersionRow]
    var open = st.open
    settled.sortBy(e => (e.tus, e.eventId)).foreach { e =>
      open match {
        case Some(o) if o.eventType == e.eventType =>
          open = Some(o.copy(n = o.n + 1L))
        case Some(o) =>
          out += VersionRow(
            key, o.version, o.eventType, o.fromUs, e.tus, o.n)
          open = Some(OpenVer(o.version + 1L, e.eventType, e.tus, 1L))
        case None =>
          open = Some(OpenVer(1L, e.eventType, e.tus, 1L))
      }
    }
    st = Scd2State(pending, open)
    state.update(st)
    // wake when the watermark settles the earliest pending event
    pending.map(_.tus).minOption.foreach(t =>
      state.setTimeoutTimestamp(t / 1000L + 1L))
    out.result().iterator
  }

  /** events: streaming frame with (user_id, event_id, event_type,
    * `timeCol` timestamp). Emits one row per CLOSED version:
    * (user_id, version, event_type, valid_from_us, valid_to_us,
    * n_events) — batch w21's row shape minus the open version (which
    * has no valid_to yet; it is exactly the rows batch marks
    * `is_current`).
    */
  def apply(
      events: DataFrame, timeCol: String, delay: String): Dataset[VersionRow] = {
    implicit val enc = Encoders.product[VersionRow]
    implicit val eenc = Encoders.product[Ev]
    implicit val senc = Encoders.product[Scd2State]
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
