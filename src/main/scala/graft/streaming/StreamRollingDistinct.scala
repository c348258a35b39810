package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling 7-day distinct users — w15's DAU/WAU board
  * computed at ingestion time, completing the batch↔streaming symmetry
  * for the one w-family operator whose aggregate does NOT decompose
  * (distinct): there is no incremental Append-mode form of a sliding
  * COUNT(DISTINCT), so the group state must BE the distinct sets.
  *
  * The batch blocking discipline carries over exactly: each event fans
  * out STATELESSLY to the ≤ [[Days]] report-day keys it serves (the
  * same bounded explode batch w15 runs — never a range join), and the
  * per-report-day state is two user-id sets (day actives ⊆ window
  * actives) — bounded by WAU, the same bound batch w15's hash agg
  * holds, never raw events. The board row (dau, wau, stickiness)
  * computes ONCE at emission, when the watermark clears the report
  * day's end and the sets can no longer grow.
  *
  * One deliberate divergence from batch w15, documented: batch clamps
  * report days to the data's observed max (a bounded dataset has a
  * last day); a stream has no "max day", so the trailing horizon days
  * (up to [[Days]]−1 past the final event) emit too as the watermark
  * closes them — with monotonically shrinking WAU. The spec compares
  * the shared range row-for-row and pins the trailing shrink.
  */
object StreamRollingDistinct {

  val Days = 7
  val DayUs: Long = 86400L * 1000000L

  case class Fan(reportDay: Long, day: Long, userId: Long,
      ts: java.sql.Timestamp)
  case class RollState(wau: Set[Long], dau: Set[Long])
  case class BoardRow(reportDay: Long, dauUsers: Long, wauUsers: Long,
      stickiness: Double)

  def update(
      reportDay: Long,
      evs: Iterator[Fan],
      state: GroupState[RollState]): Iterator[BoardRow] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(BoardRow(
        reportDay, s.dau.size.toLong, s.wau.size.toLong,
        s.dau.size.toDouble / s.wau.size.toDouble))
    } else {
      val prev = state.getOption.getOrElse(RollState(Set.empty, Set.empty))
      var wau = prev.wau
      var dau = prev.dau
      evs.foreach { e =>
        wau += e.userId
        if (e.day == reportDay) dau += e.userId
      }
      state.update(RollState(wau, dau))
      // the window [d-6, d] is complete once the watermark clears the
      // report day's end
      state.setTimeoutTimestamp((reportDay + 1) * (DayUs / 1000L))
      Iterator.empty
    }
  }

  /** events: streaming frame with (user_id, `eventTimeCol` timestamp).
    * One board row per report day, emitted at day close.
    */
  def apply(events: DataFrame, eventTimeCol: String, delay: String)
      : Dataset[BoardRow] = {
    implicit val enc = Encoders.product[BoardRow]
    implicit val senc = Encoders.product[RollState]
    events
      .withWatermark(eventTimeCol, delay)
      .select(
        expr(s"unix_micros($eventTimeCol) div $DayUs").as("day"),
        col("user_id").as("userId"),
        col(eventTimeCol).as("ts"))
      .withColumn(
        "reportDay",
        explode(sequence(col("day"), col("day") + (Days - 1))))
      .select(col("reportDay"), col("day"), col("userId"), col("ts"))
      .as[Fan](Encoders.product[Fan])
      .groupByKey(_.reportDay)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
