package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming top-N per group — w10's semantics (top 3 users by event
  * count per (event_type, day)) computed at ingestion time, completing
  * the batch↔streaming symmetry the funnel (w8/StreamFunnel) and
  * retention (w9/StreamRetention) pairs established.
  *
  * Native streaming aggregation cannot rank ("row_number over an
  * unbounded stream" has no incremental form in Append mode), so the
  * group state IS the leaderboard input: per (event_type, day) key, a
  * user → count map that each micro-batch folds into — exactly the
  * per-group hash-aggregate state batch w10 holds, bounded by DISTINCT
  * USERS per (type, day), never raw events. The top-3 sort runs ONCE
  * at emission, when the watermark passes the day's end and the counts
  * can no longer change — so arrival order cannot change the answer
  * (spec pins streaming ≡ the batch fold on shuffled arrivals).
  *
  * Emission is event-time-timed to the DAY BOUNDARY (not the group's
  * last event): a day-bucketed group is final when the watermark
  * clears day-end + delay, the same closure rule a windowed streaming
  * aggregate applies.
  */
object StreamTopK {

  val K = 3
  val DayUs: Long = 86400L * 1000000L

  case class Ev(eventType: String, day: Long, userId: Long,
      ts: java.sql.Timestamp)
  case class TopState(counts: Map[Long, Long])
  case class TopRow(eventType: String, day: Long, userId: Long,
      nEvents: Long, rnk: Int)

  def update(
      key: (String, Long),
      evs: Iterator[Ev],
      state: GroupState[TopState]): Iterator[TopRow] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      s.counts.toSeq
        .sortBy { case (u, n) => (-n, u) }
        .take(K).zipWithIndex
        .map { case ((u, n), i) => TopRow(key._1, key._2, u, n, i + 1) }
        .iterator
    } else {
      val prev = state.getOption.getOrElse(TopState(Map.empty))
      var counts = prev.counts
      evs.foreach { e =>
        counts = counts.updated(e.userId, counts.getOrElse(e.userId, 0L) + 1L)
      }
      state.update(TopState(counts))
      // the group is final once the watermark clears its day's end
      state.setTimeoutTimestamp((key._2 + 1) * (DayUs / 1000L))
      Iterator.empty
    }
  }

  /** events: streaming frame with (user_id, `eventTimeCol` timestamp,
    * event_type). One top-K leaderboard per (event_type, day), emitted
    * when the watermark closes the day.
    */
  def apply(events: DataFrame, eventTimeCol: String, delay: String)
      : Dataset[TopRow] = {
    implicit val enc = Encoders.product[TopRow]
    implicit val senc = Encoders.product[TopState]
    events
      .withWatermark(eventTimeCol, delay)
      .select(
        col("event_type").as("eventType"),
        expr(s"unix_micros($eventTimeCol) div $DayUs").as("day"),
        col("user_id").as("userId"),
        col(eventTimeCol).as("ts"))
      .as[Ev](Encoders.product[Ev])
      .groupByKey(e => (e.eventType, e.day))(
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
