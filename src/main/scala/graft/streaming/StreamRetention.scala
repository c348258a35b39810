package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cohort retention — w9's semantics (users cohorted by
  * first in-range activity day; one row per (user, day-offset) of
  * activity) computed at ingestion time, completing the w8/w9
  * streaming symmetry: the per-user rows this emits aggregate to
  * exactly the batch retention report (count per (cohort, offset) /
  * offset-0 slice), which is how `StreamRetentionSpec` pins the twin.
  *
  * Out-of-order safety: the cohort day is a MIN, so a later
  * micro-batch can carry an EARLIER first-activity day that shifts
  * every offset the user would report — a greedy "fix the cohort at
  * first sight" state machine emits wrong offsets. The state therefore
  * keeps only the distinct-day set and defers BOTH the min and the
  * offsets to emission (the StreamFunnel discipline), when the user is
  * quiet past the watermark and the min is final.
  *
  * Bounded state: the same `inAnalysisRange` pre-filter as batch w9
  * runs on the STREAM (a stateless filter before grouping), so the
  * per-user distinct-day set is bounded by the analysis range in days
  * (60 here, 365 for a year) — never raw event count, never user
  * lifetime; same-day events collapse into one entry on arrival.
  */
object StreamRetention {

  val DayUs: Long = 86400L * 1000000L

  case class Ev(userId: Long, ts: java.sql.Timestamp)
  case class RetState(days: List[Long])
  case class Retained(userId: Long, cohortDay: Long, dayOffset: Long)

  def update(
      userId: Long,
      evs: Iterator[Ev],
      state: GroupState[RetState]): Iterator[Retained] = {
    if (state.hasTimedOut) {
      val days = state.get.days
      state.remove()
      val cohort = days.min
      days.sorted.iterator.map(d => Retained(userId, cohort, d - cohort))
    } else {
      val prev = state.getOption.getOrElse(RetState(Nil))
      var days = prev.days
      var maxTs = Long.MinValue
      evs.foreach { e =>
        maxTs = math.max(maxTs, e.ts.getTime)
        val d = e.ts.getTime * 1000L / DayUs
        if (!days.contains(d)) days ::= d
      }
      state.update(RetState(days))
      state.setTimeoutTimestamp(maxTs, "1 minute")
      Iterator.empty
    }
  }

  /** events: streaming frame with (user_id, `eventTimeCol` timestamp).
    * Emits the user's (cohortDay, dayOffset) rows once quiet past the
    * watermark; [startUs, endUs) is the batch w9 analysis range.
    */
  def apply(
      events: DataFrame,
      eventTimeCol: String,
      delay: String,
      startUs: Long,
      endUs: Long): Dataset[Retained] = {
    implicit val enc = Encoders.product[Retained]
    implicit val senc = Encoders.product[RetState]
    events
      .withWatermark(eventTimeCol, delay)
      .filter(
        unix_micros(col(eventTimeCol)) >= startUs &&
          unix_micros(col(eventTimeCol)) < endUs)
      .select(col("user_id").as("userId"), col(eventTimeCol).as("ts"))
      .as[Ev](Encoders.product[Ev])
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
