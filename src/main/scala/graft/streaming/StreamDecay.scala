package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming half-life-decayed engagement — batch w11 maintained as a
  * LIVE per-user counter: each time an event-day CLOSES (the watermark
  * passes its end), every user active that day emits their score AS OF
  * that day — the decaying-leaderboard shape engagement/churn systems
  * actually serve, where batch w11 is the end-of-corpus snapshot.
  *
  * Exactness: w11's dyadic-weight discipline verbatim — weight =
  * 2^(DecayShift − min(⌊age_days/half-life⌋, DecayShift)) as exact
  * BIGINT shifts, the score one final IEEE division — so an emitted
  * (user, day) row equals the batch fold over that user's events with
  * day ≤ emission day and ref = emission day (spec-pinned on shuffled
  * arrivals).
  *
  * State per user is BOUNDED BY THE DECAY ITSELF, not by history:
  * per-day cents/count buckets are kept only while their age can
  * still change the weight (≤ DecayShift·half-life = 224 days); older
  * buckets fold into a single "ancient" accumulator whose weight is
  * pinned at 2^0 forever (the batch op's `least(steps, shift)` floor
  * — age beyond the cap cannot decay further, so the fold is exact,
  * not approximate). Out-of-order arrivals buffer until settled
  * (the StreamScd2 drain); a day emits only once the watermark closes
  * it, so every settled event with day ≤ D has already arrived.
  */
object StreamDecay {

  val UsPerSec = 1000000L
  val DayUs = 86400L * UsPerSec
  /** Mirrors batch w11 (EventWindows.DecayHalfLifeDays / DecayShift). */
  val HalfLifeDays = 7L
  val Shift = 32L

  // `ts` carries the watermark column through the typed projection
  // (dropping it would strip the event-time watermark the timeout needs)
  case class Ev(userId: Long, tus: Long, cents: Long, ts: Timestamp)
  case class Bucket(day: Long, cents: Long, n: Long)
  case class DecayState(
      buffer: Seq[Ev], buckets: Seq[Bucket],
      ancientCents: Long, ancientN: Long)
  case class ScoreRow(
      userId: Long, day: Long, nEvents: Long, decayedCents: Long,
      score: Double)

  private def weight(ageDays: Long): Long =
    1L << (Shift - math.min(ageDays / HalfLifeDays, Shift)).toInt

  def update(
      key: Long,
      evs: Iterator[Ev],
      state: GroupState[DecayState]): Iterator[ScoreRow] = {
    var st = state.getOption.getOrElse(
      DecayState(Vector.empty, Vector.empty, 0L, 0L))
    st = st.copy(buffer = st.buffer ++ evs)
    val wmUs =
      if (state.getCurrentWatermarkMs() <= 0) Long.MinValue
      else state.getCurrentWatermarkMs() * 1000L
    // day D is closed iff (D+1)·DayUs ≤ watermark
    val closedDay =
      if (wmUs == Long.MinValue) Long.MinValue else wmUs / DayUs - 1L
    val (settled, pending) =
      st.buffer.partition(e => e.tus / DayUs <= closedDay)
    val out = Vector.newBuilder[ScoreRow]
    var buckets = st.buckets
    var (ancC, ancN) = (st.ancientCents, st.ancientN)
    // fold day by day in ascending order so each emission sees exactly
    // the ≤-day prefix (two days settling in one batch emit two rows)
    settled.groupBy(_.tus / DayUs).toSeq.sortBy(_._1).foreach {
      case (day, des) =>
        val (c, n) = (des.map(_.cents).sum, des.size.toLong)
        buckets = (buckets.filterNot(_.day == day) :+ {
          val prior = buckets.find(_.day == day)
          Bucket(day,
            prior.map(_.cents).getOrElse(0L) + c,
            prior.map(_.n).getOrElse(0L) + n)
        }).sortBy(_.day)
        val decayed = ancC +
          buckets.map(b => b.cents * weight(day - b.day)).sum
        out += ScoreRow(
          key, day, ancN + buckets.map(_.n).sum, decayed,
          decayed.toDouble / (1L << Shift).toDouble)
        // fold buckets whose weight can no longer change (age at or
        // past the cap for every future ref ≥ day): exact, not lossy
        val (old, live) =
          buckets.partition(b => (day - b.day) / HalfLifeDays >= Shift)
        if (old.nonEmpty) {
          ancC += old.map(_.cents).sum
          ancN += old.map(_.n).sum
          buckets = live
        }
    }
    st = DecayState(pending, buckets, ancC, ancN)
    state.update(st)
    // wake when the earliest pending event's DAY closes
    pending.map(e => (e.tus / DayUs + 1L) * DayUs).minOption.foreach(t =>
      state.setTimeoutTimestamp(t / 1000L + 1L))
    out.result().iterator
  }

  /** events: streaming frame with (user_id, value, `timeCol`
    * timestamp). Emits one row per (user, closed event-day):
    * (user_id, day, n_events, decayed_cents, score) — batch w11's
    * exact integer discipline with ref = the emission day.
    */
  def apply(
      events: DataFrame, timeCol: String, delay: String): Dataset[ScoreRow] = {
    implicit val enc = Encoders.product[ScoreRow]
    implicit val eenc = Encoders.product[Ev]
    implicit val senc = Encoders.product[DecayState]
    implicit val kenc = Encoders.scalaLong
    events
      .withWatermark(timeCol, delay)
      .select(
        col("user_id").as("userId"),
        expr(s"unix_micros($timeCol)").as("tus"),
        round(col("value") * 100).cast("long").as("cents"),
        col(timeCol).as("ts"))
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update _)
  }
}
