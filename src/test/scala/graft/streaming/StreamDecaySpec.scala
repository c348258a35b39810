package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming decayed engagement (w11's live twin): every emitted
  * (user, day) row equals batch w11's dyadic fold over that user's
  * events with day ≤ D at ref = D, under shuffled arrival; state
  * compaction past the decay cap is exact; nothing emits for open
  * days.
  */
class StreamDecaySpec extends SparkSpec {
  import spark.implicits._

  private val Base = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000L

  private def ts(day: Long, offSec: Long = 10L): Timestamp =
    new Timestamp((Base + day * 86400L + offSec) * 1000L)

  private val baseDay = (Base * 1000000L) / StreamDecay.DayUs

  /** Batch w11's fold: score for `user` at ref day `d` over events
    * (day, cents) with day ≤ d.
    */
  private def model(evs: Seq[(Long, Long)], d: Long): (Long, Long) = {
    val in = evs.filter(_._1 <= d)
    val dec = in.map { case (day, c) =>
      c * (1L << (StreamDecay.Shift -
        math.min((d - day) / StreamDecay.HalfLifeDays, StreamDecay.Shift)).toInt)
    }.sum
    (in.size.toLong, dec)
  }

  private def start(name: String, in: MemoryStream[(Long, Double, Timestamp)]) =
    StreamDecay(in.toDF.toDF("user_id", "value", "ts"), "ts", "1 day")
      .toDF("user_id", "day", "n_events", "decayed_cents", "score")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()

  private def rows(name: String, user: Long): Seq[(Long, Long, Long)] =
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 == user).map(t => (t._2, t._3, t._4)).sortBy(_._1)

  test("per-closed-day scores equal the batch fold under shuffled arrival") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double, Timestamp)]
    val name = s"decay_out_${System.nanoTime()}"
    val q = start(name, in)
    try {
      // user 1: events on days 0, 3, 10, 10, 24 (spanning 3 half-lives)
      val evDays = Seq(0L -> 150L, 3L -> 200L, 10L -> 75L, 10L -> 25L,
        24L -> 300L)
      val evs = evDays.map { case (d, c) => (1L, c / 100.0, ts(d)) }
      // one batch, internally unordered: later batches would advance
      // the watermark past genuinely-late days (which streaming
      // correctly DROPS — the in-delay reordering is what's tested)
      val shuffled = evs.sortBy { case (_, _, t) => (t.getTime * 13) % 7 }
      in.addData(shuffled: _*); q.processAllAvailable()
      // close everything: sentinel far in the future
      in.addData((99L, 0.01, ts(60))); q.processAllAvailable()
      in.addData((99L, 0.01, ts(120))); q.processAllAvailable()

      val got = rows(name, 1L)
      val emitDays = Seq(0L, 3L, 10L, 24L)
      assert(got.map(_._1) == emitDays.map(_ + baseDay),
        s"emission days wrong: ${got.map(_._1)} vs base $baseDay")
      emitDays.zip(got).foreach { case (d, (_, n, dec)) =>
        val (wantN, wantDec) = model(evDays, d)
        assert(n == wantN && dec == wantDec,
          s"day $d: got (n=$n, dec=$dec), want ($wantN, $wantDec)")
      }
      // the day-10 row must weight day 0 at one half-life step and
      // day 3 at one (10-3=7 → 1 step), day 10 at 2^32
      val d10 = got.find(_._1 == 10L + baseDay).get
      val expect10 = 150L * (1L << 31) + 200L * (1L << 31) +
        100L * (1L << 32)
      assert(d10._3 == expect10, s"day-10 hand value: ${d10._3} vs $expect10")
    } finally q.stop()
  }

  test("no emission for a day until the watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double, Timestamp)]
    val name = s"decay_open_${System.nanoTime()}"
    val q = start(name, in)
    try {
      in.addData((1L, 1.0, ts(5))); q.processAllAvailable()
      assert(rows(name, 1L).isEmpty, "open day must not emit")
      // watermark to day 5 end − ε (delay 1 day): still open
      in.addData((99L, 0.01, ts(6, 86300L))); q.processAllAvailable()
      assert(rows(name, 1L).isEmpty, "day closes only past its end")
      // now close it
      in.addData((99L, 0.01, ts(8))); q.processAllAvailable()
      in.addData((99L, 0.01, ts(20))); q.processAllAvailable()
      assert(rows(name, 1L).map(_._1) == Seq(5L + baseDay))
    } finally q.stop()
  }

  test("ancient-bucket compaction is exact across the decay cap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double, Timestamp)]
    val name = s"decay_anc_${System.nanoTime()}"
    val q = start(name, in)
    try {
      // an event far older than Shift·halfLife (224 days) relative to
      // the second event: its bucket folds into the ancient
      // accumulator after day 0 emits, and the day-300 row must still
      // score it at exactly weight 2^0
      val evDays = Seq(0L -> 500L, 300L -> 100L)
      evDays.foreach { case (d, c) =>
        in.addData((1L, c / 100.0, ts(d))); q.processAllAvailable()
      }
      in.addData((99L, 0.01, ts(400))); q.processAllAvailable()
      in.addData((99L, 0.01, ts(500))); q.processAllAvailable()
      val got = rows(name, 1L)
      assert(got.map(_._1) == Seq(0L, 300L).map(_ + baseDay))
      val (wantN, wantDec) = model(evDays, 300L)
      assert(got(1)._2 == wantN && got(1)._3 == wantDec,
        s"capped-age fold drifted: ${got(1)} vs ($wantN, $wantDec)")
      assert(got(1)._3 == 500L * 1L + 100L * (1L << 32),
        "ancient weight must be exactly 2^0")
    } finally q.stop()
  }
}
