package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming sessionization (w3's twin): session boundaries must equal
  * the batch gap-split fold — INCLUDING the exact-gap pair batch
  * merges — regardless of arrival order; an open session must not emit
  * while the watermark can still extend it; and a row older than the
  * watermark must not resurrect a closed session.
  */
class StreamSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val GapUs = StreamSessions.GapSec * 1000000L

  private val BaseUs =
    Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L

  private def ts(us: Long): Timestamp =
    new Timestamp((BaseUs + us) / 1000L)
  private def us(t: Timestamp): Long = t.getTime * 1000L

  /** Batch w3's fold (EventWindows.sessions semantics): new session
    * iff diff > gap; report (user, start_us, end_us, n).
    */
  private def batchSessions(events: Seq[(Timestamp, Long)])
      : Seq[(Long, Long, Long, Long)] =
    events.groupBy(_._2).toSeq.flatMap { case (user, evs) =>
      val sorted = evs.map(e => us(e._1)).sorted
      sorted.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
        if (acc.nonEmpty && t - acc.last.last <= GapUs)
          acc.init :+ (acc.last :+ t)
        else acc :+ Vector(t)
      }.map(s => (user, s.head, s.last, s.length.toLong))
    }.sortBy(r => (r._1, r._2))

  private def runStream(
      batches: Seq[Seq[(Timestamp, Long)]],
      delay: String = "1 minute"): Seq[(Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF.toDF("ts", "user_id")
    val name = s"sess_out_${System.nanoTime()}"
    val q = StreamSessions(df, "ts", delay).writeStream
      .format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData((Timestamp.valueOf("2030-01-01 00:00:00"), 999L))
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.filter(_._1 != 999L).sortBy(r => (r._1, r._2))
    } finally q.stop()
  }

  test("sessions equal batch w3's fold on shuffled arrivals, incl. the exact-gap merge") {
    // user 1: three sessions; the 2nd..3rd event of session one are
    // EXACTLY GapUs apart (batch merges; a naive session_window splits)
    val u1 = Seq(0L, 30L * 1000000L, 30L * 1000000L + GapUs,
      3L * GapUs, 3L * GapUs + 5L, 9L * GapUs)
    // user 2: a singleton and a 4-event chain with sub-gap steps
    val u2 = Seq(0L, 2L * GapUs, 2L * GapUs + GapUs / 2,
      2L * GapUs + GapUs / 2 + GapUs, 2L * GapUs + GapUs / 2 + GapUs + 7L)
    val events = u1.map(t => (ts(t), 1L)) ++ u2.map(t => (ts(t), 2L))
    val shuffled = events.sortBy { case (t, u) => (t.getTime * 31 + u * 17) % 101 }
    val cuts = Seq(shuffled.take(4), shuffled.slice(4, 8), shuffled.drop(8))
    val got = runStream(cuts, delay = "30 days")
    val want = batchSessions(events)
    assert(got == want, s"sessions diverge:\n got=$got\nwant=$want")
    // the exact-gap pair merged: user 1's first session spans 3 events
    assert(want.head == (1L, BaseUs, BaseUs + 30L * 1000000L + GapUs, 3L))
  }

  test("an open session does not emit while the watermark can still extend it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF.toDF("ts", "user_id")
    val name = s"sess_wm_${System.nanoTime()}"
    val q = StreamSessions(df, "ts", "1 minute").writeStream
      .format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData((ts(0L), 1L), (ts(60L * 1000000L), 1L))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0,
        "session must stay open while watermark < session end + gap")
      // advance the watermark past end + gap + delay → the session closes
      in.addData((ts(60L * 1000000L + GapUs + 10L * 60L * 1000000L), 2L))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2030-01-01 00:00:00"), 999L))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.filter(_._1 == 1L)
      assert(rows == Seq((1L, BaseUs, BaseUs + 60L * 1000000L, 2L)),
        s"closed session wrong: $rows")
    } finally q.stop()
  }

  test("a row older than the watermark cannot resurrect a closed session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF.toDF("ts", "user_id")
    val name = s"sess_late_${System.nanoTime()}"
    val q = StreamSessions(df, "ts", "1 minute").writeStream
      .format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData((ts(0L), 1L))
      q.processAllAvailable()
      // move the watermark far past user 1's session
      in.addData((ts(100L * GapUs), 2L))
      q.processAllAvailable()
      // late row INSIDE the closed session's gap — dropped, not merged
      in.addData((ts(10L), 1L))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2030-01-01 00:00:00"), 999L))
      q.processAllAvailable()
      val u1 = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.filter(_._1 == 1L)
      assert(u1 == Seq((1L, BaseUs, BaseUs, 1L)),
        s"late row must not reopen or duplicate the session: $u1")
    } finally q.stop()
  }
}
