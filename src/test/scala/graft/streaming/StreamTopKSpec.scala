package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming top-N per group: leaderboards must match w10's batch fold
  * regardless of arrival order (the sort runs once at day closure),
  * ties break on user_id, and a day emits only after the watermark
  * clears its end.
  */
class StreamTopKSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, min: Int): Timestamp =
    Timestamp.valueOf(
      f"2024-01-${1 + day}%02d ${10 + min / 60}%02d:${min % 60}%02d:00")

  private def runStream(
      batches: Seq[Seq[(Timestamp, Long, String)]],
      delay: String = "10 minutes")
      : Seq[(String, Long, Long, Long, Int)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val df = in.toDF.toDF("ts", "user_id", "event_type")
    val name = s"topk_out_${System.nanoTime()}"
    val q = StreamTopK(df, "ts", delay).writeStream
      .format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      // two far-future events walk the watermark past every day end
      in.addData((Timestamp.valueOf("2024-02-01 00:00:00"), 999L, "view"))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-03-01 00:00:00"), 999L, "view"))
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getInt(4)))
        .toSeq.sortBy(t => (t._1, t._2, t._5))
    } finally q.stop()
  }

  test("leaderboard counts accumulate across micro-batches; ties on user_id") {
    // day 0 views: user 1 ×3 (split across batches), users 2/3 ×2 each
    // (tie → user 2 ranks ahead), user 4 ×1 (off the top-3)
    val rows = runStream(Seq(
      Seq((ts(0, 0), 1L, "view"), (ts(0, 1), 2L, "view"),
        (ts(0, 2), 3L, "view"), (ts(0, 3), 1L, "view")),
      Seq((ts(0, 4), 2L, "view"), (ts(0, 5), 3L, "view"),
        (ts(0, 6), 1L, "view"), (ts(0, 7), 4L, "view"))))
      .filter(r => r._1 == "view" && r._3 != 999L)
    val day0 = (Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L) /
      StreamTopK.DayUs
    assert(rows == Seq(
      ("view", day0, 1L, 3L, 1),
      ("view", day0, 2L, 2L, 2),
      ("view", day0, 3L, 2L, 3)), s"got $rows")
  }

  test("streaming leaderboards equal the batch fold on shuffled arrivals") {
    val events = (0 until 40).map { i =>
      (ts(i % 2, i), (i % 5 + 1).toLong, if (i % 3 == 0) "click" else "view")
    }
    val shuffled = events.sortBy { case (t, u, ty) =>
      (t.getTime * 31 + u * 17 + ty.hashCode) % 101
    }
    // the shuffle reorders across the 2-day span, so the watermark
    // delay must cover it or genuinely-late rows are (correctly)
    // dropped — this test is about fold order, not lateness policy
    val cuts = Seq(shuffled.take(13), shuffled.slice(13, 27), shuffled.drop(27))
    val streamed = runStream(cuts, delay = "3 days").filter(_._3 != 999L)
    val batch = events
      .groupBy(e => (e._3, e._1.getTime * 1000L / StreamTopK.DayUs, e._2))
      .map { case ((ty, d, u), es) => (ty, d, u, es.size.toLong) }
      .groupBy(t => (t._1, t._2)).toSeq
      .flatMap { case (_, rs) =>
        rs.toSeq.sortBy(t => (-t._4, t._3)).take(StreamTopK.K).zipWithIndex
          .map { case ((ty, d, u, n), i) => (ty, d, u, n, i + 1) }
      }
      .sortBy(t => (t._1, t._2, t._5))
    assert(streamed == batch, s"streaming $streamed vs batch $batch")
  }

  test("a day emits only after the watermark clears its end") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val df = in.toDF.toDF("ts", "user_id", "event_type")
    val name = s"topk_wm_${System.nanoTime()}"
    val q = StreamTopK(df, "ts", "10 minutes").writeStream
      .format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData((ts(0, 0), 1L, "view"), (ts(0, 1), 1L, "view"))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0,
        "open day must not emit while the watermark is inside it")
      // same-day later event: still open
      in.addData((ts(0, 500), 2L, "view"))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0)
      // next-day event pushes the watermark past day 0's end
      in.addData((ts(1, 700), 3L, "view"))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.map(_.getLong(2)).toSet == Set(1L, 2L),
        s"day 0 must close with exactly its own users: ${rows.toSeq}")
    } finally q.stop()
  }
}
