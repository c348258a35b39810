package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming session transitions: each finalized same-session
  * succession emits exactly once, regardless of how micro-batches
  * slice the stream; the aggregated matrix equals batch w14's fold on
  * shuffled arrivals; a pair emits only after the watermark passes its
  * later event; the session gap is enforced.
  */
class StreamTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  private def runStream(
      batches: Seq[Seq[(Timestamp, Long, Long, String)]],
      delay: String = "10 minutes")
      : Seq[(Long, String, String, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Long, String)]
    val df = in.toDF.toDF("ts", "user_id", "event_id", "event_type")
    val name = s"trans_out_${System.nanoTime()}"
    val q = StreamTransitions(df, "ts", delay).writeStream
      .format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      // two far-future sentinels walk the watermark past everything
      in.addData((Timestamp.valueOf("2024-02-01 00:00:00"), 999L, 9991L, "view"))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-03-01 00:00:00"), 999L, 9992L, "view"))
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
          r.getLong(4)))
        .toSeq.filter(_._1 != 999L).sortBy(t => (t._1, t._4))
    } finally q.stop()
  }

  test("successions split across micro-batches are stitched and emitted once") {
    val rows = runStream(Seq(
      Seq((ts(0), 1L, 1L, "view"), (ts(2), 1L, 2L, "click")),
      Seq((ts(5), 1L, 3L, "purchase")),
      Seq((ts(9), 2L, 4L, "view"))))
    assert(rows == Seq(
      (1L, "view", "click", ts(0).getTime * 1000L, ts(2).getTime * 1000L),
      (1L, "click", "purchase", ts(2).getTime * 1000L, ts(5).getTime * 1000L)),
      s"got $rows")
  }

  test("an out-of-order arrival lands between a not-yet-final pair") {
    // event 2 arrives AFTER event 3, inside the watermark delay: the
    // final path must be 1→2→3, never 1→3
    val rows = runStream(Seq(
      Seq((ts(0), 1L, 1L, "view"), (ts(6), 1L, 3L, "purchase")),
      Seq((ts(3), 1L, 2L, "click"))),
      delay = "30 minutes")
    assert(rows.map(r => (r._2, r._3)) == Seq(
      ("view", "click"), ("click", "purchase")), s"got $rows")
  }

  test("a gap beyond the session bound breaks the chain") {
    val gapMin = (StreamTransitions.GapUs / 60000000L).toInt
    val rows = runStream(Seq(Seq(
      (ts(0), 1L, 1L, "view"),
      (ts(gapMin), 1L, 2L, "click"),            // exactly at gap: IN
      (ts(2 * gapMin + 1), 1L, 3L, "purchase")   // 1 min past gap: OUT
    )), delay = "3 hours")
    assert(rows.map(r => (r._2, r._3)) == Seq(("view", "click")), s"got $rows")
  }

  test("a predecessor survives the watermark until its session gap expires") {
    // delay (5 min) < session gap (30 min): the watermark passes the
    // lone predecessor ts(0) long before the gap around it closes. A
    // resume INSIDE the gap at ts(25) must still pair — dropping the
    // predecessor at the bare watermark would lose (view → click).
    val gapMin = (StreamTransitions.GapUs / 60000000L).toInt
    assert(gapMin == 30)
    val rows = runStream(Seq(
      Seq((ts(0), 1L, 1L, "view")),
      // another user's event walks the watermark to ts(15) > ts(0)
      Seq((ts(20), 2L, 2L, "view")),
      Seq((ts(25), 1L, 3L, "click"))),
      delay = "5 minutes")
    assert(rows.filter(_._1 == 1L).map(r => (r._2, r._3)) ==
      Seq(("view", "click")), s"got $rows")
    // and the mirror case: a resume OUTSIDE the gap must NOT pair
    val rows2 = runStream(Seq(
      Seq((ts(0), 1L, 1L, "view")),
      Seq((ts(20), 2L, 2L, "view")),
      Seq((ts(gapMin + 5), 1L, 3L, "click"))),
      delay = "5 minutes")
    assert(rows2.filter(_._1 == 1L).isEmpty, s"got $rows2")
  }

  test("a pair emits only after the watermark passes its later event") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Long, String)]
    val df = in.toDF.toDF("ts", "user_id", "event_id", "event_type")
    val name = s"trans_wm_${System.nanoTime()}"
    val q = StreamTransitions(df, "ts", "10 minutes").writeStream
      .format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData((ts(0), 1L, 1L, "view"), (ts(2), 1L, 2L, "click"))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0,
        "pair must stay open while the watermark is behind its later event")
      in.addData((ts(20), 2L, 3L, "view")) // watermark → ts(10) > ts(2)
      q.processAllAvailable()
      assert(spark.table(name).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq ==
        Seq(("view", "click")), "pair must emit once the watermark clears it")
    } finally q.stop()
  }

  test("aggregated streaming matrix equals the batch w14 fold on shuffled arrivals") {
    val events = (0 until 60).map { i =>
      val ty = Seq("view", "click", "purchase")(i % 3)
      (ts(i * 7), (i % 4 + 1).toLong, (i + 1).toLong, ty)
    }
    val shuffled = events.sortBy { case (t, u, id, ty) =>
      (t.getTime * 31 + u * 17 + id * 7) % 103
    }
    val cuts = Seq(shuffled.take(20), shuffled.slice(20, 41), shuffled.drop(41))
    val streamed = runStream(cuts, delay = "12 hours")
      .groupBy(r => (r._2, r._3)).map { case (k, v) => k -> v.size.toLong }
    val want = events.groupBy(_._2).values.flatMap { es =>
      es.sortBy(e => (e._1.getTime, e._3)).sliding(2).collect {
        case Seq(a, b)
            if b._1.getTime - a._1.getTime <=
              StreamTransitions.GapUs / 1000L =>
          (a._4, b._4)
      }
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(streamed == want, s"streaming $streamed vs batch $want")
  }
}
