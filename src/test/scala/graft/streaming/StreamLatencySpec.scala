package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming conversion latency: each finalized purchase emits exactly
  * once with w4's exact as-of click and w16's power-of-two bucket,
  * regardless of micro-batch slicing; the collapsed best click
  * survives beyond the watermark horizon (unbounded look-back, the
  * batch semantics); the aggregated histogram equals the batch fold.
  */
class StreamLatencySpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  // (ts, user, event_id, event_type)
  private type Row4 = (Timestamp, Long, Long, String)

  private def runStream(
      batches: Seq[Seq[Row4]],
      delay: String = "10 minutes")
      : Seq[(Long, Long, Long, Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Row4]
    val df = in.toDF.toDF("ts", "user_id", "event_id", "event_type")
    val name = s"lat_out_${System.nanoTime()}"
    val q = StreamLatency(df, "ts", delay).writeStream
      .format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData((Timestamp.valueOf("2024-02-01 00:00:00"), 999L, 9991L, "click"))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-03-01 00:00:00"), 999L, 9992L, "purchase"))
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
        .toSeq.filter(_._1 != 999L).sortBy(t => (t._1, t._3))
    } finally q.stop()
  }

  /** The batch w4+w16 semantics as an in-memory fold. */
  private def batchFold(events: Seq[Row4])
      : Seq[(Long, Long, Long, Long, Long)] =
    events.groupBy(_._2).toSeq.flatMap { case (u, es) =>
      var best: Option[(Long, Long)] = None
      es.map { case (t, _, id, ty) =>
          (t.getTime * 1000L, if (ty == "click") 0L else 1L, id)
        }
        .sortBy(identity)
        .flatMap {
          case (tus, 0L, id) => best = Some((tus, id)); None
          case (tus, _, id) => best.map { case (ct, cid) =>
            val gap = (tus - ct) / 1000000L
            (u, id, cid, gap, StreamLatency.bucketPow(gap))
          }
        }
    }

  test("as-of match, same-µs click tiebreak, and exact bucket math") {
    val rows = runStream(Seq(Seq(
      (ts(0), 1L, 1L, "click"),
      (ts(2), 1L, 2L, "click"),
      (ts(2), 1L, 3L, "purchase"),   // same µs as click 2 → matches it
      (ts(35), 1L, 4L, "purchase")))) // 33 min after click 2 → 1980 s
    assert(rows == Seq(
      (1L, 3L, ts(2).getTime * 1000L, 2L, ts(2).getTime * 1000L, 0L, 0L),
      (1L, 4L, ts(35).getTime * 1000L, 2L, ts(2).getTime * 1000L,
        1980L, 10L)), // 2^10 = 1024 ≤ 1980 < 2048
      s"got $rows")
  }

  test("a late click inside the watermark corrects the as-of match") {
    // click 2 arrives AFTER the purchase, between click 1 and the
    // purchase in event time: the final match must be click 2
    val rows = runStream(Seq(
      Seq((ts(0), 1L, 1L, "click"), (ts(6), 1L, 3L, "purchase")),
      Seq((ts(3), 1L, 2L, "click"))),
      delay = "30 minutes")
    assert(rows.map(r => (r._2, r._4, r._6)) == Seq((3L, 2L, 180L)),
      s"got $rows")
  }

  test("a purchase emits only after the watermark passes its time") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Row4]
    val df = in.toDF.toDF("ts", "user_id", "event_id", "event_type")
    val name = s"lat_wm_${System.nanoTime()}"
    val q = StreamLatency(df, "ts", "10 minutes").writeStream
      .format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData((ts(0), 1L, 1L, "click"), (ts(2), 1L, 2L, "purchase"))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0,
        "purchase must stay open while the watermark is behind it")
      in.addData((ts(20), 2L, 3L, "click")) // watermark → ts(10) > ts(2)
      q.processAllAvailable()
      assert(spark.table(name).collect().map(_.getLong(1)).toSeq == Seq(2L))
    } finally q.stop()
  }

  test("the best click survives beyond the watermark horizon") {
    // delay (5 min) passes the lone click long before the purchase
    // arrives — batch look-back is unbounded, so the match must hold
    val rows = runStream(Seq(
      Seq((ts(0), 1L, 1L, "click")),
      Seq((ts(20), 2L, 2L, "click")),   // walks the watermark past ts(0)
      Seq((ts(25), 1L, 3L, "purchase"))),
      delay = "5 minutes")
    assert(rows.filter(_._1 == 1L).map(r => (r._2, r._4, r._6, r._7)) ==
      Seq((3L, 1L, 1500L, 10L)), s"got $rows")
  }

  test("aggregated rows equal the batch fold on shuffled arrivals") {
    val events: Seq[Row4] = (0 until 60).map { i =>
      val ty = Seq("click", "purchase", "click", "view")(i % 4)
      (ts(i * 7), (i % 4 + 1).toLong, (i + 1).toLong, ty)
    }
    val shuffled = events.sortBy { case (t, u, id, _) =>
      (t.getTime * 31 + u * 17 + id * 7) % 103
    }
    val cuts = Seq(shuffled.take(20), shuffled.slice(20, 41), shuffled.drop(41))
    val streamed = runStream(cuts, delay = "12 hours")
      .map(r => (r._1, r._2, r._4, r._6, r._7)).sorted
    val want = batchFold(events.filter(e => e._4 != "view")).sorted
    assert(streamed == want, s"streaming $streamed vs batch $want")
  }
}
