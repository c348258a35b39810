package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming HLL++ distinct: windows emit once, only after the
  * watermark closes them; estimates stay within the x11 family's 10%
  * bound of the exact batch fold; sketch state merges across
  * micro-batches (shuffled arrival order is invisible).
  */
class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${10 + day}%02d ${10 + min / 60}%02d:${min % 60}%02d:00")

  private type Row3 = (Timestamp, Long, String)

  private def runStream(batches: Seq[Seq[Row3]])
      : Seq[(Timestamp, String, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Row3]
    val df = in.toDF.toDF("ts", "user_id", "event_type")
    val name = s"sk_out_${System.nanoTime()}"
    // delay must exceed the shuffled batches' FULL event-time span
    // (~1.5 days here), or "late" rows are dropped and the estimate
    // undercounts — that is the lateness CONTRACT, not sketch error
    // (measured: a 12 h delay dropped day-10 rows once batch 1's
    // day-11 events walked the watermark, 44 vs 75 distinct)
    val q = StreamSketch.approxDistinctUsers(df, "ts", "3 days")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData((Timestamp.valueOf("2024-03-01 00:00:00"), 999L, "view"))
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSeq.filter(_._1.before(Timestamp.valueOf("2024-02-28 00:00:00")))
    } finally q.stop()
  }

  test("estimates within 10% of exact per closed window, across shuffled batches") {
    val events: Seq[Row3] = (0 until 300).map { i =>
      val ty = Seq("view", "click")(i % 2)
      // ~100 distinct users per (day, type), repeats included
      (ts(i % 2, (i * 7) % 600), (i % 150 + 7 * (i % 2)).toLong, ty)
    }
    val shuffled = events.sortBy { case (t, u, _) =>
      (t.getTime * 31 + u * 17) % 101
    }
    val cuts = Seq(shuffled.take(100), shuffled.slice(100, 201), shuffled.drop(201))
    val got = runStream(cuts)
    val exact = events.groupBy { case (t, _, ty) =>
      (Timestamp.valueOf(t.toLocalDateTime.toLocalDate.atStartOfDay), ty)
    }.map { case (k, es) => k -> es.map(_._2).distinct.size.toLong }
    assert(got.nonEmpty && got.size == exact.size,
      s"windows: got ${got.size} want ${exact.size}")
    got.foreach { case (day, ty, est) =>
      val ex = exact((day, ty))
      assert(math.abs(est - ex).toDouble / ex <= 0.10,
        s"($day, $ty): estimate $est vs exact $ex exceeds 10%")
    }
  }

  test("a window emits only after the watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Row3]
    val df = in.toDF.toDF("ts", "user_id", "event_type")
    val name = s"sk_wm_${System.nanoTime()}"
    val q = StreamSketch.approxDistinctUsers(df, "ts", "2 hours")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData((ts(0, 0), 1L, "view"), (ts(0, 30), 2L, "view"))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0,
        "open window must not emit")
      // next-day event walks the watermark past day 0's end
      in.addData((ts(1, 600), 3L, "view"))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.length == 1 && rows.head.getLong(2) == 2L,
        s"day-0 window must close with 2 distinct users: ${rows.toSeq}")
    } finally q.stop()
  }
}
