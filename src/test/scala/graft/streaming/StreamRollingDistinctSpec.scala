package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming DAU/WAU: boards must equal batch w15's fold on the shared
  * day range regardless of arrival order, sets must accumulate across
  * micro-batches, a day emits only after the watermark clears its end,
  * and the trailing horizon past the last event shrinks monotonically.
  */
class StreamRollingDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, min: Int): Timestamp =
    Timestamp.valueOf(
      f"2024-01-${1 + day}%02d ${10 + min / 60}%02d:${min % 60}%02d:00")

  private def runStream(
      batches: Seq[Seq[(Timestamp, Long)]],
      delay: String = "10 minutes"): Seq[(Long, Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF.toDF("ts", "user_id")
    val name = s"roll_out_${System.nanoTime()}"
    val q = StreamRollingDistinct(df, "ts", delay).writeStream
      .format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData((Timestamp.valueOf("2024-06-01 00:00:00"), 999L))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-07-01 00:00:00"), 999L))
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sortBy(_._1)
    } finally q.stop()
  }

  private def day0: Long =
    Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L /
      StreamRollingDistinct.DayUs

  test("boards equal the batch w15 fold on the shared range, shuffled arrivals") {
    val events = (0 until 50).map { i =>
      (ts(i % 9, i * 3), (i % 6 + 1).toLong)
    }
    val shuffled = events.sortBy { case (t, u) => (t.getTime * 13 + u * 7) % 97 }
    val cuts = Seq(shuffled.take(17), shuffled.slice(17, 34), shuffled.drop(34))
    val sentinelDay0 = Timestamp.valueOf("2024-06-01 00:00:00")
      .getTime * 1000L / StreamRollingDistinct.DayUs
    val streamed = runStream(cuts, delay = "20 days")
      .filter(r => r._1 < sentinelDay0 - 7) // drop sentinel-user rows
    // batch fold (w15 semantics, clamped to the observed max day)
    val ud = events.map { case (t, u) =>
      (u, t.getTime * 1000L / StreamRollingDistinct.DayUs) }.distinct
    val mx = ud.map(_._2).max
    val want = (ud.map(_._2).min to mx).map { d =>
      val wau = ud.filter(p => p._2 >= d - 6 && p._2 <= d).map(_._1).distinct
      val dau = ud.filter(_._2 == d).map(_._1).distinct
      (d, dau.length.toLong, wau.length.toLong,
        dau.length.toDouble / wau.length.toDouble)
    }
    // shared range: streaming also emits the post-max horizon; compare
    // the clamped prefix row-for-row, then pin the horizon's shrink
    val shared = streamed.filter(_._1 <= mx)
    assert(shared == want, s"boards diverge:\n got=$shared\nwant=$want")
    val horizon = streamed.filter(r => r._1 > mx)
    assert(horizon.nonEmpty && horizon.length == 6,
      s"expected 6 trailing horizon days, got ${horizon.length}")
    assert(horizon.map(_._3) == horizon.map(_._3).sorted.reverse,
      s"horizon WAU must shrink monotonically: $horizon")
    assert(horizon.forall(_._2 == 0L),
      "horizon days have no day-actives by construction")
  }

  test("a report day emits only after the watermark clears its end") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF.toDF("ts", "user_id")
    val name = s"roll_wm_${System.nanoTime()}"
    val q = StreamRollingDistinct(df, "ts", "10 minutes").writeStream
      .format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData((ts(0, 0), 1L), (ts(0, 5), 2L))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0,
        "open day must not emit while the watermark is inside it")
      in.addData((ts(1, 30), 3L)) // closes day 0
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq((day0, 2L, 2L)),
        s"day 0 must close with its own two users: ${rows.toSeq}")
    } finally q.stop()
  }

  test("distinct sets accumulate across micro-batches without double-counting") {
    val rows = runStream(Seq(
      Seq((ts(0, 0), 1L), (ts(0, 1), 2L)),
      Seq((ts(0, 2), 1L), (ts(0, 3), 1L)),  // repeats of user 1
      Seq((ts(1, 0), 1L))))
      .filter(_._2 > 0) // rows with day-actives (skip horizon + sentinel)
    assert(rows.head == ((day0, 2L, 2L, 1.0)), s"day 0: ${rows.head}")
    // day 1: DAU {1}, WAU {1,2} carried from day 0's fan-out
    assert(rows(1) == ((day0 + 1, 1L, 2L, 0.5)), s"day 1: ${rows(1)}")
  }
}
