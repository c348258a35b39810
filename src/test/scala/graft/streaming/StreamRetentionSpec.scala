package graft.streaming

import graft.SparkSpec
import graft.queries.EventWindows
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming cohort retention: the emitted (user, cohort, offset) rows
  * must aggregate to w9's batch report regardless of arrival order
  * (cohort day = a MIN that late batches can lower — the fold defers
  * to emission), same-day events collapse in state, and the batch
  * analysis-range pre-filter runs on the stream.
  */
class StreamRetentionSpec extends SparkSpec {
  import spark.implicits._

  // all inside the w9 analysis range (Jan 2024)
  private def ts(day: Int, hour: Int = 1): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d $hour%02d:00:00")

  /** The watermark delay is the allowed event-time disorder; these
    * workloads shuffle events across DAYS (a cohort min arriving
    * batches late), so the delay must cover the analysis span — with a
    * short delay the engine correctly DROPS the late rows before the
    * state op, which is watermark semantics, not a retention bug.
    */
  private def runStream(
      batches: Seq[Seq[(Timestamp, Long)]]): Seq[(Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF.toDF("ts", "user_id")
    val name = s"ret_out_${System.nanoTime()}"
    val q = StreamRetention(df, "ts", "20 days",
      EventWindows.AnalysisStartUs, EventWindows.AnalysisEndUs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      // advance the watermark far past every user's last event; these
      // sentinels are OUT of the analysis range (post-March), proving
      // the watermark still advances through the pre-filter
      in.addData((Timestamp.valueOf("2024-03-05 00:00:00"), 999L))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-03-09 00:00:00"), 999L))
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .filter(_._1 < 900L)
    } finally q.stop()
  }

  private val workload = Seq(
    // user 1: days 1, 2, 9 → cohort d1, offsets 0/1/8
    (ts(1), 1L), (ts(2), 1L), (ts(9), 1L),
    // user 2: day 2 only (three same-day events → ONE offset-0 row)
    (ts(2, 1), 2L), (ts(2, 5), 2L), (ts(2, 9), 2L),
    // user 3: days 2, 4
    (ts(2), 3L), (ts(4), 3L))

  test("emitted rows aggregate to the batch w9 report on shuffled arrivals") {
    // deliver in arbitrary micro-batch cuts, mixed users
    val got = runStream(Seq(
      Seq((ts(9), 1L), (ts(2, 5), 2L)),
      Seq((ts(2), 3L), (ts(2), 1L), (ts(2, 9), 2L)),
      Seq((ts(1), 1L), (ts(4), 3L), (ts(2, 1), 2L))))
    // batch side: same events through the registered w9 query
    val fdir = Files.createTempDirectory("ret_fix_").toString
    workload.zipWithIndex
      .map { case ((t, u), i) => (i.toLong, t, u) }
      .toDF("event_id", "ts", "user_id")
      .select(col("event_id"), col("ts"), col("user_id"),
        lit("view").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$fdir/events.parquet")
    val batch = EventWindows.retention(spark, fdir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val agg = got.groupBy(p => (p._2, p._3)).view.mapValues(_.size.toLong).toMap
    val base = agg.collect { case ((c, 0L), n) => c -> n }
    val streamed = agg.map { case ((c, o), n) =>
      (c, o) -> ((n, n.toDouble / base(c).toDouble))
    }
    assert(streamed == batch,
      s"streaming aggregate != batch w9:\n  stream $streamed\n  batch  $batch")
  }

  test("a late-arriving earlier day lowers the cohort and shifts every offset") {
    // day 5 arrives first; the user's TRUE first day (1) arrives two
    // micro-batches later — a fixed-at-first-sight cohort would emit
    // (5, 0) instead of (1, 0) and (1, 4)
    val got = runStream(Seq(
      Seq((ts(5), 1L)),
      Seq((ts(7), 2L)), // unrelated traffic between
      Seq((ts(1), 1L))))
    val u1 = got.filter(_._1 == 1L).map(p => (p._2, p._3)).sorted
    val day1 = ts(1).getTime * 1000L / StreamRetention.DayUs
    assert(u1 == Seq((day1, 0L), (day1, 4L)), s"got $u1")
  }

  test("same-day events collapse to one state entry and one emitted row") {
    val got = runStream(Seq(Seq(
      (ts(3, 1), 7L), (ts(3, 2), 7L), (ts(3, 3), 7L), (ts(3, 23), 7L))))
    assert(got.filter(_._1 == 7L).map(p => (p._2, p._3)).distinct.size == 1)
    assert(got.count(_._1 == 7L) == 1,
      s"4 same-day events must emit exactly one (cohort, 0) row: $got")
  }

  test("out-of-range history never enters the state (the batch range bound)") {
    // user 8's 2023 history is outside [2024-01-01, 2024-03-01):
    // cohort must be the first IN-RANGE day, as in batch w9
    val got = runStream(Seq(
      Seq((Timestamp.valueOf("2023-06-01 00:00:00"), 8L)),
      Seq((ts(6), 8L))))
    val day6 = ts(6).getTime * 1000L / StreamRetention.DayUs
    assert(got.filter(_._1 == 8L).map(p => (p._2, p._3)) == Seq((day6, 0L)),
      s"got $got")
  }
}
