package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming behavior: watermarked windows + the stateful
  * chunk barrier (SURVEY §2.10), driven through MemoryStream micro-batches.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("tumbling window with watermark aggregates by event time") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val df = in.toDF.toDF("ts", "user_id", "event_type", "value")
    val q = EventStream.tumblingCounts(df).writeStream
      .format("memory").queryName("tumbling_out")
      .outputMode("append").start()
    try {
      in.addData((ts(0), 1L, "a", 1.0), (ts(1), 1L, "a", 2.0), (ts(6), 2L, "b", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      in.addData((ts(30), 3L, "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .orderBy("window_start", "event_type").collect()
      assert(rows.length == 2) // [10:00,10:05) a=2 events; [10:05,10:10) b=1
      assert(rows(0).getAs[Long]("n_events") == 2)
      assert(rows(1).getAs[Long]("n_events") == 1)
    } finally q.stop()
  }

  test("streaming OHLC matches the batch min_by/max_by formulation") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val df = in.toDF.toDF("ts", "event_id", "event_type", "value")
    val q = EventStream.ohlcResample(df).writeStream
      .format("memory").queryName("ohlc_out")
      .outputMode("append").start()
    try {
      // one 5-min bucket for type a: open must be the EARLIEST event
      // (id 2 at 10:00), close the LATEST (id 1 at 10:04) — ids are
      // deliberately ordered against time so min_by keys on the packed
      // (offset, id), not on arrival or id order; plus a same-timestamp
      // pair in bucket 2 where the id is the tiebreak
      in.addData(
        (ts(4), 1L, "a", 9.0), (ts(0), 2L, "a", 1.5), (ts(2), 3L, "a", 0.5),
        (ts(6), 4L, "b", 2.0), (ts(6), 5L, "b", 3.0))
      q.processAllAvailable()
      in.addData((ts(30), 9L, "a", 1.0)) // advance watermark, close windows
      q.processAllAvailable()
      val rows = spark.table("ohlc_out")
        .orderBy("window_start", "event_type").collect()
      assert(rows.length == 2)
      val a = rows(0)
      assert(a.getAs[Long]("open_cents") == 150L, a.toString)   // id 2 @10:00
      assert(a.getAs[Long]("close_cents") == 900L, a.toString)  // id 1 @10:04
      assert(a.getAs[Long]("high_cents") == 900L
        && a.getAs[Long]("low_cents") == 50L)
      val b = rows(1) // same-ts tie: open = lower id 4, close = higher id 5
      assert(b.getAs[Long]("open_cents") == 200L
        && b.getAs[Long]("close_cents") == 300L, b.toString)
      // a straggler 25+ minutes behind the watermark must not reopen
      // the emitted window
      in.addData((ts(1), 6L, "a", 99.0))
      q.processAllAvailable()
      assert(spark.table("ohlc_out").count() == 2,
        "late event reopened a closed OHLC window")
    } finally q.stop()
  }

  test("chunk barrier emits exactly once, when all chunks arrived") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ChunkBarrier.ChunkEvent]
    val q = ChunkBarrier(in.toDS()).writeStream
      .format("memory").queryName("barrier_out")
      .outputMode("append").start()
    try {
      // chunks arrive out of order, across micro-batches
      in.addData(ChunkBarrier.ChunkEvent(1L, 2, "world.", 2))
      q.processAllAvailable()
      assert(spark.table("barrier_out").count() == 0) // incomplete → held
      in.addData(ChunkBarrier.ChunkEvent(1L, 1, "Hello", 2))
      q.processAllAvailable()
      val out = spark.table("barrier_out").as[ChunkBarrier.Transcript].collect()
      assert(out.toSeq == Seq(ChunkBarrier.Transcript(1L, "Hello world.")))
      // replay a chunk (at-least-once delivery) → no second emission
      in.addData(ChunkBarrier.ChunkEvent(1L, 1, "Hello", 2))
      q.processAllAvailable()
      assert(spark.table("barrier_out").count() == 1)
    } finally q.stop()
  }

  test("session window groups by inactivity gap per user") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val df = in.toDF.toDF("ts", "user_id", "event_type", "value")
    val q = EventStream.sessionCounts(df).writeStream
      .format("memory").queryName("session_out")
      .outputMode("append").start()
    try {
      in.addData((ts(0), 1L, "a", 1.0), (ts(5), 1L, "a", 1.0)) // one session
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "a", 1.0))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 14:00:00"), 9L, "a", 1.0))
      q.processAllAvailable() // advance watermark to close earlier sessions
      val rows = spark.table("session_out").orderBy("session_start").collect()
      assert(rows.length >= 2) // the two-event session closed separately
      assert(rows(0).getAs[Long]("n_events") == 2)
    } finally q.stop()
  }

  test("streaming exact dedup drops copies within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val df = in.toDF.toDF("arrived", "doc_id", "text")
    val q = StreamDedup.exactDedup(df, "arrived", "10 minutes")
      .select("doc_id", "text").writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData(
        (ts(0), 1L, "alpha beta"),
        (ts(1), 2L, "ALPHA   beta"), // same fingerprint after normalize
        (ts(2), 3L, "gamma"))
      q.processAllAvailable()
      in.addData((ts(4), 4L, "alpha beta")) // still within watermark → dropped
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L), s"got $ids")
    } finally q.stop()
  }
}
