package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream interval join: semantics (bounded look-back, same
  * user), equivalence with the batch formulation, and state-bound
  * plumbing (watermarks on both sides).
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("purchases join clicks within the look-back interval only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val out = StreamJoin.clickAttribution(
      clicks.toDF.toDF("c_ts", "c_user", "click_id"),
      purchases.toDF.toDF("p_ts", "p_user", "purchase_id"),
      lookback = "30 minutes", delay = "10 minutes")
    val q = out.writeStream
      .format("memory").queryName("attr_out").outputMode("append").start()
    try {
      // user 1: click at 10:00 and 10:20, purchase at 10:25 → both match
      // user 2: click at 10:00, purchase at 10:35 → 35 min gap, no match
      // user 3: purchase at 10:10 with user 1's clicks only → no match
      clicks.addData((ts(0), 1L, 100L), (ts(20), 1L, 101L), (ts(0), 2L, 200L))
      purchases.addData((ts(25), 1L, 900L), (ts(35), 2L, 901L), (ts(10), 3L, 902L))
      q.processAllAvailable()
      val rows = spark.table("attr_out")
        .orderBy("purchase_id", "click_id").collect()
      assert(rows.map(r => (r.getLong(1), r.getLong(3))).toSeq ==
        Seq((900L, 100L), (900L, 101L)))
    } finally q.stop()
  }

  test("streaming result equals the batch interval join on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val out = StreamJoin.clickAttribution(
      clicks.toDF.toDF("c_ts", "c_user", "click_id"),
      purchases.toDF.toDF("p_ts", "p_user", "purchase_id"),
      lookback = "30 minutes", delay = "10 minutes")
    val q = out.writeStream
      .format("memory").queryName("attr_eq_out").outputMode("append").start()
    val cData = (0 until 20).map(i => (ts(i * 3 % 60), (i % 4).toLong, 100L + i))
    val pData = (0 until 10).map(i => (ts((i * 7 + 5) % 60), (i % 4).toLong, 900L + i))
    try {
      clicks.addData(cData: _*)
      purchases.addData(pData: _*)
      q.processAllAvailable()
      val streamed = spark.table("attr_eq_out").collect()
        .map(r => (r.getLong(1), r.getLong(3))).toSet
      val batch = StreamJoin.clickAttribution(
        cData.toDF("c_ts", "c_user", "click_id"),
        pData.toDF("p_ts", "p_user", "purchase_id"),
        "30 minutes", "10 minutes")
      val expected = batch.collect()
        .map(r => (r.getLong(1), r.getLong(3))).toSet
      assert(streamed == expected)
      assert(expected.nonEmpty)
    } finally q.stop()
  }

  test("watermark passage EVICTS join state and drops late arrivals") {
    // boundedness asserted not by shape but by the state store's own
    // metrics: rows removed once the watermark passes them, and a
    // straggler below the watermark rejected at the door
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val out = StreamJoin.clickAttribution(
      clicks.toDF.toDF("c_ts", "c_user", "click_id"),
      purchases.toDF.toDF("p_ts", "p_user", "purchase_id"),
      lookback = "30 minutes", delay = "10 minutes")
    val q = out.writeStream
      .format("memory").queryName("attr_evict_out").outputMode("append").start()
    try {
      // batch 1: both sides at 10:00-10:05 → state holds them
      clicks.addData((ts(0), 1L, 100L))
      purchases.addData((ts(5), 1L, 900L))
      q.processAllAvailable()
      // batch 2: both sides jump to 12:00 → watermark advances to
      // ~11:50; batch-1 state (10:00, beyond lookback+delay behind)
      // must be REMOVED from the store
      val far = Timestamp.valueOf("2024-01-01 12:00:00")
      clicks.addData((far, 1L, 101L))
      purchases.addData((far, 1L, 901L))
      q.processAllAvailable()
      // one more empty-ish trigger so eviction of now-expired state
      // lands in a progress report even if batch 2 deferred it
      clicks.addData((far, 2L, 102L))
      purchases.addData((far, 2L, 902L))
      q.processAllAvailable()
      val removed = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
      assert(removed > 0,
        "watermark passage removed no state rows — join state is not " +
          "actually bounded by eviction")
      // batch 3: a click at 10:00 is far below the ~11:50 watermark —
      // it must be dropped at input, never admitted to state
      clicks.addData((ts(0), 1L, 103L))
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped > 0,
        "late row below the watermark was not dropped")
    } finally q.stop()
  }

  test("stream-static enrichment: stateless broadcast join, dim misses kept") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Long, Long)]
    val dim = Seq((1L, "pod one"), (2L, "pod two"))
      .toDF("podcast_id", "podcast_title")
    val out = StreamJoin.enrich(
      events.toDF.toDF("event_id", "podcast_id"), dim, "podcast_id")
    val q = out.writeStream
      .format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      // podcast 3 has no dim row yet — the event must SURVIVE with a
      // null title, not drop
      events.addData((10L, 1L), (11L, 3L), (12L, 2L))
      q.processAllAvailable()
      // keyed join output order: (podcast_id, event_id, podcast_title)
      val rows = spark.table("enrich_out").orderBy("event_id").collect()
        .map(r => (r.getLong(1), r.getLong(0), Option(r.getString(2))))
      assert(rows.toSeq == Seq(
        (10L, 1L, Some("pod one")),
        (11L, 3L, None),
        (12L, 2L, Some("pod two"))))
      // stateless: no watermark, no state store — the progress metrics
      // of the last batch report zero stateful operators
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static join must not allocate join state")
    } finally q.stop()
  }
}
