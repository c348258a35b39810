package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming PIT enrichment — the w22 twin: facts arriving in ANY
  * order enrich against the SCD2 version in effect strictly before
  * their own EVENT time, equal to the batch as-of on the same data.
  */
class StreamPitSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private def us(min: Int): Long = ts(min).getTime * 1000L

  /** w21-shaped static dimension: user 1 free→premium at 10:20,
    * user 2 premium throughout.
    */
  private def dim() = Seq(
    (1L, 1L, "free", us(0), us(20), false, 3L),
    (1L, 2L, "premium", us(20), -1L, true, 2L),
    (2L, 1L, "premium", us(5), -1L, true, 7L))
    .toDF("user_id", "version", "event_type",
      "valid_from_us", "valid_to_us", "is_current", "n_events")

  test("facts land on the version in effect strictly before their event time") {
    implicit val sqlCtx = spark.sqlContext
    val facts = MemoryStream[(Timestamp, Long, Long)]
    val out = StreamPit(
      facts.toDF.toDF("ts", "user_id", "event_id"), dim(), "ts")
    val q = out.writeStream
      .format("memory").queryName("pit_out").outputMode("append").start()
    try {
      facts.addData(
        (ts(10), 1L, 900L), // inside free [0,20)
        (ts(20), 1L, 901L), // AT the boundary: t−1µs → still free
        (ts(30), 1L, 902L), // premium
        (ts(7), 2L, 903L), // premium v1
        (ts(1), 3L, 904L)) // user 3 has no dimension → drops
      q.processAllAvailable()
      val got = spark.table("pit_out")
        .select("purchase_id", "version", "state_type")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSeq.sortBy(_._1)
      assert(got == Seq(
        (900L, 1L, "free"),
        (901L, 1L, "free"),
        (902L, 2L, "premium"),
        (903L, 1L, "premium")), s"PIT drifted: $got")
    } finally q.stop()
  }

  test("shuffled and late arrivals equal the batch as-of (event time, never arrival time)") {
    implicit val sqlCtx = spark.sqlContext
    val facts = MemoryStream[(Timestamp, Long, Long)]
    val out = StreamPit(
      facts.toDF.toDF("ts", "user_id", "event_id"), dim(), "ts")
    val q = out.writeStream
      .format("memory").queryName("pit_shuf").outputMode("append").start()
    val data = Seq(
      (ts(45), 1L, 910L), (ts(3), 1L, 911L), (ts(25), 2L, 912L),
      (ts(19), 1L, 913L), (ts(21), 1L, 914L), (ts(6), 2L, 915L))
    try {
      // reversed-time arrival, split across micro-batches: a fact
      // whose EVENT time predates the dimension change must still
      // enrich against the OLD version however late it arrives
      val shuffled = data.sortBy(-_._1.getTime)
      facts.addData(shuffled.take(3): _*)
      q.processAllAvailable()
      facts.addData(shuffled.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("pit_shuf")
        .select("purchase_id", "version", "state_type")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      val batch = StreamPit(
        data.toDF("ts", "user_id", "event_id"), dim(), "ts")
        .select("purchase_id", "version", "state_type")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(streamed.contains((911L, 1L, "free")),
        "the late pre-change fact must land on the OLD version")
      assert(streamed.contains((914L, 2L, "premium")))
    } finally q.stop()
  }

  test("the plan is stateless: no streaming state operator, dim broadcast-able") {
    implicit val sqlCtx = spark.sqlContext
    val facts = MemoryStream[(Timestamp, Long, Long)]
    val out = StreamPit(
      facts.toDF.toDF("ts", "user_id", "event_id"), dim(), "ts")
    val q = out.writeStream
      .format("memory").queryName("pit_state").outputMode("append").start()
    try {
      facts.addData((ts(10), 1L, 900L))
      q.processAllAvailable()
      val progress = q.lastProgress
      assert(progress.stateOperators.isEmpty,
        "stream-static PIT must carry ZERO streaming state")
    } finally q.stop()
  }
}
