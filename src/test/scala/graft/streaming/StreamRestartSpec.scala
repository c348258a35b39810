package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Checkpoint-recovery durability: a production ingest stream WILL be
  * restarted (deploys, preemptions, failures), and dedup correctness
  * across the restart is exactly the state the checkpoint carries —
  * if the fingerprint/signature state were lost, a duplicate arriving
  * after the restart would sail through as "new". Both stateful dedup
  * ops are driven through stop → new query from the same checkpoint:
  *   - exact dedup (`dropDuplicatesWithinWatermark` fingerprint state);
  *   - SimHash near-dedup (`flatMapGroupsWithState` bucket state).
  * File sinks (fault-tolerant, unlike the memory sink) + the same
  * MemoryStream instance so committed offsets resolve on resume.
  */
class StreamRestartSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val spam = Seq.fill(20)("spam").mkString(" ")
  private val docA = s"$spam unique1"
  private val docB = s"$spam unique2"

  test("exact-dedup fingerprint state survives a query restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("graft_ck_exact")
    val out = tmp("graft_out_exact")
    val in = MemoryStream[(Timestamp, Long, String)]
    val df = in.toDF.toDF("ts", "doc_id", "text")
    def start(): StreamingQuery =
      StreamDedup.exactDedup(df, "ts", "10 minutes").writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    val q1 = start()
    try {
      in.addData((ts(0), 1L, "alpha beta"), (ts(1), 2L, "gamma delta"))
      q1.processAllAvailable()
    } finally q1.stop()
    // arrives while the query is DOWN; doc 3 duplicates doc 1's text
    // within the watermark — only restored state can catch it
    in.addData((ts(2), 3L, "alpha beta"), (ts(3), 4L, "epsilon zeta"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L),
      s"duplicate must be dropped across the restart, got $ids")
  }

  test("near-dedup bucket state survives a query restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("graft_ck_near")
    val out = tmp("graft_out_near")
    val in = MemoryStream[(Timestamp, Long, String)]
    val df = in.toDF.toDF("ts", "doc_id", "text")
    def start(): StreamingQuery =
      StreamNearDedup(df, "ts", "10 minutes").writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    val q1 = start()
    try {
      in.addData((ts(0), 1L, docA))
      q1.processAllAvailable()
    } finally q1.stop()
    // docB: different md5, identical SimHash — flaggable only if the
    // bucket's (id, signature, ts) state was restored from checkpoint
    in.addData((ts(2), 2L, docB))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val flags = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(flags(1L) == ((-1L, 0)), s"first doc must be fresh: $flags")
    assert(flags(2L) == ((1L, 0)),
      s"near-dup after restart must flag the pre-restart original: $flags")
  }

  test("open session-window state survives a query restart (merges across it)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("graft_ck_sess")
    val out = tmp("graft_out_sess")
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF.toDF("ts", "user_id")
    def start(): StreamingQuery =
      StreamSessions(df, "ts", "1 minute").writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    val q1 = start()
    try {
      in.addData((ts(0), 1L), (ts(10), 1L))
      q1.processAllAvailable()
    } finally q1.stop()
    // arrives while the query is DOWN, within the gap of the OPEN
    // session — only restored session state can merge it; the far
    // sentinel then closes everything
    in.addData((ts(20), 1L))
    in.addData((Timestamp.valueOf("2030-01-01 00:00:00"), 999L))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 == 1L)
    val t0us = ts(0).getTime * 1000L
    val t20us = ts(20).getTime * 1000L
    assert(rows.toSeq == Seq((1L, t0us, t20us, 3L)),
      s"post-restart event must merge into the pre-restart open session: ${rows.toSeq}")
  }

  test("open SCD2 version state survives a query restart (closes with pre-restart start)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("graft_ck_scd2")
    val out = tmp("graft_out_scd2")
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val df = in.toDF.toDF("user_id", "ts", "event_id", "event_type")
    def start(): StreamingQuery =
      StreamScd2(df, "ts", "1 minute")
        .toDF("user_id", "version", "event_type",
          "valid_from_us", "valid_to_us", "n_events")
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    val q1 = start()
    try {
      in.addData((1L, ts(0), 1L, "A"), (1L, ts(5), 2L, "A"))
      q1.processAllAvailable()
    } finally q1.stop()
    // the type change arrives while the query is DOWN: version 1 can
    // only close with the correct pre-restart valid_from/n if the
    // open-version state was restored
    in.addData((1L, ts(10), 3L, "B"))
    in.addData((999L, Timestamp.valueOf("2030-01-01 00:00:00"), 9L, "x"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .filter(_._1 == 1L)
    assert(rows.toSeq == Seq(
      (1L, 1L, "A", ts(0).getTime * 1000L, ts(10).getTime * 1000L, 2L)),
      s"version must close across the restart with restored state: ${rows.toSeq}")
  }

  test("decay day-bucket state survives a query restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("graft_ck_decay")
    val out = tmp("graft_out_decay")
    val in = MemoryStream[(Long, Double, Timestamp)]
    val df = in.toDF.toDF("user_id", "value", "ts")
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
    def day(d: Long): Timestamp =
      new Timestamp(base.getTime + d * 86400000L + 10000L)
    def start(): StreamingQuery =
      StreamDecay(df, "ts", "1 day")
        .toDF("user_id", "day", "n_events", "decayed_cents", "score")
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    val q1 = start()
    try {
      in.addData((1L, 1.50, day(0)))
      q1.processAllAvailable()
    } finally q1.stop()
    // a day-10 event arrives while the query is DOWN: its emitted
    // score must still carry day 0's 150 cents at one half-life step
    // (2^31) — possible only from restored bucket state
    in.addData((1L, 1.00, day(10)))
    in.addData((999L, 0.01, day(60)))
    in.addData((999L, 0.01, day(120)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 == 1L).sortBy(_._2)
    val baseDay = base.getTime * 1000L / StreamDecay.DayUs
    assert(rows.map(_._2).toSeq == Seq(baseDay, baseDay + 10L),
      s"both event days must emit across the restart: ${rows.toSeq}")
    assert(rows(1)._4 == 150L * (1L << 31) + 100L * (1L << 32),
      s"day-10 score must include the pre-restart bucket: ${rows(1)}")
  }

  test("attribution touch state survives a query restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("graft_ck_attr")
    val out = tmp("graft_out_attr")
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val df = in.toDF.toDF("user_id", "event_id", "event_type", "ts")
    def att(sec: Long): Timestamp =
      new Timestamp(Timestamp.valueOf("2024-03-01 00:00:00").getTime
        + sec * 1000L)
    def start(): StreamingQuery =
      StreamAttribution(df, "ts", "1 hour")
        .toDF("user_id", "pid", "tid", "touch_type", "ppm")
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    val q1 = start()
    try {
      in.addData((1L, 10L, "view", att(2900)))
      q1.processAllAvailable()
    } finally q1.stop()
    // the purchase lands while the query is DOWN; when it settles
    // post-restart, its full credit must flow to the pre-restart
    // touch — possible only from restored touch state
    in.addData((1L, 100L, "purchase", att(3000)))
    in.addData((999L, 999L, "view", att(3000 + 7200)))
    in.addData((999L, 998L, "view", att(3000 + 20000)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .filter(_._1 == 1L)
    assert(rows.toSeq == Seq((1L, 100L, 10L, 1000000L)),
      s"the pre-restart touch must take the full credit: ${rows.toSeq}")
  }
}
