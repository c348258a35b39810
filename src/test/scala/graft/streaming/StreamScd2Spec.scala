package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming SCD2 (w21's twin): closed versions must equal the batch
  * fold's non-current rows regardless of arrival order — including an
  * event delivered late (within delay) that belongs in the MIDDLE of
  * a settled-looking run; the open version must never emit.
  */
class StreamScd2Spec extends SparkSpec {
  import spark.implicits._

  private val BaseUs =
    Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L

  private def ts(sec: Long): Timestamp =
    new Timestamp((BaseUs + sec * 1000000L) / 1000L)

  /** Batch w21's fold: closed versions only (drop the is_current row). */
  private def model(evs: Seq[(Long, Long, Long, String)])
      : Seq[(Long, Long, String, Long, Long, Long)] =
    evs.groupBy(_._1).toSeq.flatMap { case (user, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val runs = sorted.foldLeft(Vector.empty[(String, Long, Long)]) {
        case (acc, (_, tus, _, t)) =>
          if (acc.nonEmpty && acc.last._1 == t)
            acc.init :+ (acc.last._1, acc.last._2, acc.last._3 + 1)
          else acc :+ (t, tus, 1L)
      }
      runs.zipWithIndex.dropRight(1).map { case ((t, from, n), i) =>
        (user, i + 1L, t, from, runs(i + 1)._2, n)
      }
    }.sortBy(r => (r._1, r._2))

  private def collectOut(name: String): Seq[(Long, Long, String, Long, Long, Long)] =
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq.filter(_._1 != 999L).sortBy(r => (r._1, r._2))

  test("closed versions equal batch w21's fold on shuffled arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val name = s"scd2_eq_${System.nanoTime()}"
    val q = StreamScd2(
      in.toDF.toDF("user_id", "ts", "event_id", "event_type"),
      "ts", "30 minutes")
      .toDF("user_id", "version", "event_type",
        "valid_from_us", "valid_to_us", "n_events")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // user 1: view view click view view buy; user 2: click click view
      val evs = Seq(
        (1L, 0L, 1L, "view"), (1L, 60L, 2L, "view"),
        (1L, 120L, 3L, "click"), (1L, 180L, 4L, "view"),
        (1L, 240L, 5L, "view"), (1L, 300L, 6L, "buy"),
        (2L, 30L, 7L, "click"), (2L, 90L, 8L, "click"),
        (2L, 150L, 9L, "view"))
      val shuffled = evs.sortBy { case (u, s, id, _) => (s * 13 + id * 7 + u) % 23 }
      val toRow = (e: (Long, Long, Long, String)) =>
        (e._1, ts(e._2), e._3, e._4)
      in.addData(shuffled.take(4).map(toRow): _*); q.processAllAvailable()
      in.addData(shuffled.drop(4).map(toRow): _*); q.processAllAvailable()
      in.addData((999L, Timestamp.valueOf("2030-01-01 00:00:00"), 99L, "x"))
      q.processAllAvailable()
      val got = collectOut(name)
      val want = model(evs.map { case (u, s, id, t) =>
        (u, BaseUs + s * 1000000L, id, t) })
      assert(got == want, s"versions diverge:\n got=$got\nwant=$want")
      // the open versions (1:"buy", 2:"view") must NOT have emitted
      assert(!got.exists(r => r._1 == 1L && r._3 == "buy"))
      assert(!got.exists(r => r._1 == 2L && r._3 == "view" && r._2 == 2L))
    } finally q.stop()
  }

  test("a late-within-delay event slots into the middle of its true run") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val name = s"scd2_late_${System.nanoTime()}"
    val q = StreamScd2(
      in.toDF.toDF("user_id", "ts", "event_id", "event_type"),
      "ts", "30 minutes")
      .toDF("user_id", "version", "event_type",
        "valid_from_us", "valid_to_us", "n_events")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // delivered: A@0, B@300 — then A@120 arrives LATE (within delay).
      // True history: A-run {0,120} then B — one closed version (A, n=2)
      in.addData((1L, ts(0), 1L, "A"), (1L, ts(300), 2L, "B"))
      q.processAllAvailable()
      in.addData((1L, ts(120), 3L, "A"))
      q.processAllAvailable()
      in.addData((999L, Timestamp.valueOf("2030-01-01 00:00:00"), 99L, "x"))
      q.processAllAvailable()
      val got = collectOut(name)
      assert(got == Seq(
        (1L, 1L, "A", BaseUs, BaseUs + 300L * 1000000L, 2L)),
        s"late event must join its run before folding: $got")
    } finally q.stop()
  }
}
