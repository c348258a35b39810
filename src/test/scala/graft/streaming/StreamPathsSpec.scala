package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming path signatures (w20's per-session twin): closed sessions
  * emit event-time-ordered truncated paths regardless of arrival
  * order; the exact-gap pair merges (batch w20's closed boundary);
  * nothing emits for open sessions.
  */
class StreamPathsSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = graft.queries.EventWindows.SessionGapSec // 1800 s
  private val Base = Timestamp.valueOf("2024-05-01 00:00:00").getTime / 1000L

  private def ts(offSec: Long): Timestamp =
    new Timestamp((Base + offSec) * 1000L)

  private def start(
      name: String, in: MemoryStream[(Long, Long, String, Timestamp)]) =
    StreamPaths(
      in.toDF.toDF("user_id", "event_id", "event_type", "ts"), "ts", "1 hour")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()

  private def rows(name: String): Seq[(Long, Long, String, Long, Long)] =
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("closed sessions emit ordered truncated paths under shuffled arrival") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val name = s"paths_out_${System.nanoTime()}"
    val q = start(name, in)
    try {
      // user 1, one session of 5 events (truncates to 3); the 2nd and
      // 3rd events are exactly Gap apart — they must MERGE (batch
      // w20's closed `diff <= gap` boundary); user 2, a 1-event session
      val evs = Seq(
        (1L, 5L, "view", ts(0)),
        (1L, 6L, "click", ts(10)),
        (1L, 7L, "view", ts(10 + Gap)), // exact gap: same session
        (1L, 8L, "purchase", ts(20 + Gap)),
        (1L, 9L, "view", ts(30 + Gap)),
        (2L, 20L, "click", ts(0)))
      val shuffled = evs.sortBy { case (_, id, _, _) => (id * 13) % 7 }
      in.addData(shuffled: _*); q.processAllAvailable()
      assert(rows(name).isEmpty, "open sessions must not emit")
      in.addData((99L, 999L, "view", ts(Gap + 30 + Gap + 3600 + 10)))
      q.processAllAvailable()
      in.addData((99L, 998L, "view", ts(Gap + 30 + Gap + 9000)))
      q.processAllAvailable()

      val got = rows(name).filter(_._1 <= 2L).sortBy(_._1)
      assert(got.length == 2, s"expected two closed sessions: $got")
      val u1 = got.head
      assert(u1 == ((1L, ts(0).getTime * 1000L, "view>click>view", 3L, 5L)),
        s"user 1 path wrong: $u1")
      val u2 = got(1)
      assert(u2 == ((2L, ts(0).getTime * 1000L, "click", 1L, 1L)),
        s"user 2 path wrong: $u2")
    } finally q.stop()
  }

  test("a past-gap event starts a NEW session with its own path") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val name = s"paths_split_${System.nanoTime()}"
    val q = start(name, in)
    try {
      in.addData(
        (1L, 1L, "view", ts(0)),
        (1L, 2L, "click", ts(Gap + 1)), // one second past the gap
        (99L, 999L, "view", ts(Gap + 1 + Gap + 3600 + 10)))
      q.processAllAvailable()
      in.addData((99L, 998L, "view", ts(Gap + 20000)))
      q.processAllAvailable()
      val got = rows(name).filter(_._1 == 1L).sortBy(_._2)
      assert(got.map(_._3) == Seq("view", "click"),
        s"past-gap event must split sessions: $got")
    } finally q.stop()
  }
}
