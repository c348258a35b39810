package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming attribution (w18's per-conversion twin): settled
  * purchases emit their in-window touches with batch w18's exact
  * integer credits under shuffled arrival; boundary touches honor the
  * [pus−30min, pus) interval exactly; conversions without touches
  * emit nothing; credits always sum to 10⁶ per conversion.
  */
class StreamAttributionSpec extends SparkSpec {
  import spark.implicits._

  private val Base = Timestamp.valueOf("2024-03-01 00:00:00").getTime / 1000L
  private val W = 1800L

  private def ts(offSec: Long): Timestamp =
    new Timestamp((Base + offSec) * 1000L)

  private def start(
      name: String, in: MemoryStream[(Long, Long, String, Timestamp)]) =
    StreamAttribution(
      in.toDF.toDF("user_id", "event_id", "event_type", "ts"), "ts", "1 hour")
      .toDF("user_id", "pid", "tid", "touch_type", "ppm")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()

  private def rows(name: String): Seq[(Long, Long, Long, String, Long)] =
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSeq

  test("settled purchases emit exact integer credits; boundaries honored") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val name = s"attr_out_${System.nanoTime()}"
    val q = start(name, in)
    try {
      // user 1: purchase at t=3000 with touches at 1201 (in, exactly
      // pus−W+1), 1200 (exactly pus−W: IN — closed lower bound), 1199
      // (out by 1 s), 2999 (in, the latest → remainder), 3000 (out —
      // strictly before); plus a touch-less purchase for user 2
      val evs = Seq(
        (1L, 100L, "purchase", ts(3000)),
        (1L, 10L, "view", ts(1201)),
        (1L, 11L, "click", ts(1200)),
        (1L, 12L, "view", ts(1199)),
        (1L, 13L, "click", ts(2999)),
        (1L, 14L, "view", ts(3000)),
        (2L, 200L, "purchase", ts(3000)))
      val shuffled = evs.sortBy { case (_, id, _, _) => (id * 7) % 5 }
      in.addData(shuffled: _*); q.processAllAvailable()
      assert(rows(name).isEmpty, "nothing settles before the watermark")
      // advance the watermark past the purchases (delay 1 h)
      in.addData((99L, 999L, "view", ts(3000 + 3600 + 5)))
      q.processAllAvailable()
      in.addData((99L, 998L, "view", ts(3000 + 7200)))
      q.processAllAvailable()

      val got = rows(name).filter(_._1 == 1L).sortBy(_._3)
      // in-window touches: 10 (1201), 11 (1200), 13 (2999) → n=3,
      // base 333333, remainder 1 to the latest (13)
      assert(got.map(_._3) == Seq(10L, 11L, 13L),
        s"attributed touch set wrong: $got")
      val ppm = got.map(t => t._3 -> t._5).toMap
      assert(ppm(10L) == 333333L && ppm(11L) == 333333L
        && ppm(13L) == 333334L, s"credits wrong: $ppm")
      assert(got.map(_._5).sum == 1000000L, "credits must sum to 1e6")
      assert(rows(name).forall(_._1 != 2L),
        "touch-less conversions must emit nothing")
    } finally q.stop()
  }

  test("a late-but-in-delay touch slots in before settlement") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val name = s"attr_late_${System.nanoTime()}"
    val q = start(name, in)
    try {
      in.addData((1L, 100L, "purchase", ts(3000)),
        (1L, 10L, "view", ts(2900)))
      q.processAllAvailable()
      // a touch OLDER than the purchase arrives later but within the
      // 1 h delay — the purchase has not settled, so it must count
      in.addData((1L, 11L, "click", ts(2800)))
      q.processAllAvailable()
      in.addData((99L, 999L, "view", ts(3000 + 3600 + 5)))
      q.processAllAvailable()
      in.addData((99L, 998L, "view", ts(3000 + 7200)))
      q.processAllAvailable()
      val got = rows(name).filter(_._1 == 1L).sortBy(_._3)
      assert(got.map(_._3) == Seq(10L, 11L), s"late touch lost: $got")
      assert(got.map(_._5).sum == 1000000L)
    } finally q.stop()
  }

  test("touch state prunes to the attribution horizon") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val name = s"attr_prune_${System.nanoTime()}"
    val q = start(name, in)
    try {
      // a touch, then a purchase far past the window: the touch must
      // NOT be attributed (out of window) and state must not retain it
      in.addData((1L, 10L, "view", ts(100)))
      q.processAllAvailable()
      in.addData((1L, 100L, "purchase", ts(100 + W + 7200)))
      q.processAllAvailable()
      in.addData((99L, 999L, "view", ts(100 + W + 7200 + 3600 + 5)))
      q.processAllAvailable()
      in.addData((99L, 998L, "view", ts(100 + W + 20000)))
      q.processAllAvailable()
      assert(rows(name).isEmpty,
        "an out-of-window touch must earn no credit")
    } finally q.stop()
  }
}
