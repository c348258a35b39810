package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming funnel: stages must match w8's batch rule regardless of
  * arrival order (the state defers the fold to emission), flags emit
  * only after the user goes quiet past the watermark, and dead step
  * times are pruned from state.
  */
class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  private def runStream(
      batches: Seq[Seq[(Timestamp, Long, String)]]): Map[Long, Int] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val df = in.toDF.toDF("ts", "user_id", "event_type")
    val name = s"funnel_out_${System.nanoTime()}"
    val q = StreamFunnel(df, "ts", "10 minutes").writeStream
      .format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      // push the watermark far past every user's last event so all
      // timeouts fire and every flag is emitted
      in.addData((Timestamp.valueOf("2024-01-03 00:00:00"), 999L, "view"))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-05 00:00:00"), 999L, "view"))
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    } finally q.stop()
  }

  test("in-order users reach their batch stages") {
    val flags = runStream(Seq(Seq(
      // user 1: full chain
      (ts(0), 1L, "view"), (ts(5), 1L, "click"), (ts(9), 1L, "purchase"),
      // user 2: purchase BEFORE the click → stage 2 only
      (ts(0), 2L, "view"), (ts(3), 2L, "purchase"), (ts(6), 2L, "click"),
      // user 3: clicks only, never views → stage 0
      (ts(2), 3L, "click"), (ts(4), 3L, "click"),
      // user 4: view only
      (ts(1), 4L, "view"))))
    assert(flags(1L) == 3 && flags(2L) == 2 && flags(3L) == 0 && flags(4L) == 1,
      s"got $flags")
  }

  test("out-of-order arrival across micro-batches converges to the batch answer") {
    // the click and purchase arrive FIRST; the anchoring view arrives
    // two micro-batches later with an EARLIER event time — a greedy
    // state machine would have discarded both steps
    val flags = runStream(Seq(
      Seq((ts(5), 1L, "click")),
      Seq((ts(9), 1L, "purchase")),
      Seq((ts(0), 1L, "view"))))
    assert(flags(1L) == 3, s"late-arriving anchor must still count: $flags")
  }

  test("steps outside the anchored window do not convert") {
    // click lands 25h after the first view — beyond the 24h window
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
    val late = Timestamp.valueOf("2024-01-02 01:00:00")
    val flags = runStream(Seq(Seq(
      (base, 1L, "view"), (late, 1L, "click"))))
    assert(flags(1L) == 1, s"out-of-window click must not convert: $flags")
  }

  test("streaming stages equal the batch fold on shuffled arrivals") {
    // deterministic pseudo-shuffle of a mixed workload, delivered in
    // 3 arbitrary micro-batch cuts
    val events = Seq(
      (ts(0), 1L, "view"), (ts(2), 1L, "click"), (ts(4), 1L, "purchase"),
      (ts(1), 2L, "view"), (ts(3), 2L, "click"),
      (ts(6), 3L, "purchase"), (ts(7), 3L, "view"),
      (ts(5), 4L, "click"), (ts(8), 4L, "view"), (ts(9), 4L, "click"))
    val shuffled = events.sortBy { case (t, u, ty) =>
      (t.getTime * 31 + u * 17 + ty.hashCode) % 97
    }
    val cuts = Seq(shuffled.take(3), shuffled.slice(3, 7), shuffled.drop(7))
    val streamed = runStream(cuts) - 999L
    val batch = events.groupBy(_._2).map { case (u, evs) =>
      val t1 = evs.filter(_._3 == "view").map(_._1.getTime * 1000).sorted.headOption
      val t2 = t1.flatMap(a => evs.filter(_._3 == "click")
        .map(_._1.getTime * 1000)
        .filter(c => c > a && c <= a + StreamFunnel.WindowUs).sorted.headOption)
      val t3 = t2.flatMap(b => evs.filter(_._3 == "purchase")
        .map(_._1.getTime * 1000)
        .filter(p => p > b && p <= t1.get + StreamFunnel.WindowUs)
        .sorted.headOption)
      u -> (if (t3.isDefined) 3 else if (t2.isDefined) 2
            else if (t1.isDefined) 1 else 0)
    }
    assert(streamed == batch, s"streaming $streamed vs batch $batch")
  }
}
