package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming anomaly scores (w13's alerting twin): every closed bucket
  * with a full trailing window must carry batch w13's exact
  * (c, trail_sum, score) — gaps counted as zeros — regardless of
  * arrival order; nothing emits before the trail fills; a planted
  * burst's score is exact.
  */
class StreamAnomaliesSpec extends SparkSpec {
  import spark.implicits._

  private val B = StreamAnomalies.BucketSec // 3600 s
  private val K = StreamAnomalies.TrailBuckets // 24
  private val Base = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000L

  private def ts(bucket: Long, offSec: Long = 0L): Timestamp =
    new Timestamp((Base + bucket * B + offSec) * 1000L)

  /** Batch w13's pre-ranking fold on one key's bucket counts. */
  private def model(counts: Map[Long, Long]): Seq[(Long, Long, Long, Long)] = {
    val (mn, mx) = (counts.keys.min, counts.keys.max)
    val axis = (mn to mx).map(b => b -> counts.getOrElse(b, 0L))
    axis.zipWithIndex.collect { case ((b, c), i) if i >= K =>
      val trail = axis.slice(i - K, i).map(_._2).sum
      ((Base + b * B) * 1L, c, trail, c * K - trail)
    }
  }

  private def start(name: String, in: MemoryStream[(String, Timestamp)]) =
    StreamAnomalies(
      in.toDF.toDF("event_type", "ts"), "ts", "2 days")
      .toDF("event_type", "window_start", "n_events", "trail_sum", "score")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()

  private def aRows(name: String): Seq[(String, Long, Long, Long, Long)] =
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSeq.filter(_._1 == "A").sortBy(_._2)

  test("closed-bucket scores equal the batch fold; a planted burst scores exactly") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val name = s"anom_out_${System.nanoTime()}"
    val q = start(name, in)
    try {
      // 1 event/bucket for K buckets, a gap at K, a 7-event burst at
      // K+1, one trailing normal bucket
      val counts: Map[Long, Long] =
        (0 until K).map(b => b.toLong -> 1L).toMap +
          ((K + 1).toLong -> 7L) + ((K + 2).toLong -> 1L)
      val evs = counts.toSeq.flatMap { case (b, n) =>
        (0 until n.toInt).map(i => ("A", ts(b, 10L + i)))
      }
      val shuffled = evs.sortBy { case (_, t) => (t.getTime * 11) % 17 }
      in.addData(shuffled.take(evs.size / 2): _*); q.processAllAvailable()
      in.addData(shuffled.drop(evs.size / 2): _*); q.processAllAvailable()
      in.addData(("zz", ts(1000))); q.processAllAvailable()

      val got = aRows(name)
      val want = model(counts).map { case (ws, c, t, s) => ("A", ws, c, t, s) }
      assert(got == want, s"scores diverged:\n got=$got\nwant=$want")
      // the planted burst: trail = 23 ones + 1 zero-gap = 23;
      // score = 7*24 - 23 = 145, and it is the max
      val burst = got.find(_._2 == (Base + (K + 1) * B)).get
      assert(burst == ("A", Base + (K + 1) * B, 7L, 23L, 145L), s"$burst")
      assert(got.maxBy(_._5) == burst, "burst must top the scores")
    } finally q.stop()
  }

  test("no score emits before the trailing window fills") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val name = s"anom_warm_${System.nanoTime()}"
    val q = start(name, in)
    try {
      in.addData((0 until K).map(b => ("A", ts(b.toLong, 5))): _*)
      q.processAllAvailable()
      // sentinel: watermark passes bucket K-1's end plus a little —
      // all K warm-up buckets close, none has a full trail yet
      in.addData(("zz", ts(K.toLong + 49, 0))) // ts − 2 days ≈ bucket K + 1 h
      q.processAllAvailable()
      assert(aRows(name).isEmpty,
        "warm-up buckets must not score before the trail fills")
      // new data past the watermark; once IT closes, the gap run from
      // bucket K and the data bucket all score against the full trail
      in.addData(("A", ts(K.toLong + 2, 5))); q.processAllAvailable()
      in.addData(("zz", ts(2000))); q.processAllAvailable()
      val rows = aRows(name)
      assert(rows.nonEmpty, "post-warm-up buckets must score")
      // first scored bucket is K (a gap, c=0, trail = K ones)
      assert(rows.head == ("A", Base + K * B, 0L, K.toLong, -K.toLong),
        s"first scorable bucket wrong: ${rows.head}")
      // the data bucket scored with the gap-adjusted trail
      val data = rows.find(_._2 == Base + (K + 2) * B).get
      assert(data._3 == 1L && data._4 == K.toLong - 2L,
        s"data bucket must score against the gap-adjusted trail: $data")
    } finally q.stop()
  }
}
