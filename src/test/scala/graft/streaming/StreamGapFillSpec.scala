package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming gap-fill (w7's twin): closed buckets must emit batch w7's
  * exact rows — zero-rows for interior gaps, carry-forward of the last
  * non-gap sum — regardless of arrival order; nothing emits while the
  * watermark can still feed a bucket; and an idle series emits no
  * trailing filler (the axis ends at the key's max DATA bucket, as
  * batch's sequence() axis does).
  */
class StreamGapFillSpec extends SparkSpec {
  import spark.implicits._

  private val T = StreamGapFill.TumbleSec // 300 s buckets
  private val Base = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000L

  private def ts(bucket: Long, offSec: Long = 0L): Timestamp =
    new Timestamp((Base + bucket * T + offSec) * 1000L)

  /** Batch w7's fold on one key's (bucket, cents) events. */
  private def model(evs: Seq[(Long, Long)]): Seq[(Long, Long, Boolean, Long)] = {
    val agg = evs.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val (mn, mx) = (agg.keys.min, agg.keys.max)
    var carry = 0L
    (mn to mx by T).map { b =>
      agg.get(b) match {
        case Some((n, c)) => carry = c; (b, n, false, c)
        case None => (b, 0L, true, carry)
      }
    }
  }

  private def outRows(name: String): Seq[(String, Long, Long, Boolean, Long)] =
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
      .toSeq.filter(_._1 != "zz").sortBy(r => (r._1, r._2))

  test("closed buckets equal batch w7's fold on shuffled arrivals, gaps filled") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val name = s"gap_out_${System.nanoTime()}"
    // delay must cover the fixture's full out-of-orderness (the
    // shuffle can deliver bucket 4 before bucket 0 — 1205 s apart)
    val q = StreamGapFill(
      in.toDF.toDF("event_type", "ts", "value"), "ts", "30 minutes")
      .toDF("event_type", "window_start", "n_events", "is_gap", "carry_cents")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // A: data at buckets 0, 3, 4 (interior gap of 2); B: bucket 1 only
      val evs = Seq(
        ("A", ts(0, 10), 1.25), ("A", ts(0, 200), 2.00),
        ("A", ts(3, 30), 4.50), ("A", ts(4, 5), 0.75),
        ("B", ts(1, 60), 9.99))
      val shuffled = evs.sortBy { case (k, t, _) => (t.getTime * 7 + k.hashCode) % 13 }
      in.addData(shuffled.take(2): _*); q.processAllAvailable()
      in.addData(shuffled.drop(2): _*); q.processAllAvailable()
      // sentinel pushes the watermark past every data bucket
      in.addData(("zz", ts(1000), 0.0)); q.processAllAvailable()

      val wantA = model(Seq(
        (0L * T, 125L), (0L * T, 200L), (3L * T, 450L), (4L * T, 75L))
        .map { case (o, c) => (Base / T * T + o, c) })
        // buckets are absolute epoch-sec starts
        .map { case (b, n, g, c) => ("A", b, n, g, c) }
      val wantB = model(Seq((Base / T * T + 1L * T, 999L)))
        .map { case (b, n, g, c) => ("B", b, n, g, c) }
      val got = outRows(name)
      assert(got == (wantA ++ wantB).sortBy(r => (r._1, r._2)),
        s"gap-fill diverged:\n got=$got\nwant=${wantA ++ wantB}")
      // the interior gap rows exist and carry the last non-gap sum
      assert(got.count(r => r._1 == "A" && r._4) == 2)
      assert(got.filter(r => r._1 == "A" && r._4).forall(_._5 == 325L),
        "gap rows must carry bucket 0's 325 cents forward")
    } finally q.stop()
  }

  test("no bucket emits while the watermark can still feed it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val name = s"gap_wm_${System.nanoTime()}"
    val q = StreamGapFill(
      in.toDF.toDF("event_type", "ts", "value"), "ts", "10 minutes")
      .toDF("event_type", "window_start", "n_events", "is_gap", "carry_cents")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(("A", ts(0, 10), 1.0), ("A", ts(0, 250), 2.0))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0,
        "open bucket must not emit while the watermark is inside it")
    } finally q.stop()
  }

  test("an idle series emits no trailing filler past its max data bucket") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val name = s"gap_idle_${System.nanoTime()}"
    val q = StreamGapFill(
      in.toDF.toDF("event_type", "ts", "value"), "ts", "10 minutes")
      .toDF("event_type", "window_start", "n_events", "is_gap", "carry_cents")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(("A", ts(0, 10), 1.0)); q.processAllAvailable()
      // other-key traffic pushes the watermark FAR past A's bucket
      in.addData(("zz", ts(500), 0.0)); q.processAllAvailable()
      in.addData(("zz", ts(900), 0.0)); q.processAllAvailable()
      val a = outRows(name).filter(_._1 == "A")
      assert(a == Seq(("A", Base / T * T, 1L, false, 100L)),
        s"idle series must emit exactly its data bucket, no filler: $a")
    } finally q.stop()
  }
}
