package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The composed ingest pipeline (near-dedup → windowed distinct) in
  * ONE streaming query, held to batch equivalence on SHUFFLED
  * arrivals: micro-batches arrive out of day order, docs arrive
  * shuffled within each micro-batch, and the closed-window counts
  * must equal the batch reference — the same per-bucket scan in
  * (event time, doc id) order, then the same HLL++ distinct over the
  * surviving docs.
  */
class StreamDedupSketchSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-0$day 10:$min%02d:00")

  // spam-dominated families: 20 identical votes pin every SimHash bit,
  // so two docs of one family collide at Hamming 0 while different
  // families (different spam word) diverge
  private def fam(word: String, n: Int) =
    Seq.fill(20)(word).mkString(" ") + s" unique$n"

  // (doc_id, ts, text): day 1 holds a dup pair + 2 singles, day 2 a
  // dup pair + 1 single
  private val docs: Seq[(Long, Timestamp, String)] = Seq(
    (1L, ts(1, 0), fam("alpha", 1)),
    (2L, ts(1, 5), fam("alpha", 2)), // near-dup of 1, same day
    (3L, ts(1, 10), fam("beta", 3)),
    (4L, ts(1, 20), "totally different words here entirely now"),
    (5L, ts(2, 0), fam("gamma", 5)),
    (6L, ts(2, 3), fam("gamma", 6)), // near-dup of 5, same day
    (7L, ts(2, 30), "another unrelated pile of words altogether"))

  /** The batch reference: per band bucket, scan docs in (ts, doc_id)
    * order and keep a doc iff no already-seen signature in its bucket
    * sits within HammingMax — the exact rule `scanBucket` applies.
    */
  private def referenceKept: Set[Long] = {
    val sigs = docs.toDF("doc_id", "ts", "text")
      .select(col("doc_id"), col("ts"),
        StreamNearDedup.simhashCol(col("text")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    sigs.groupBy(_._3 & StreamNearDedup.BandMask).toSeq.flatMap {
      case (_, ds) =>
        var seen = List.empty[Long]
        ds.sortBy(d => (d._2.getTime, d._1)).toSeq.flatMap {
          case (id, _, sv) =>
            val dup = seen.exists(s =>
              java.lang.Long.bitCount(s ^ sv) <= StreamNearDedup.HammingMax)
            seen ::= sv
            if (dup) None else Some(id)
        }
    }.toSet
  }

  test("composed dedup -> windowed distinct equals batch on shuffled arrivals") {
    val kept = referenceKept
    // fixture preconditions: each day's dup is dropped, singles survive
    assert(kept == Set(1L, 3L, 4L, 5L, 7L), s"fixture drifted: $kept")

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    // the dedup stage is same-batch pass-through with equal delays, so
    // the blanket fMGWS-before-agg correctness flag does not apply —
    // see the StreamDedupSketch Scaladoc for the full argument
    val (checkKey, checkVal) = StreamDedupSketch.RequiredConf
    val prior = spark.conf.getOption(checkKey)
    spark.conf.set(checkKey, checkVal)
    val q = StreamDedupSketch(
      in.toDF.toDF("doc_id", "ts", "text"), "ts", "2 days")
      .writeStream.format("memory").queryName("dedup_sketch_out")
      .outputMode("append").start()
    try {
      // SHUFFLED: day 2 arrives before day 1; docs shuffled in-batch.
      // Every neighbourhood lands inside one micro-batch, where the
      // scan's (ts, doc_id) ordering makes flags arrival-independent.
      in.addData(docs.filter(_._2.getTime >= ts(2, 0).getTime)
        .sortBy(_._1)(Ordering[Long].reverse).map(d => (d._1, d._2, d._3)): _*)
      q.processAllAvailable()
      in.addData(docs.filter(_._2.getTime < ts(2, 0).getTime)
        .sortBy(_._3).map(d => (d._1, d._2, d._3)): _*)
      q.processAllAvailable()
      // nothing closed yet: the watermark (max ts − 2 days) is still
      // before day 1's window end
      assert(spark.table("dedup_sketch_out").count() == 0L,
        "windows must not close before the watermark passes them")
      // closing event: day 9 pushes the watermark past both windows
      in.addData((99L, ts(9, 0), "closer"))
      q.processAllAvailable()

      val got = spark.table("dedup_sketch_out").collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      // batch equivalence: same HLL++ over the reference survivors,
      // grouped by the same day window
      val expected = docs.filter(d => kept(d._1))
        .toDF("doc_id", "ts", "text")
        .groupBy(window(col("ts"), StreamDedupSketch.WindowLength))
        .agg(approx_count_distinct(col("doc_id")).as("n"))
        .collect().map(r => (r.getStruct(0).getTimestamp(0), r.getLong(1)))
        .toMap
      assert(got == expected,
        s"composed streaming diverged from batch: $got vs $expected")
      assert(got.size == 2, s"both day windows must have closed: $got")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(checkKey, v)
        case None => spark.conf.unset(checkKey)
      }
    }
  }

  test("building the chain without the required conf fails loudly, naming the key") {
    implicit val sqlCtx = spark.sqlContext
    val (checkKey, _) = StreamDedupSketch.RequiredConf
    val prior = spark.conf.getOption(checkKey)
    spark.conf.unset(checkKey) // default: check enabled
    try {
      val in = MemoryStream[(Long, Timestamp, String)]
      val ex = intercept[IllegalArgumentException] {
        StreamDedupSketch(in.toDF.toDF("doc_id", "ts", "text"), "ts", "2 days")
      }
      assert(ex.getMessage.contains(checkKey),
        s"error must name the conf key: ${ex.getMessage}")
    } finally prior.foreach(spark.conf.set(checkKey, _))
  }
}
