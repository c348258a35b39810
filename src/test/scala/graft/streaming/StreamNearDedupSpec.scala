package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming SimHash near-dedup: the signature must be bit-identical to
  * the batch operator's, near-duplicates (different md5, close SimHash)
  * must be flagged within the watermark, and bucket state must be
  * evicted once the watermark passes.
  */
class StreamNearDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  // 20 'spam' votes dominate every bit (margin ≥ 19), so the trailing
  // unique word cannot flip any bit: different text, SAME signature —
  // the near-dup exact dedup can never catch
  private val spam = Seq.fill(20)("spam").mkString(" ")
  private val docA = s"$spam unique1"
  private val docB = s"$spam unique2"
  private val docC = "totally different words here entirely now"

  test("streaming simhash equals the batch signature bit-for-bit") {
    val out = java.nio.file.Files.createTempDirectory("graft_snd").toString
    Seq((0L, docA), (1L, docB), (2L, docC)).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/documents.parquet")
    val batch = graft.queries.Dedup.simhashValues(spark, out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streaming = Seq((0L, docA), (1L, docB), (2L, docC))
      .toDF("doc_id", "text")
      .select(col("doc_id"), StreamNearDedup.simhashCol(col("text")).as("sv"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streaming == batch,
      s"streaming/batch signature drift: $streaming vs $batch")
    // fixture preconditions the dedup test relies on
    assert(batch(0L) == batch(1L), "spam-dominated pair must collide")
    assert((batch(0L) & StreamNearDedup.BandMask)
      != (batch(2L) & StreamNearDedup.BandMask),
      "the unrelated doc must land in a different band bucket")
  }

  test("near-dup flagged within watermark; state evicted after it passes") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val df = in.toDF.toDF("ts", "doc_id", "text")
    val q = StreamNearDedup(df, "ts", "10 minutes").writeStream
      .format("memory").queryName("neardedup_out")
      .outputMode("append").start()
    try {
      in.addData((ts(0), 1L, docA), (ts(1), 7L, docC))
      q.processAllAvailable()
      // docB: different text (different md5 — exact dedup passes it),
      // identical SimHash → flagged against doc 1 at Hamming 0
      in.addData((ts(2), 2L, docB))
      q.processAllAvailable()
      // advance the watermark past ts(2)+10min via an unrelated bucket
      in.addData((ts(40), 8L, docC))
      q.processAllAvailable()
      // same near-dup text again — original aged out, NOT flagged
      in.addData((ts(41), 3L, docB))
      q.processAllAvailable()
      val flags = spark.table("neardedup_out").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
      assert(flags(1L) == ((-1L, 0)), s"first doc must be fresh: $flags")
      assert(flags(2L) == ((1L, 0)),
        s"near-dup within watermark must flag the original: $flags")
      assert(flags(3L) == ((-1L, 0)),
        s"state must evict after the watermark passes: $flags")
      assert(flags(7L) == ((-1L, 0)) && flags(8L)._1 != 1L && flags(8L)._1 != 2L,
        s"unrelated docs must not cross buckets: $flags")
    } finally q.stop()
  }
}
