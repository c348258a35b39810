package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 at the Delta layer: [[DeltaScd2.merge]] folds observation
  * batches into a versioned dimension table with w21's semantics —
  * changed state closes the open version and opens a new one,
  * unchanged state is a no-op, the batch is ONE Delta commit, and
  * time travel returns the pre-batch dimension.
  */
class DeltaScd2Spec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("delta_scd2_").resolve("dim").toString

  private def obs(rows: Seq[(Long, String, Long, Long)]) =
    rows.toDF("user_id", "event_type", "tus", "event_id")

  private def readDim(t: String, v: Option[Long] = None) =
    DeltaLog.read(spark, t, v)
      .select("user_id", "version", "event_type",
        "valid_from_us", "valid_to_us", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toSeq.sortBy(x => (x._1, x._2))

  test("first merge creates the table; runs compress like w21") {
    val t = tbl()
    // user 1: play → play → pause (two runs); user 2: one run
    DeltaScd2.merge(spark, t, obs(Seq(
      (1L, "play", 100L, 1L), (1L, "play", 200L, 2L), (1L, "pause", 300L, 3L),
      (2L, "play", 150L, 4L))))
    assert(readDim(t) == Seq(
      (1L, 1L, "play", 100L, 300L, false),
      (1L, 2L, "pause", 300L, -1L, true),
      (2L, 1L, "play", 150L, -1L, true)))
  }

  test("re-run with a changed state flips is_current; time travel keeps the prior state") {
    val t = tbl()
    DeltaScd2.merge(spark, t, obs(Seq(
      (1L, "play", 100L, 1L), (2L, "play", 150L, 2L))))
    val v0 = DeltaLog.version(spark, t)
    // user 1 changes to pause; user 2 re-observes play (no change)
    val v1 = DeltaScd2.merge(spark, t, obs(Seq(
      (1L, "pause", 500L, 3L), (2L, "play", 600L, 4L))))
    assert(v1 == v0 + 1, "the batch must land as ONE Delta commit")
    assert(readDim(t) == Seq(
      (1L, 1L, "play", 100L, 500L, false), // closed + flipped
      (1L, 2L, "pause", 500L, -1L, true), // the new current
      (2L, 1L, "play", 150L, -1L, true)), // unchanged: no churn
      s"merged dim drifted: ${readDim(t)}")
    // time travel: the dimension EXACTLY as before the batch
    assert(readDim(t, Some(v0)) == Seq(
      (1L, 1L, "play", 100L, -1L, true),
      (2L, 1L, "play", 150L, -1L, true)))
  }

  test("a no-change batch commits nothing (idempotent re-run)") {
    val t = tbl()
    DeltaScd2.merge(spark, t, obs(Seq((1L, "play", 100L, 1L))))
    val v0 = DeltaLog.version(spark, t)
    val r = DeltaScd2.merge(spark, t, obs(Seq((1L, "play", 900L, 2L))))
    assert(r == -1L, "unchanged state must be a no-op")
    assert(DeltaLog.version(spark, t) == v0, "no commit may land")
  }

  test("a multi-run batch opens every version with a chained valid_to") {
    val t = tbl()
    DeltaScd2.merge(spark, t, obs(Seq((7L, "a", 10L, 1L))))
    DeltaScd2.merge(spark, t, obs(Seq(
      (7L, "b", 20L, 2L), (7L, "c", 30L, 3L), (7L, "c", 40L, 4L))))
    assert(readDim(t) == Seq(
      (7L, 1L, "a", 10L, 20L, false),
      (7L, 2L, "b", 20L, 30L, false),
      (7L, 3L, "c", 30L, -1L, true)))
  }

  test("back-dated observations are refused loudly") {
    val t = tbl()
    DeltaScd2.merge(spark, t, obs(Seq((1L, "play", 1000L, 1L))))
    val e = intercept[IllegalArgumentException] {
      DeltaScd2.merge(spark, t, obs(Seq((1L, "pause", 900L, 2L))))
    }
    assert(e.getMessage.contains("predate"), e.getMessage)
  }

  test("mergeBatch is exactly-once: a replayed batch no-ops, never trips the refusal") {
    val t = tbl()
    val b0 = obs(Seq((1L, "a", 10L, 1L), (1L, "b", 20L, 2L)))
    assert(DeltaScd2.mergeBatch(spark, t, b0, "app", 0L).isDefined)
    // replaying the SAME multi-run batch without the txn handshake
    // would look back-dated against the state it itself committed;
    // with it, a clean no-op
    assert(DeltaScd2.mergeBatch(spark, t, b0, "app", 0L).isEmpty)
    val b1 = obs(Seq((1L, "c", 30L, 3L)))
    assert(DeltaScd2.mergeBatch(spark, t, b1, "app", 1L).isDefined)
    assert(DeltaScd2.mergeBatch(spark, t, b1, "app", 1L).isEmpty)
    assert(readDim(t) == Seq(
      (1L, 1L, "a", 10L, 20L, false),
      (1L, 2L, "b", 20L, 30L, false),
      (1L, 3L, "c", 30L, -1L, true)))
  }

  test("streaming observations maintain the Delta dimension via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = tbl()
    val in = MemoryStream[(Long, String, Long, Long)]
    val q = in.toDF.toDF("user_id", "event_type", "tus", "event_id")
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) => {
        DeltaScd2.mergeBatch(spark, t, b, "dimsink", id); ()
      })
      .start()
    try {
      in.addData((1L, "play", 100L, 1L), (2L, "play", 150L, 2L))
      q.processAllAvailable()
      in.addData((1L, "pause", 500L, 3L), (2L, "play", 600L, 4L))
      q.processAllAvailable()
      assert(readDim(t) == Seq(
        (1L, 1L, "play", 100L, 500L, false),
        (1L, 2L, "pause", 500L, -1L, true),
        (2L, 1L, "play", 150L, -1L, true)),
        s"streamed dim drifted: ${readDim(t)}")
      // the txn watermark is in the log: a restart replaying batch 1
      // would no-op (asserted via the public reader)
      assert(DeltaLog.lastTxnVersion(spark, t, "dimsink").contains(1L))
    } finally q.stop()
  }

  test("merge result equals w21's from-scratch history on the same observations") {
    // the incremental fold and the batch gaps-and-islands must agree:
    // replay the SAME observation stream both ways
    val t = tbl()
    val all = Seq(
      (1L, "play", 100L, 1L), (1L, "pause", 200L, 2L),
      (1L, "pause", 300L, 3L), (1L, "play", 400L, 4L),
      (2L, "play", 150L, 5L), (2L, "play", 700L, 6L),
      (3L, "seek", 50L, 7L))
    // incremental: two chronological batches
    val (b1, b2) = all.sortBy(_._3).splitAt(4)
    DeltaScd2.merge(spark, t, obs(b1.sortBy(_._4)))
    DeltaScd2.merge(spark, t, obs(b2.sortBy(_._4)))
    val got = readDim(t)
    // from-scratch w21 rule applied by hand to the full stream
    val want = Seq(
      (1L, 1L, "play", 100L, 200L, false),
      (1L, 2L, "pause", 200L, 400L, false),
      (1L, 3L, "play", 400L, -1L, true),
      (2L, 1L, "play", 150L, -1L, true),
      (3L, 1L, "seek", 50L, -1L, true))
    assert(got == want, s"incremental vs from-scratch drifted: $got")
  }
}
