package graft.streaming

import graft.SparkSpec
import graft.etl.WarehouseWriter
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming → warehouse upsert via foreachBatch: the reference's
  * INSERT IGNORE dedup-insert (E6/J4) applied per micro-batch — the
  * standard exactly-once-into-a-table pattern for sinks without
  * transactional streaming support. At-least-once replays (the same
  * episode arriving in two batches, or twice within one batch) must
  * leave exactly one row per key.
  */
class StreamUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("foreachBatch insertIgnore is idempotent under batch replays") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val stream = in.toDF.toDF("arrived", "link", "title")

    // the accumulating warehouse table, merged into per micro-batch
    var warehouse = Seq.empty[(Timestamp, String, String)]
      .toDF("arrived", "link", "title")

    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        warehouse = WarehouseWriter.insertIgnore(
          warehouse, batch,
          keys = Seq("link"), tieBreak = Seq("arrived", "title"))
          // materialize: the next merge must not re-evaluate this
          // batch's plan against a later MemoryStream state
          .localCheckpoint()
        ()
      }
      .start()
    try {
      // batch 1: two distinct episodes + an in-batch duplicate of ep1
      in.addData(
        (ts(0), "ep1", "first"), (ts(1), "ep1", "first-dup"),
        (ts(2), "ep2", "second"))
      q.processAllAvailable()
      assert(warehouse.count() == 2)
      // at-least-once redelivery: ep1/ep2 replayed in a later batch,
      // plus one genuinely new episode
      in.addData(
        (ts(9), "ep1", "first-replay"), (ts(9), "ep2", "second-replay"),
        (ts(9), "ep3", "third"))
      q.processAllAvailable()
      val rows = warehouse.orderBy("link").collect()
      assert(rows.length == 3)
      // original rows survived; replays were ignored (INSERT IGNORE,
      // not upsert-overwrite); the in-batch dup kept the first arrival
      assert(rows.map(r => (r.getString(1), r.getString(2))).toSeq ==
        Seq(("ep1", "first"), ("ep2", "second"), ("ep3", "third")))
    } finally q.stop()
  }
}
