package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.{CdfReplica, DeltaExport, DeltaLog, DeltaMerge}
import org.apache.spark.sql.functions._

/** End-to-end streaming lakehouse pipeline (r14): a Structured
  * Streaming source lands in a CDF-enabled Delta table through the
  * exactly-once foreachBatch sink, and a DOWNSTREAM replica tails
  * that table through its change feed — the full
  * stream → bronze → mirror composition, each hop exactly-once
  * through its own txn watermark.
  */
class StreamCdfPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String = {
    val t = Files.createTempDirectory("cdf_pipe_").toString
    Files.delete(Paths.get(t))
    t
  }

  test("stream → CDF bronze → replica: every hop exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val bronze = tbl(); val mirror = tbl()
    DeltaExport.create(
      spark.emptyDataset[(Long, String)].toDF("id", "payload"),
      bronze, Nil, Map("delta.enableChangeDataFeed" -> "true"))
    CdfReplica.init(spark, bronze, mirror)
    val ckpt = Files.createTempDirectory("cdf_pipe_ck").toString
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("id", "payload").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        DeltaExport.appendBatch(b, bronze, "ingest", id)
        // the replica tails the bronze table after every batch — in
        // production this is its own consumer loop; the composition
        // is identical
        CdfReplica.sync(spark, bronze, mirror, Seq("id"), "mirror"): Unit
      }
      .start()
    try {
      in.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      in.addData((3L, "c")); q.processAllAvailable()
    } finally q.stop()
    def rows(t: String): Set[(Long, String)] =
      DeltaLog.read(spark, t).select(col("id"), col("payload"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(bronze) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(mirror) == rows(bronze))
    // a batch-level MERGE on the bronze table (late-data correction)
    // flows through the same tail
    DeltaMerge.merge(spark, bronze,
      Seq((2L, "B2")).toDF("id", "payload"),
      Seq("id"), Some(DeltaMerge.UpdateAll), insertNotMatched = false)
    CdfReplica.sync(spark, bronze, mirror, Seq("id"), "mirror")
    assert(rows(mirror) == Set((1L, "a"), (2L, "B2"), (3L, "c")))
    // crash-replay at BOTH hops: the redelivered ingest batch and the
    // re-run sync are both rejected by their txn gates
    assert(DeltaExport.appendBatch(
      Seq((3L, "c")).toDF("id", "payload"), bronze, "ingest", 1L).isEmpty)
    assert(CdfReplica
      .sync(spark, bronze, mirror, Seq("id"), "mirror").isEmpty)
    assert(rows(mirror).size == 3, "no duplicated rows after replays")
  }
}
