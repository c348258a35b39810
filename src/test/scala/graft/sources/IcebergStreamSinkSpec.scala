package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Exactly-once STREAMING SINK into Iceberg — the Delta appendBatch
  * twin in the other format: foreachBatch-driven appends carry a
  * per-app batch watermark in the table's `properties`
  * (`graft.txn.<appId>`), committed atomically with the data, so a
  * replayed batch is a no-op, the watermark survives every other
  * commit kind AND expireSnapshots, and snapshot count tracks batch
  * count.
  */
class IcebergStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("iceberg_sink_").resolve("t").toString

  test("foreachBatch sink end-to-end: restart redelivery does not duplicate rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t = tbl()
    IcebergExport.create(
      spark.emptyDataset[(Long, String)].toDF("id", "payload"), t)
    val ckpt = Files.createTempDirectory("iceberg_sink_ck").toString
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("id", "payload").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        IcebergExport.appendBatch(b, t, "ib-sink", id): Unit
      }
      .start()
    try {
      in.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      in.addData((3L, "c")); q.processAllAvailable()
    } finally q.stop()
    val snapsAfterStream = IcebergTable.snapshotIds(t).size
    assert(snapsAfterStream == 3, // create + 2 batches
      s"snapshot count must track batch count: $snapsAfterStream")
    // redeliver BOTH committed batch ids (the retry a crash between
    // the Iceberg commit and the streaming checkpoint produces)
    assert(IcebergExport.appendBatch(
      Seq((1L, "a"), (2L, "b")).toDF("id", "payload"), t, "ib-sink", 0L).isEmpty)
    assert(IcebergExport.appendBatch(
      Seq((3L, "c")).toDF("id", "payload"), t, "ib-sink", 1L).isEmpty)
    // replays committed NO new snapshot and duplicated NO row
    assert(IcebergTable.snapshotIds(t).size == snapsAfterStream)
    assert(IcebergTable.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L, 3L))
    // replayed batches' staged files were cleaned from data/
    val dataFiles = {
      val s = Files.walk(Paths.get(t, "data"))
      try {
        val it = s.iterator()
        var n = 0
        while (it.hasNext) {
          if (it.next().toString.endsWith(".parquet")) n += 1
        }
        n
      } finally s.close()
    }
    val meta = IcebergTable.metadataJson(t)
    val referenced = IcebergTable.dataFilesOf(
      t, meta, IcebergTable.currentSnapshotNode(meta)).size
    assert(dataFiles == referenced,
      s"replay must not leak staged files: $dataFiles on disk, $referenced referenced")
  }

  test("the watermark survives other commit kinds and expireSnapshots") {
    val t = tbl()
    IcebergExport.create(Seq((1L, "a")).toDF("id", "s"), t)
    assert(IcebergExport.appendBatch(
      Seq((2L, "b")).toDF("id", "s"), t, "app1", 5L).isDefined)
    assert(IcebergExport.lastBatchId(t, "app1").contains(5L))
    // other commit kinds preserve it — incl. compaction AFTER the
    // rename (schema-evolved tables compact via per-era manifests)
    IcebergExport.deleteWhereEquality(spark, t, Seq(1L).toDF("id"))
    IcebergExport.renameColumn(t, "s", "payload")
    IcebergExport.rewriteDataFiles(spark, t, 64L * 1024 * 1024)
    assert(IcebergExport.lastBatchId(t, "app1").contains(5L),
      "delete/evolve/compact must carry the txn watermark forward")
    // expire the early snapshots: the PROPERTY-stored watermark stays
    IcebergExport.expireSnapshots(t, keepLast = 1)
    assert(IcebergExport.lastBatchId(t, "app1").contains(5L),
      "a summary-only watermark would die here and double-commit later")
    assert(IcebergExport.appendBatch(
      Seq((9L, "x")).toDF("id", "payload"), t, "app1", 5L).isEmpty)
    assert(IcebergExport.appendBatch(
      Seq((9L, "x")).toDF("id", "payload"), t, "app1", 6L).isDefined)
    // per-app isolation: a different appId starts fresh
    assert(IcebergExport.lastBatchId(t, "app2").isEmpty)
    assert(IcebergExport.appendBatch(
      Seq((10L, "y")).toDF("id", "payload"), t, "app2", 0L).isDefined)
  }
}
