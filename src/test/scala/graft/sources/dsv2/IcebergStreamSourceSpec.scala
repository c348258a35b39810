package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.IcebergExport
import org.apache.spark.sql.functions._

/** The Iceberg STREAMING SOURCE
  * (`spark.readStream.format("graft-iceberg")`) — the Delta source's
  * format twin: initial snapshot + per-snapshot appended files,
  * sequence-number offsets (exact checkpoint resume), append-only
  * contract with `skipChangeCommits`. The initial snapshot carries
  * the table's MoR delete state (position/equality deletes applied),
  * exactly like the batch read.
  */
class IcebergStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")

  test("snapshot + appended tail; checkpoint restart resumes exactly") {
    val t = tmp("ice_stream")
    val ckpt = tmp("ice_stream_ckpt")
    IcebergExport.create(df(0 until 10).coalesce(1), t)
    IcebergExport.append(df(10 until 20).coalesce(1), t)

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def sink(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      batch.collect().foreach(r => seen.add(r.getLong(0)))
    import scala.jdk.CollectionConverters._

    val q1 = spark.readStream.format("graft-iceberg").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    try {
      q1.processAllAvailable()
      assert(seen.asScala.toSet == (0L until 20L).toSet)
      IcebergExport.append(df(20 until 25).coalesce(1), t)
      q1.processAllAvailable()
      assert(seen.asScala.toSet == (0L until 25L).toSet)
      assert(seen.size == 25, s"no duplicates expected, got ${seen.size}")
    } finally q1.stop()

    IcebergExport.append(df(25 until 30).coalesce(1), t)
    seen.clear()
    val q2 = spark.readStream.format("graft-iceberg").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    try {
      q2.processAllAvailable()
      val got = seen.asScala.toSeq
      assert(got.toSet == (25L until 30L).toSet && got.size == 5,
        s"restart must resume at the checkpointed sequence, got $got")
    } finally q2.stop()
  }

  test("initial snapshot applies MoR deletes; non-append snapshots fail") {
    val t = tmp("ice_stream_mor")
    val ckpt = tmp("ice_stream_mor_ckpt")
    IcebergExport.create(df(0 until 10).coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") % 3 === 0)

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def sink(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      batch.collect().foreach(r => seen.add(r.getLong(0)))
    import scala.jdk.CollectionConverters._

    val q = spark.readStream.format("graft-iceberg").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(seen.asScala.toSet ==
        (0L until 10L).filterNot(_ % 3 == 0).toSet,
        s"initial snapshot must apply the position deletes: " +
          s"${seen.asScala.toSeq.sorted}")
      // a delete AFTER the stream started is a change commit: fail
      IcebergExport.deleteWhere(spark, t, col("id") === 1L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("not an append") ||
        Option(e.getCause).exists(_.getMessage.contains("not an append")),
        e.getMessage)
    } finally q.stop()

    // skipChangeCommits drops the delete snapshot; later appends flow
    val ckpt2 = tmp("ice_stream_mor_ckpt2")
    IcebergExport.append(df(10 until 12).coalesce(1), t)
    seen.clear()
    val q2 = spark.readStream.format("graft-iceberg")
      .option("skipChangeCommits", "true").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt2).start()
    try {
      q2.processAllAvailable()
      // fresh stream: snapshot reflects BOTH deletes, plus the append
      assert(seen.asScala.toSet ==
        ((0L until 10L).filterNot(i => i % 3 == 0 || i == 1L)
          ++ (10L until 12L)).toSet,
        seen.asScala.toSeq.sorted.toString)
    } finally q2.stop()
  }

  test("maxFilesPerTrigger splits snapshot and tail into bounded batches; restart mid-snapshot resumes") {
    val t = tmp("ice_stream_rate")
    val ckpt = tmp("ice_stream_rate_ckpt")
    // 4 snapshot files (2 snapshots x 2 files) + a 2-file tail append
    IcebergExport.create(df(0 until 10).repartition(2), t)
    IcebergExport.append(df(10 until 20).repartition(2), t)

    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def sink(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val rows = batch.collect()
      batchSizes.add(rows.length)
      rows.foreach(r => seen.add(r.getLong(0)))
    }
    import scala.jdk.CollectionConverters._

    def stream() = spark.readStream.format("graft-iceberg")
      .option("maxFilesPerTrigger", "1").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()

    val q = stream()
    try {
      q.processAllAvailable()
      assert(seen.asScala.toSet == (0L until 20L).toSet)
      assert(seen.size == 20, s"no duplicates, got ${seen.size}")
      // 4 snapshot files at 1 file/trigger -> at least 4 batches, and
      // no batch larger than one file's rows (10 ids / 2 files = 5)
      val sizes = batchSizes.asScala.toSeq.filter(_ > 0)
      assert(sizes.size >= 4, s"expected >=4 bounded batches, got $sizes")
      assert(sizes.forall(_ <= 5), s"one file per batch, got $sizes")
      // tail under the same limit
      IcebergExport.append(df(20 until 30).repartition(2), t)
      q.processAllAvailable()
      assert(seen.asScala.toSet == (0L until 30L).toSet)
      assert(seen.size == 30, s"no duplicates, got ${seen.size}")
    } finally q.stop()

    // restart on the FILE-GRANULAR checkpoint: nothing re-served
    IcebergExport.append(df(30 until 32).coalesce(1), t)
    seen.clear()
    val q2 = stream()
    try {
      q2.processAllAvailable()
      val got = seen.asScala.toSeq.sorted
      assert(got == Seq(30L, 31L),
        s"restart must resume at the file-granular offset, got $got")
    } finally q2.stop()
  }

  test("pre-r17 index-less checkpoint offsets deserialize to what they meant") {
    // tail form: entries [0, 5) fully consumed
    val tail = IcebergStreamOffset.fromJson(
      """{"logIdx":5,"snapshotDone":true,"snapshotId":-1}""")
    assert(tail == IcebergStreamOffset(5L, snapshotDone = true, -1L, -1L))
    // snapshot-pending form: nothing of the snapshot served yet
    val snap = IcebergStreamOffset.fromJson(
      """{"logIdx":3,"snapshotDone":false,"snapshotId":42}""")
    assert(snap == IcebergStreamOffset(3L, snapshotDone = false, 42L, 0L))
    // new offsets round-trip with the index intact
    val partial = IcebergStreamOffset(4L, snapshotDone = true, -1L, 2L)
    assert(IcebergStreamOffset.fromJson(partial.json()) == partial)
  }

  test("CDF mode rides the same admission control") {
    val t = tmp("ice_stream_rate_cdf")
    val ckpt = tmp("ice_stream_rate_cdf_ckpt")
    IcebergExport.create(df(0 until 10).repartition(2), t)
    IcebergExport.append(df(10 until 15).coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") < 2L)
    val startId = graft.sources.IcebergTable.snapshotIds(t).head

    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def sink(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val rows = batch.select("id", "_change_type").collect()
      batchSizes.add(rows.length)
      rows.foreach(r => seen.add((r.getLong(0), r.getString(1))))
    }
    import scala.jdk.CollectionConverters._

    val q = spark.readStream.format("graft-iceberg")
      .option("readChangeFeed", "true")
      .option("start-snapshot-id", startId.toString)
      .option("maxFilesPerTrigger", "1").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val want = graft.sources.IcebergChangelog
        .changelog(spark, t, Some(startId), None)
        .select("id", "_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(seen.asScala.toSeq.sorted == want,
        s"rate-limited CDF stream must equal the batch window")
      // bounded: 2 insert files + 1 append file + 1 delete slice ->
      // >= 4 batches, none above one file's rows (5)
      val sizes = batchSizes.asScala.toSeq.filter(_ > 0)
      assert(sizes.size >= 4, s"expected >=4 bounded batches, got $sizes")
      assert(sizes.forall(_ <= 5), s"one slice per batch, got $sizes")
    } finally q.stop()
  }
}
