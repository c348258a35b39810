package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{DeltaCdf, DeltaExport, DeltaLog}
import org.apache.spark.sql.functions._

/** The Delta STREAMING SOURCE (`spark.readStream.format("graft-delta")`)
  * — the consumer side of the exactly-once story whose sink half
  * ([[DeltaExport.appendBatch]]) landed earlier:
  *
  *  - initial snapshot + per-commit tail equals the batch read;
  *  - restart from the streaming checkpoint resumes at the exact
  *    version — no duplicates, no gaps;
  *  - a data-changing commit fails the stream (append-only contract)
  *    unless `skipChangeCommits` drops it;
  *  - CDF mode (`readChangeFeed=true`) equals
  *    [[DeltaCdf.readChangeFeed]] over the same version window, and
  *    the batch DSv2 CDF read does too.
  */
class DeltaStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")

  test("snapshot + tail equals the batch read; checkpoint restart resumes") {
    val t = tmp("dsv2_stream")
    val ckpt = tmp("dsv2_stream_ckpt")
    DeltaExport.create(df(0 until 10).coalesce(1), t)
    DeltaExport.append(df(10 until 20).coalesce(1), t)

    // foreachBatch sink: checkpoint-recoverable (the memory sink is
    // not), collecting into a driver buffer the assertions read
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def sink(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      batch.collect().foreach(r => seen.add(r.getLong(0)))
    import scala.jdk.CollectionConverters._

    val q1 = spark.readStream.format("graft-delta").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    try {
      q1.processAllAvailable()
      // snapshot covers BOTH commits (stream started at version 1)
      assert(seen.asScala.toSet == (0L until 20L).toSet)
      // tail: a new append arrives as its own micro-batch
      DeltaExport.append(df(20 until 25).coalesce(1), t)
      q1.processAllAvailable()
      assert(seen.asScala.toSet == (0L until 25L).toSet)
      assert(seen.size == 25, s"no duplicates expected, got ${seen.size}")
    } finally q1.stop()

    // append while the stream is DOWN, then restart from checkpoint:
    // only the missed commit replays (no snapshot re-emit, no dupes)
    DeltaExport.append(df(25 until 30).coalesce(1), t)
    seen.clear()
    val q2 = spark.readStream.format("graft-delta").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    try {
      q2.processAllAvailable()
      val got = seen.asScala.toSeq
      assert(got.toSet == (25L until 30L).toSet,
        s"restart must resume past the checkpoint, got $got")
      assert(got.size == 5, s"no duplicates expected, got $got")
    } finally q2.stop()
  }

  test("maxFilesPerTrigger splits the snapshot and tail into bounded batches") {
    val t = tmp("dsv2_stream_rate")
    val ckpt = tmp("dsv2_stream_rate_ckpt")
    // 4 snapshot files (2 commits x 2 files) + a 2-file tail append
    DeltaExport.create(df(0 until 10).repartition(2), t)
    DeltaExport.append(df(10 until 20).repartition(2), t)

    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def sink(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val rows = batch.collect()
      batchSizes.add(rows.length)
      rows.foreach(r => seen.add(r.getLong(0)))
    }
    import scala.jdk.CollectionConverters._

    val q = spark.readStream.format("graft-delta")
      .option("maxFilesPerTrigger", "1").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
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
      DeltaExport.append(df(20 until 30).repartition(2), t)
      q.processAllAvailable()
      assert(seen.asScala.toSet == (0L until 30L).toSet)
      assert(seen.size == 30, s"no duplicates, got ${seen.size}")
    } finally q.stop()
  }

  test("a data-changing commit fails the stream; skipChangeCommits drops it") {
    val t = tmp("dsv2_stream_chg")
    val ckpt = tmp("dsv2_stream_chg_ckpt")
    DeltaExport.create(df(0 until 10).coalesce(1), t)
    val q = spark.readStream.format("graft-delta").load(t)
      .writeStream.format("memory").queryName("ds_chg")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      DeltaExport.deleteWhere(spark, t, col("id") < 3L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("not an append") ||
        Option(e.getCause).exists(_.getMessage.contains("not an append")),
        e.getMessage)
    } finally q.stop()

    // skipChangeCommits: the delete commit is dropped wholesale and a
    // later append still flows
    val ckpt2 = tmp("dsv2_stream_chg_ckpt2")
    DeltaExport.append(df(10 until 12).coalesce(1), t)
    val q2 = spark.readStream.format("graft-delta")
      .option("skipChangeCommits", "true")
      .option("startingVersion", "1").load(t)
      .writeStream.format("memory").queryName("ds_chg2")
      .option("checkpointLocation", ckpt2).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("ds_chg2").collect().map(_.getLong(0)).toSet ==
        (10L until 12L).toSet)
    } finally q2.stop()
  }

  test("partitioned table: partition values ride the stream slices") {
    val t = tmp("dsv2_stream_part")
    val ckpt = tmp("dsv2_stream_part_ckpt")
    def pdf(ids: Range) =
      ids.map(i => (i.toLong, i % 3, s"v$i")).toDF("id", "grp", "s")
    DeltaExport.create(pdf(0 until 9), t, partitionBy = Seq("grp"))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()
    def sink(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      batch.collect().foreach(r =>
        seen.add((r.getAs[Long]("id"), r.getAs[Int]("grp"))))
    import scala.jdk.CollectionConverters._
    val q = spark.readStream.format("graft-delta").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      DeltaExport.append(pdf(9 until 15), t, partitionBy = Seq("grp"))
      q.processAllAvailable()
      assert(seen.asScala.toSet ==
        (0L until 15L).map(i => (i, (i % 3).toInt)).toSet,
        seen.asScala.toSeq.sorted.toString)
    } finally q.stop()
  }

  private def cdfKey(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("id"), r.getAs[String]("s"),
      r.getAs[String]("_change_type"), r.getAs[Long]("_commit_version"))

  test("batch DSv2 CDF equals DeltaCdf.readChangeFeed") {
    val t = tmp("dsv2_cdf_batch")
    DeltaExport.create(df(0 until 10).coalesce(1), t, Nil,
      Map("delta.enableChangeDataFeed" -> "true"))
    DeltaExport.append(df(10 until 15).coalesce(1), t)
    DeltaExport.deleteWhere(spark, t, col("id") % 4 === 1)
    val oracle = DeltaCdf.readChangeFeed(spark, t, 0L)
      .collect().map(cdfKey).toSeq.sorted
    val dsv2 = spark.read.format("graft-delta")
      .option("readChangeFeed", "true").load(t)
      .collect().map(cdfKey).toSeq.sorted
    assert(dsv2 == oracle)
    // version window options
    val windowed = spark.read.format("graft-delta")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "2")
      .load(t).collect().map(cdfKey).toSeq.sorted
    assert(windowed == DeltaCdf.readChangeFeed(spark, t, 1L, Some(2L))
      .collect().map(cdfKey).toSeq.sorted)
  }

  test("CDF on a table that never enabled it is refused") {
    val t = tmp("dsv2_cdf_off")
    DeltaExport.create(df(0 until 10).coalesce(1), t)
    DeltaExport.deleteWhere(spark, t, col("id") === 2L)
    val e = intercept[Exception] {
      spark.read.format("graft-delta")
        .option("readChangeFeed", "true").load(t).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil
      else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("enableChangeDataFeed")), e.getMessage)
  }

  test("streaming CDF equals readChangeFeed over the same window") {
    val t = tmp("dsv2_cdf_stream")
    val ckpt = tmp("dsv2_cdf_stream_ckpt")
    DeltaExport.create(df(0 until 10).coalesce(1), t, Nil,
      Map("delta.enableChangeDataFeed" -> "true"))
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true").load(t)
      .writeStream.format("memory").queryName("ds_cdf")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // initial snapshot arrives as inserts at the start version
      assert(spark.table("ds_cdf").count() == 10L)
      DeltaExport.append(df(10 until 13).coalesce(1), t)
      DeltaExport.deleteWhere(spark, t, col("id") === 2L)
      q.processAllAvailable()
      val got = spark.table("ds_cdf").collect().map(cdfKey).toSeq.sorted
      val oracle = DeltaCdf.readChangeFeed(spark, t, 0L)
        .collect().map(cdfKey).toSeq.sorted
      assert(got == oracle,
        s"stream: ${got.mkString(",")}\noracle: ${oracle.mkString(",")}")
    } finally q.stop()
  }
}
