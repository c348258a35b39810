package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{DeleteAccess, IcebergChangelog, IcebergExport, IcebergTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iceberg CHANGE-DATA-FEED through DataSourceV2 (r17) — batch
  * (`readChangeFeed=true` + `start-snapshot-id`/`end-snapshot-id`)
  * and streaming, both planned by [[IcebergCdfPlanner]] into the
  * shared executor-side reader. The gate everywhere: DSv2 output ≡
  * [[graft.sources.IcebergChangelog.changelog]] over the same window
  * (row-identical, ordinals and snapshot ids included), restarts
  * duplicate-free, and planning reads no delete CONTENT.
  */
class IcebergCdfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("iceberg_cdf_").resolve("t").toString

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  private def dsv2Cdf(t: String, opts: (String, String)*): DataFrame =
    opts.foldLeft(
      spark.read.format("graft-iceberg")
        .option("readChangeFeed", "true")) { case (r, (k, v)) =>
      r.option(k, v)
    }.load(t)

  test("batch CDF through DSv2 matches the changelog reader, subranges included") {
    val t = tbl()
    IcebergExport.create(
      (0L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.append(
      Seq((10L, "x"), (11L, "y")).toDF("id", "s").coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") === 2L) // position
    IcebergExport.deleteWhereEquality(spark, t, Seq(10L).toDF("id"))
    IcebergExport.rewriteDataFiles(spark, t, 64L * 1024 * 1024) // replace
    // overlapping re-delete: already-dead positions must not re-feed
    IcebergExport.deleteWhere(spark, t, col("id") < 3L)

    val got = rows(dsv2Cdf(t))
    val want = rows(IcebergChangelog.changelog(spark, t))
    assert(got == want, s"DSv2 CDF drifted from the changelog:\n" +
      s"${got.mkString("\n")}\nvs\n${want.mkString("\n")}")
    assert(got.nonEmpty && got.exists(_.contains("delete")))

    val ids = IcebergTable.snapshotIds(t)
    val sub = rows(dsv2Cdf(t,
      "start-snapshot-id" -> ids(2).toString,
      "end-snapshot-id" -> ids(3).toString))
    val subWant = rows(
      IcebergChangelog.changelog(spark, t, Some(ids(2)), Some(ids(3))))
    assert(sub == subWant, s"subrange drifted:\n$sub\nvs\n$subWant")

    // column pruning keeps the triple usable
    val pruned = dsv2Cdf(t).select("_change_type", "id")
    assert(rows(pruned) ==
      rows(IcebergChangelog.changelog(spark, t)
        .select("_change_type", "id")))
  }

  test("v3 DV generations and whole-file overwrites feed per-file diffs; planning reads no delete content") {
    val t = tbl()
    IcebergExport.createV3(
      (0L until 12L).map(i => (i, s"r$i")).toDF("id", "s")
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"), t)
    IcebergExport.deleteWhereDv(spark, t, col("id") % 3 === 0)
    IcebergExport.deleteWhereDv(spark, t, col("id") < 5L) // merges DVs

    val scan = {
      val schema = org.apache.spark.sql.types.StructType(
        IcebergDsv2.plan(spark, t, Map.empty).schema.fields ++
          IcebergDsv2.cdfExtra)
      IcebergDsv2Scan(t, schema, schema, Nil,
        Map("readchangefeed" -> "true"))
    }
    val before = DeleteAccess.contentReads.get()
    val parts = scan.toBatch.planInputPartitions()
    assert(DeleteAccess.contentReads.get() == before,
      "CDF planning must ship DV descriptors, not decoded positions")
    assert(parts.nonEmpty)

    val got = rows(dsv2Cdf(t))
    val want = rows(IcebergChangelog.changelog(spark, t))
    assert(got == want, s"v3 DV changelog drifted:\n" +
      s"${got.mkString("\n")}\nvs\n${want.mkString("\n")}")
    // the second generation feeds exactly the newly-dead rows
    assert(dsv2Cdf(t).filter(col("_change_ordinal") === 2)
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
  }

  test("streaming changelog matches the batch window; restart is duplicate-free") {
    val t = tbl()
    val ckpt = Files.createTempDirectory("iceberg_cdf_ckpt").toString
    IcebergExport.create(
      (0L until 8L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.append(
      Seq((20L, "a"), (21L, "b")).toDF("id", "s").coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") % 4 === 1)
    val startId = IcebergTable.snapshotIds(t)(1)

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def sink(batch: DataFrame, id: Long): Unit =
      batch.collect().foreach(r => seen.add(r.mkString("|")))
    import scala.jdk.CollectionConverters._
    def stream() = spark.readStream.format("graft-iceberg")
      .option("readChangeFeed", "true")
      .option("start-snapshot-id", startId.toString)
      .load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()

    def batchWindow(): Seq[String] = rows(
      IcebergChangelog.changelog(spark, t, Some(startId), None))

    val q1 = stream()
    try {
      q1.processAllAvailable()
      assert(seen.asScala.toSeq.sorted == batchWindow(),
        "streaming changelog drifted from the batch window")
      // mid-stream commits: equality delete + append flow as changes
      IcebergExport.deleteWhereEquality(spark, t, Seq(20L, 2L).toDF("id"))
      IcebergExport.append(
        Seq((30L, "z")).toDF("id", "s").coalesce(1), t)
      q1.processAllAvailable()
      assert(seen.asScala.toSeq.sorted == batchWindow(),
        "mid-stream commits drifted from the batch window")
    } finally q1.stop()

    // restart from the checkpoint: ONLY the post-stop commit arrives
    IcebergExport.deleteWhere(spark, t, col("id") === 3L)
    seen.clear()
    val q2 = stream()
    try {
      q2.processAllAvailable()
      val got = seen.asScala.toSeq.sorted
      val wantTail = rows(IcebergChangelog.changelog(spark, t)
        .filter(col("_change_ordinal") ===
          (IcebergTable.snapshotIds(t).size - 1)))
      assert(got == wantTail,
        s"restart must serve exactly the new snapshot:\n$got\nvs\n$wantTail")
    } finally q2.stop()
  }

  test("CDF stream without start option: MoR snapshot as inserts, then deletes flow instead of failing") {
    val t = tbl()
    val ckpt = Files.createTempDirectory("iceberg_cdf_snap_ckpt").toString
    IcebergExport.create(
      (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") % 3 === 0)

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int)]()
    def sink(batch: DataFrame, id: Long): Unit =
      batch.select("id", "_change_type", "_change_ordinal").collect()
        .foreach(r => seen.add((r.getLong(0), r.getString(1), r.getInt(2))))
    import scala.jdk.CollectionConverters._

    val q = spark.readStream.format("graft-iceberg")
      .option("readChangeFeed", "true").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // the pinned snapshot: live (MoR-resolved) rows as inserts at
      // the snapshot's own ordinal
      assert(seen.asScala.toSet ==
        (0L until 10L).filterNot(_ % 3 == 0).map(i => (i, "insert", 1)).toSet,
        seen.asScala.toSeq.sortBy(_._1).toString)
      // a delete commit is CONSUMED as change rows, not a stream error
      IcebergExport.deleteWhere(spark, t, col("id") === 1L)
      q.processAllAvailable()
      assert(seen.asScala.toSet.contains((1L, "delete", 2)),
        seen.asScala.toSeq.sortBy(_._1).toString)
      assert(seen.size == 7)
    } finally q.stop()
  }
}
