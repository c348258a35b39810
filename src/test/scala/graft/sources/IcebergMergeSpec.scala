package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iceberg blind-upsert MERGE (r14): one snapshot = equality-delete
  * keys + new data files at the SAME sequence number, so the spec's
  * strictly-smaller scope makes the new rows survive their own keys
  * — upsert without reading or rewriting a single existing file.
  */
class IcebergMergeSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("iceberg_mrg_").resolve("t").toString

  private def snap(t: String): Set[(Long, String)] =
    IcebergTable.read(spark, t).select(col("id"), col("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("upsert updates matched keys and inserts new ones without a rewrite") {
    val t = tbl()
    val s1 = IcebergExport.create(
      (0L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    val filesBefore = {
      val meta = IcebergTable.metadataJson(t)
      IcebergTable.dataFilesOf(
        t, meta, IcebergTable.currentSnapshotNode(meta)).toSet
    }
    val s2 = IcebergExport.mergeUpsert(spark, t,
      Seq((1L, "U1"), (3L, "U3"), (20L, "N")).toDF("id", "s").coalesce(1),
      Seq("id")).get
    assert(snap(t) == Set(
      (0L, "r0"), (1L, "U1"), (2L, "r2"), (3L, "U3"), (4L, "r4"),
      (5L, "r5"), (20L, "N")))
    // the pre-merge files all survive (blind: no rewrite, no read)
    val meta = IcebergTable.metadataJson(t)
    val filesAfter = IcebergTable.dataFilesOf(
      t, meta, IcebergTable.currentSnapshotNode(meta)).toSet
    assert(filesBefore.subsetOf(filesAfter), "upsert must not rewrite files")
    // time travel still sees the pre-merge values
    assert(IcebergTable.read(spark, t, Some(s1))
      .filter(col("id") === 1L).head().getString(1) == "r1")
    // operation stamps the row-delta form
    val op = IcebergTable.metadataTable(spark, t, "snapshots")
      .filter(col("snapshot_id") === s2)
      .select(col("operation")).head().getString(0)
    assert(op == "overwrite")
    // a second upsert of the same key wins again (scope stacks)
    IcebergExport.mergeUpsert(spark, t,
      Seq((1L, "U1b")).toDF("id", "s").coalesce(1), Seq("id"))
    assert(snap(t).contains((1L, "U1b")) && !snap(t).exists(_._2 == "U1"))
    // empty source is a no-op
    assert(IcebergExport.mergeUpsert(spark, t,
      spark.emptyDataset[(Long, String)].toDF("id", "s"), Seq("id")).isEmpty)
  }

  test("the changelog shows an upsert as delete(old)+insert(new) in one ordinal") {
    val t = tbl()
    IcebergExport.create(
      (0L until 4L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.mergeUpsert(spark, t,
      Seq((2L, "U2"), (9L, "N")).toDF("id", "s").coalesce(1), Seq("id"))
    val got = IcebergChangelog.changelog(spark, t)
      .select(col("id"), col("s"), col("_change_type"),
        col("_change_ordinal"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSeq.sorted
    val want = ((0L until 4L).map(i => (i, s"r$i", "insert", 0)) ++
      Seq((2L, "r2", "delete", 1), (2L, "U2", "insert", 1),
        (9L, "N", "insert", 1))).sorted
    assert(got == want, s"upsert changelog drifted:\n$got\nvs\n$want")
  }

  test("v3 upsert keeps lineage: survivors keep ids, new rows take fresh ones") {
    val t = tbl()
    IcebergExport.createV3(
      (0L until 4L).map(i => (i, s"r$i")).toDF("id", "s")
        .coalesce(1).sortWithinPartitions("id"), t)
    IcebergExport.mergeUpsert(spark, t,
      Seq((1L, "U1"), (10L, "N")).toDF("id", "s").coalesce(1), Seq("id"))
    val rows = IcebergTable.readLineage(spark, t)
      .select(col("id"), col("_row_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows(0L) == 0L && rows(2L) == 2L && rows(3L) == 3L,
      "survivors must keep their row ids")
    assert(rows(1L) >= 4L && rows(10L) >= 4L,
      "upserted rows are NEW rows with fresh lineage ids")
    assert(rows(1L) != rows(10L))
  }

  test("a Delta replica mirrors an Iceberg table through its changelog") {
    val src = tbl()
    val rep = {
      val d = Files.createTempDirectory("xfmt_rep_").toString
      java.nio.file.Files.delete(java.nio.file.Paths.get(d)); d
    }
    IcebergExport.create(
      (0L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), src)
    // v1 sources refuse (no sequence line to anchor the offset)
    CdfReplica.initFromIceberg(spark, src, rep)
    val e = intercept[IllegalArgumentException] {
      CdfReplica.syncFromIceberg(spark, src, rep, Seq("id"), "xmirror")
    }
    assert(e.getMessage.contains("sequence-number"))
    // an upsert upgrades to v2 — from here the mirror tracks exactly
    IcebergExport.mergeUpsert(spark, src,
      Seq((1L, "U1"), (20L, "N")).toDF("id", "s").coalesce(1), Seq("id"))
    val e2 = intercept[IllegalArgumentException] {
      CdfReplica.syncFromIceberg(spark, src, rep, Seq("id"), "xmirror")
    }
    assert(e2.getMessage.contains("sequence-number"),
      "the v1 create snapshot still has no sequence number")
    // re-point at a window whose snapshots ALL carry sequence numbers:
    // expire the v1-era snapshot, then full-resync into a fresh mirror
    IcebergExport.expireSnapshots(src, 1)
    val rep2 = {
      val d = Files.createTempDirectory("xfmt_rep2_").toString
      java.nio.file.Files.delete(java.nio.file.Paths.get(d)); d
    }
    CdfReplica.initFromIceberg(spark, src, rep2)
    CdfReplica.syncFromIceberg(spark, src, rep2, Seq("id"), "xmirror")
    def snapD(t: String): Set[(Long, String)] =
      DeltaLog.read(spark, t).select(col("id"), col("s"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(snapD(rep2) == snap(src), "cross-format mirror must match")
    // further upserts and equality deletes flow through
    IcebergExport.mergeUpsert(spark, src,
      Seq((2L, "U2")).toDF("id", "s").coalesce(1), Seq("id"))
    IcebergExport.deleteWhereEquality(spark, src, Seq(4L).toDF("id"))
    CdfReplica.syncFromIceberg(spark, src, rep2, Seq("id"), "xmirror")
    assert(snapD(rep2) == snap(src))
    // nothing new → None
    assert(CdfReplica
      .syncFromIceberg(spark, src, rep2, Seq("id"), "xmirror").isEmpty)
  }
}
