package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iceberg rollback + timestamp time travel + metadata tables (r14):
  * rollback is a metadata-only rewind to an ancestor recorded in the
  * snapshot-log; timestamps resolve through the log (so a rollback
  * re-dates the old snapshot's currency); the inspection tables
  * expose the planning state.
  */
class IcebergRollbackSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("iceberg_rb_").resolve("t").toString

  private def ids(t: String, snap: Option[Long] = None): Set[Long] =
    IcebergTable.read(spark, t, snap).select(col("id"))
      .collect().map(_.getLong(0)).toSet

  test("rollback rewinds to an ancestor; non-ancestors refuse") {
    val t = tbl()
    val s1 = IcebergExport.create(
      (0L until 5L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    Thread.sleep(5)
    val s2 = IcebergExport.append(
      Seq((10L, "x")).toDF("id", "s").coalesce(1), t)
    Thread.sleep(5)
    IcebergExport.deleteWhere(spark, t, col("id") === 1L)
    assert(ids(t) == Set(0L, 2L, 3L, 4L, 10L))
    IcebergExport.rollbackTo(t, s2)
    assert(ids(t) == (0L until 5L).toSet + 10L,
      "rollback must undo the delete")
    // the rolled-over snapshot stays readable by id
    assert(IcebergTable.snapshotIds(t).size == 4, "log gains an entry")
    // a new line from here makes the old delete snapshot a NON-ancestor
    IcebergExport.append(Seq((20L, "y")).toDF("id", "s").coalesce(1), t)
    val delSnap = IcebergTable.metadataTable(spark, t, "snapshots")
      .filter(col("operation") === "delete")
      .select(col("snapshot_id")).head().getLong(0)
    val e = intercept[IllegalArgumentException] {
      IcebergExport.rollbackTo(t, delSnap)
    }
    assert(e.getMessage.contains("not an ancestor"))
    // rollback to its own current refuses too
    intercept[IllegalArgumentException] {
      IcebergExport.rollbackTo(t,
        IcebergTable.snapshotLog(t).last._2)
    }
    // rewind further back: s1 is still an ancestor
    IcebergExport.rollbackTo(t, s1)
    assert(ids(t) == (0L until 5L).toSet)
  }

  test("timestamp travel resolves the snapshot-log, rollbacks included") {
    val t = tbl()
    IcebergExport.create(
      Seq((0L, "a")).toDF("id", "s").coalesce(1), t)
    Thread.sleep(5)
    IcebergExport.append(Seq((1L, "b")).toDF("id", "s").coalesce(1), t)
    Thread.sleep(5)
    val log0 = IcebergTable.snapshotLog(t)
    // each entry's own timestamp resolves to the LATEST entry at that
    // time (ties by order), and times between entries resolve backward
    assert(IcebergTable.snapshotAtTimestamp(t, log0.head._1) == log0.head._2)
    assert(IcebergTable.snapshotAtTimestamp(t, log0.last._1) == log0.last._2)
    assert(IcebergTable
      .readAsOfTimestamp(spark, t, log0.last._1 - 1).count() == 1L)
    intercept[IllegalArgumentException] {
      IcebergTable.snapshotAtTimestamp(t, log0.head._1 - 1)
    }
    // rollback appends a log entry: later timestamps resolve to the
    // OLD snapshot again
    IcebergExport.rollbackTo(t, log0.head._2)
    val log1 = IcebergTable.snapshotLog(t)
    assert(log1.size == 3 && log1.last._2 == log0.head._2)
    assert(IcebergTable.snapshotAtTimestamp(t, log1.last._1)
      == log0.head._2)
  }

  test("cleanupMetadata keeps only the newest versions; reads unharmed") {
    val t = tbl()
    val s1 = IcebergExport.create(
      Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    IcebergExport.append(Seq((2L, "b")).toDF("id", "s").coalesce(1), t)
    IcebergExport.createTag(t, "rel", s1)
    IcebergExport.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), t)
    val cur = IcebergTable.currentMetadataVersion(t)
    assert(cur >= 4)
    val deleted = IcebergExport.cleanupMetadata(t, keepLast = 1)
    assert(deleted.size == cur - 1, s"$deleted")
    // the current metadata is a complete state: reads, snapshot time
    // travel and refs all still work
    assert(IcebergTable.read(spark, t).collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L))
    assert(IcebergTable.read(spark, t, Some(s1)).count() == 1L)
    assert(IcebergTable.readRef(spark, t, "rel").count() == 1L)
    // idempotent; the table keeps committing past the cleanup
    assert(IcebergExport.cleanupMetadata(t, keepLast = 1).isEmpty)
    IcebergExport.append(Seq((4L, "d")).toDF("id", "s").coalesce(1), t)
    assert(IcebergTable.currentMetadataVersion(t) == cur + 1)
    assert(IcebergTable.read(spark, t).count() == 4L)
  }

  test("metadata tables expose snapshots, history, files, manifests, refs, partitions") {
    val t = tbl()
    IcebergExport.create(
      (0L until 8L).map(i => (i, (i % 2).toString)).toDF("id", "p"), t,
      partitionBy = Seq("p"))
    IcebergExport.deleteWhere(spark, t, col("id") === 0L)
    IcebergExport.createTag(t, "audit",
      IcebergTable.snapshotIds(t).head)
    // snapshots: two commits with the right operations
    val snaps = IcebergTable.metadataTable(spark, t, "snapshots")
      .select(col("operation")).collect().map(_.getString(0)).toSeq
    assert(snaps == Seq("append", "delete"))
    // history: both current-ancestors, made-current order preserved
    val hist = IcebergTable.metadataTable(spark, t, "history")
      .collect()
    assert(hist.length == 2 && hist.forall(_.getBoolean(3)))
    // files: partitioned data files + one position-delete file
    val files = IcebergTable.metadataTable(spark, t, "files")
    assert(files.filter(col("content") === 0).count() >= 2)
    assert(files.filter(col("content") === 1).count() == 1)
    val parts = files.filter(col("content") === 0)
      .select(col("partition")("p")).collect().map(_.getString(0)).toSet
    assert(parts == Set("0", "1"))
    // manifests: at least one data + one delete manifest
    val mans = IcebergTable.metadataTable(spark, t, "manifests")
      .select(col("content")).collect().map(_.getInt(0)).toSet
    assert(mans == Set(0, 1))
    // refs: main + the tag
    val refs = IcebergTable.metadataTable(spark, t, "refs")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(refs == Seq(("audit", "tag"), ("main", "branch")))
    // partitions: grouped live-file rollup
    val pRows = IcebergTable.metadataTable(spark, t, "partitions")
      .collect().map(r =>
        (r.getMap[String, String](0).get("p").orNull, r.getLong(1)))
      .toSeq
    assert(pRows.map(_._1).toSet == Set("0", "1"))
    assert(pRows.map(_._2).sum == 8L,
      "partitions reports MANIFEST record counts (pre-MoR-deletes)")
  }
}
