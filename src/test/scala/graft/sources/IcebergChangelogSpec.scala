package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iceberg incremental + changelog reads (r14): per snapshot, added
  * files feed inserts, new position/DV/equality delete content feeds
  * exactly the newly-dead rows, compaction feeds nothing, and the
  * rebuild invariant holds — applying the changelog over any window
  * to the window's starting snapshot reproduces its ending snapshot.
  */
class IcebergChangelogSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("iceberg_cl_").resolve("t").toString

  private def changes(t: String,
      from: Option[Long] = None, to: Option[Long] = None): Seq[(Long, String, Int)] =
    IcebergChangelog.changelog(spark, t, from, to)
      .select(col("id"), col("_change_type"), col("_change_ordinal"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSeq.sorted

  test("appends, position deletes, equality deletes and compaction feed the expected changes") {
    val t = tbl()
    IcebergExport.create(
      (0L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t) // ord 0
    IcebergExport.append(
      Seq((10L, "x"), (11L, "y")).toDF("id", "s").coalesce(1), t) // ord 1
    IcebergExport.deleteWhere(spark, t, col("id") === 2L) // ord 2 (position)
    IcebergExport.deleteWhereEquality(
      spark, t, Seq(10L).toDF("id")) // ord 3 (equality)
    IcebergExport.rewriteDataFiles(spark, t, 64L * 1024 * 1024) // ord 4: replace
    val got = changes(t)
    val want = ((0L until 6L).map(i => (i, "insert", 0)) ++
      Seq((10L, "insert", 1), (11L, "insert", 1),
        (2L, "delete", 2), (10L, "delete", 3))).sorted
    assert(got == want, s"changelog drifted:\n$got\nvs\n$want")
    // a subrange sees only its snapshots
    val ids = IcebergTable.snapshotIds(t)
    assert(changes(t, Some(ids(2)), Some(ids(3)))
      == Seq((2L, "delete", 2), (10L, "delete", 3)))
    // the replace-only window is empty with the full column set
    val repl = IcebergChangelog.changelog(spark, t, Some(ids(4)), Some(ids(4)))
    assert(repl.count() == 0L)
    assert(repl.columns.toSeq == Seq(
      "id", "s", "_change_type", "_change_ordinal", "_commit_snapshot_id"))
  }

  test("re-deleting an already-dead position feeds nothing new") {
    val t = tbl()
    IcebergExport.create(
      (0L until 8L).map(i => (i, i % 2)).toDF("id", "k").coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") < 3L) // ord 1
    // overlapping predicate: ids 0..4, of which 0..2 are already dead
    IcebergExport.deleteWhere(spark, t, col("id") < 5L) // ord 2
    val got = changes(t).filter(_._3 == 2)
    assert(got == Seq((3L, "delete", 2), (4L, "delete", 2)),
      s"re-deletes must not re-feed: $got")
  }

  test("v3 deletion-vector generations diff per referenced file") {
    val t = tbl()
    IcebergExport.createV3(
      (0L until 12L).map(i => (i, s"r$i")).toDF("id", "s")
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"), t)
    IcebergExport.deleteWhereDv(spark, t, col("id") % 3 === 0) // ord 1
    IcebergExport.deleteWhereDv(spark, t, col("id") < 5L) // ord 2: merges
    val got = changes(t)
    val want = ((0L until 12L).map(i => (i, "insert", 0)) ++
      Seq(0L, 3L, 6L, 9L).map(i => (i, "delete", 1)) ++
      Seq(1L, 2L, 4L).map(i => (i, "delete", 2))).sorted
    assert(got == want, s"DV changelog drifted:\n$got\nvs\n$want")
  }

  test("applying the changelog to the start snapshot reproduces the end snapshot") {
    val t = tbl()
    IcebergExport.create(
      (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") % 4 === 1)
    IcebergExport.append(
      Seq((20L, "a"), (21L, "b")).toDF("id", "s").coalesce(1), t)
    IcebergExport.deleteWhereEquality(spark, t, Seq(20L, 2L).toDF("id"))
    val ids = IcebergTable.snapshotIds(t)
    for (start <- ids.indices) {
      val base: Set[(Long, String)] =
        if (start == 0) Set.empty
        else IcebergTable.read(spark, t, Some(ids(start - 1)))
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val feed = IcebergChangelog
        .changelog(spark, t, Some(ids(start)), None)
        .select(col("id"), col("s"), col("_change_type"),
          col("_change_ordinal"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
        .sortBy(_._4)
      val rebuilt = feed.foldLeft(base) { case (s, (id, v, kind, _)) =>
        if (kind == "insert") s + ((id, v)) else s - ((id, v))
      }
      val end = IcebergTable.read(spark, t)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rebuilt == end, s"rebuild from ordinal $start drifted")
    }
  }

  test("incremental append scan reads appends and refuses delete ranges") {
    val t = tbl()
    IcebergExport.create(
      (0L until 4L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.append(
      Seq((10L, "x")).toDF("id", "s").coalesce(1), t)
    IcebergExport.append(
      Seq((11L, "y")).toDF("id", "s").coalesce(1), t)
    val ids = IcebergTable.snapshotIds(t)
    val inc = IcebergChangelog
      .incrementalAppendScan(spark, t, Some(ids(1)), Some(ids(2)))
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(inc == Seq(10L, 11L))
    assert(IcebergChangelog.incrementalAppendScan(spark, t)
      .count() == 6L)
    IcebergExport.deleteWhere(spark, t, col("id") === 0L)
    val e = intercept[IllegalArgumentException] {
      IcebergChangelog.incrementalAppendScan(spark, t).collect()
    }
    assert(e.getMessage.contains("append scan range contains"))
  }
}
