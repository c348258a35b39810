package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iceberg COMPACTION (`rewrite_data_files` analog, the Delta
  * OPTIMIZE twin): small files bin-pack into few, rows byte-identical
  * pre/post, snapshot lineage intact (time travel reads the old
  * files), expireSnapshots reclaims them, merge-on-read deletes stay
  * correct — applied into the rewritten files, still applied to the
  * surviving ones (original sequence numbers carried).
  */
class IcebergCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("iceberg_compact_").resolve("t").toString

  private def dataFiles(t: String): Seq[String] = {
    val meta = IcebergTable.metadataJson(t)
    IcebergTable.dataFilesOf(t, meta, IcebergTable.currentSnapshotNode(meta))
  }

  test("20 small files compact to one; reads identical; lineage intact; expire reclaims") {
    val t = tbl()
    IcebergExport.create(
      (0L until 200L).map(i => (i, s"r$i")).toDF("id", "s")
        .repartition(20), t)
    val preFiles = dataFiles(t)
    assert(preFiles.size == 20, s"fixture must start at 20 files: ${preFiles.size}")
    val preRows = IcebergTable.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val preSnap = IcebergTable.snapshotIds(t).last
    val (before, after) = IcebergExport.rewriteDataFiles(
      spark, t, targetBytes = 64L * 1024 * 1024)
    assert(before == 20 && after <= 2,
      s"compaction must shrink ≥10×: $before → $after")
    assert(dataFiles(t).size == after)
    // rows identical pre/post
    val postRows = IcebergTable.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(postRows == preRows, "compaction must not change a row")
    // lineage: the pre-compaction snapshot still reads the old files
    assert(IcebergTable.read(spark, t, Some(preSnap)).count() == 200L)
    // a second compaction is a no-op (nothing left to pack)
    val (b2, a2) = IcebergExport.rewriteDataFiles(spark, t, 64L * 1024 * 1024)
    assert(b2 == a2, s"idempotent compaction drifted: $b2 → $a2")
    // expire reclaims the 20 old files from disk; reads stay correct
    val deleted = IcebergExport.expireSnapshots(t, keepLast = 1)
    assert(preFiles.forall(f => !Files.exists(Paths.get(f))),
      "expired small files must be reclaimed")
    assert(deleted.nonEmpty)
    assert(IcebergTable.read(spark, t).count() == 200L)
  }

  test("compaction respects partition boundaries") {
    val t = tbl()
    IcebergExport.create(
      Seq((1L, "us")).toDF("id", "region").coalesce(1), t, Seq("region"))
    Seq((2L, "us"), (3L, "us"), (4L, "de"), (5L, "de")).foreach { r =>
      IcebergExport.append(Seq(r).toDF("id", "region").coalesce(1), t)
    }
    assert(dataFiles(t).size == 5)
    val (_, after) = IcebergExport.rewriteDataFiles(
      spark, t, targetBytes = 64L * 1024 * 1024)
    assert(after == 2, s"one output per partition: $after")
    val got = IcebergTable.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "us"), (2L, "us"), (3L, "us"),
      (4L, "de"), (5L, "de")), got)
    // partition pruning still works on the compacted files
    val (kept, total) = IcebergTable.prunedDataFiles(t, "region", "us", "us")
    assert(total == 2 && kept.size == 1, s"$kept of $total")
  }

  test("schema-EVOLVED tables compact: survivors keep per-era resolution") {
    val t = tbl()
    // era 0: a BIG file under the original column name (will survive)
    IcebergExport.create(
      (0L until 2000L).map(i => (i, s"old$i")).toDF("id", "name")
        .coalesce(1), t)
    val bigFile = dataFiles(t).head
    IcebergExport.renameColumn(t, "name", "title")
    // era 1: small files under the new name (will compact)
    (0 until 3).foreach { k =>
      IcebergExport.append(
        Seq((9000L + k, s"new$k")).toDF("id", "title").coalesce(1), t)
    }
    val pre = IcebergTable.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val target = Files.size(Paths.get(bigFile))
    val (before, after) = IcebergExport.rewriteDataFiles(spark, t, target)
    assert(before == 4 && after == 2, s"$before → $after")
    assert(dataFiles(t).contains(bigFile), "the old-era file must survive")
    val post = IcebergTable.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(post == pre,
      "the surviving old-era file must keep resolving 'title' to its " +
        "physical 'name' by field-id — a current-schema re-brand would " +
        s"null it: ${pre.diff(post).take(3)} lost")
    // and the survivor still reads under a LATER rename too
    IcebergExport.renameColumn(t, "title", "headline")
    val again = IcebergTable.read(spark, t)
    assert(again.schema.fieldNames.contains("headline"))
    assert(again.filter(col("headline") === "old7").count() == 1L)
  }

  test("merge-on-read deletes survive compaction, both directions") {
    val t = tbl()
    // one BIG file that will survive (above target) …
    IcebergExport.create(
      (0L until 2000L).map(i => (i, s"bulk$i")).toDF("id", "s")
        .coalesce(1), t)
    val bigFile = dataFiles(t).head
    // … plus several small ones that will compact
    (0 until 4).foreach { k =>
      IcebergExport.append(
        Seq((10000L + k, s"small$k")).toDF("id", "s").coalesce(1), t)
    }
    // equality delete hits the big file AND one small row; position
    // delete hits another small row
    IcebergExport.deleteWhereEquality(
      spark, t, Seq(7L, 10001L).toDF("id"))
    IcebergExport.deleteWhere(spark, t, col("id") === 10002L)
    val preRows = IcebergTable.read(spark, t)
      .collect().map(_.getLong(0)).toSet
    assert(!preRows(7L) && !preRows(10001L) && !preRows(10002L))
    val smallSize = Files.size(Paths.get(bigFile)) // target below this
    val (before, after) = IcebergExport.rewriteDataFiles(
      spark, t, targetBytes = smallSize)
    assert(before == 5 && after == 2,
      s"4 small files pack into 1 beside the big survivor: $before → $after")
    assert(dataFiles(t).contains(bigFile),
      "the big file must survive untouched")
    // reads identical: deletes applied into the rewrite, survivor's
    // equality delete still scoped by its ORIGINAL sequence number
    val postRows = IcebergTable.read(spark, t)
      .collect().map(_.getLong(0)).toSet
    assert(postRows == preRows,
      s"deletes drifted through compaction: ${preRows.diff(postRows)} lost, " +
        s"${postRows.diff(preRows)} resurrected")
    // and a FRESH equality delete after compaction still works
    IcebergExport.deleteWhereEquality(spark, t, Seq(5L).toDF("id"))
    assert(!IcebergTable.read(spark, t)
      .collect().map(_.getLong(0)).toSet.contains(5L))
  }

  test("a delete racing into the compaction commit window ABORTS the rewrite") {
    // Iceberg RewriteFiles' validateNoNewDeletes: a row-level delete
    // committed AFTER the victims were MoR-resolved can no longer
    // match the rewritten files (new seq > delete seq; position
    // deletes reference the replaced paths) — committing anyway would
    // silently resurrect the concurrently-deleted rows. The seam
    // injects the delete exactly into the read→commit window.
    val t = tbl()
    IcebergExport.create(
      (0L until 40L).map(i => (i, s"r$i")).toDF("id", "s")
        .repartition(4), t)
    val ex = intercept[IllegalStateException] {
      IcebergExport.rewriteDataFiles(
        spark, t, 64L * 1024 * 1024,
        () => { IcebergExport.deleteWhere(spark, t, col("id") === 7L); () })
    }
    assert(ex.getMessage.contains("concurrent row-level delete"),
      ex.getMessage)
    // nothing committed: the delete holds, no rows resurrected, and a
    // RE-RUN against the post-delete snapshot succeeds
    val got = IcebergTable.read(spark, t).collect().map(_.getLong(0)).toSet
    assert(got == (0L until 40L).toSet - 7L, s"post-abort rows drifted")
    val (b2, a2) = IcebergExport.rewriteDataFiles(spark, t, 64L * 1024 * 1024)
    assert(a2 < b2, s"re-run must compact: $b2 → $a2")
    assert(IcebergTable.read(spark, t).collect().map(_.getLong(0)).toSet
      == (0L until 40L).toSet - 7L)
  }

  test("two racing compactions: one wins, the loser aborts — no duplicated rows") {
    // RewriteFiles' "files to replace must exist": the loser's
    // victims were already replaced by the winner; committing its own
    // copies of their rows would DUPLICATE them. The seam runs a full
    // competing compaction inside the read→commit window.
    val t = tbl()
    IcebergExport.create(
      (0L until 60L).map(i => (i, s"r$i")).toDF("id", "s")
        .repartition(6), t)
    val ex = intercept[java.util.ConcurrentModificationException] {
      IcebergExport.rewriteDataFiles(
        spark, t, 64L * 1024 * 1024,
        () => {
          IcebergExport.rewriteDataFiles(spark, t, 64L * 1024 * 1024); ()
        })
    }
    assert(ex.getMessage.contains("replaced by a concurrent writer"),
      ex.getMessage)
    // the winner's compaction holds; rows exactly once
    val got = IcebergTable.read(spark, t).collect().map(_.getLong(0)).toSeq
    assert(got.sorted == (0L until 60L).toSeq, s"rows duplicated or lost")
    assert(dataFiles(t).size == 1, "the winner's single file is current")
  }
}
