package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iceberg SNAPSHOT REFS (r14): named branches and tags in the
  * metadata `refs` map, and the WRITE-AUDIT-PUBLISH workflow they
  * exist for — stage appends on a branch (main readers see nothing),
  * audit the branch by name, fast-forward main to publish atomically.
  * Tags pin releases: expireSnapshots keeps every ref'd snapshot and
  * the unpublished branch lineage alive.
  */
class IcebergRefsSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("iceberg_refs_").resolve("t").toString

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("write-audit-publish: branch commits invisible on main until fastForward") {
    val t = tbl()
    IcebergExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    IcebergExport.createBranch(t, "audit")
    // two staged commits on the branch
    IcebergExport.appendToBranch(
      Seq((2L, "b")).toDF("id", "s").coalesce(1), t, "audit")
    IcebergExport.appendToBranch(
      Seq((3L, "c")).toDF("id", "s").coalesce(1), t, "audit")
    // main is untouched; the branch sees the staged rows (the audit)
    assert(ids(IcebergTable.read(spark, t)) == Set(1L),
      "main must not see staged branch commits")
    assert(ids(IcebergTable.readRef(spark, t, "audit")) == Set(1L, 2L, 3L))
    assert(ids(IcebergTable.readRef(spark, t, "main")) == Set(1L))
    // PUBLISH: fast-forward main to the branch head
    IcebergExport.fastForward(t, "audit")
    assert(ids(IcebergTable.read(spark, t)) == Set(1L, 2L, 3L),
      "publish must atomically expose the staged commits")
    // the branch ref survives the publish (drop it explicitly)
    assert(IcebergTable.refs(t).contains("audit"))
    IcebergExport.dropRef(t, "audit")
    assert(!IcebergTable.refs(t).contains("audit"))
  }

  test("fastForward refuses a diverged branch (not an ancestor)") {
    val t = tbl()
    IcebergExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    IcebergExport.createBranch(t, "wip")
    IcebergExport.appendToBranch(
      Seq((2L, "b")).toDF("id", "s").coalesce(1), t, "wip")
    // main moves on its own → the branch has diverged
    IcebergExport.append(Seq((9L, "z")).toDF("id", "s").coalesce(1), t)
    val e = intercept[IllegalArgumentException] {
      IcebergExport.fastForward(t, "wip")
    }
    assert(e.getMessage.contains("fast-forward"), e.getMessage)
    // both lines still read correctly
    assert(ids(IcebergTable.read(spark, t)) == Set(1L, 9L))
    assert(ids(IcebergTable.readRef(spark, t, "wip")) == Set(1L, 2L))
  }

  test("tags pin snapshots through expireSnapshots; dropped refs expire") {
    val t = tbl()
    val s1 = IcebergExport.create(
      Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    IcebergExport.createTag(t, "rel-1.0", s1)
    IcebergExport.append(Seq((2L, "b")).toDF("id", "s").coalesce(1), t)
    IcebergExport.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), t)
    // keepLast=1 would normally expire s1 — the tag pins it
    val deleted = IcebergExport.expireSnapshots(t, keepLast = 1)
    assert(ids(IcebergTable.readRef(spark, t, "rel-1.0")) == Set(1L),
      "tagged snapshot must survive expire and read by name")
    // time travel by the tagged id still works too
    assert(ids(IcebergTable.read(spark, t, Some(s1))) == Set(1L))
    // drop the tag → the snapshot becomes expirable
    IcebergExport.dropRef(t, "rel-1.0")
    IcebergExport.expireSnapshots(t, keepLast = 1)
    intercept[IllegalArgumentException] {
      IcebergTable.read(spark, t, Some(s1)).collect()
    }
    assert(ids(IcebergTable.read(spark, t)) == Set(1L, 2L, 3L),
      "the current snapshot is never harmed")
    assert(deleted.isEmpty || deleted.forall(p => !p.contains("snap-" + s1)),
      "the tagged snapshot's manifest list must not have been reclaimed")
  }

  test("branch lineage survives expire so a later publish still works") {
    val t = tbl()
    IcebergExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    IcebergExport.createBranch(t, "stage")
    IcebergExport.appendToBranch(
      Seq((2L, "b")).toDF("id", "s").coalesce(1), t, "stage")
    IcebergExport.appendToBranch(
      Seq((3L, "c")).toDF("id", "s").coalesce(1), t, "stage")
    // expire aggressively; the branch's unpublished lineage is pinned
    IcebergExport.expireSnapshots(t, keepLast = 1)
    IcebergExport.fastForward(t, "stage")
    assert(ids(IcebergTable.read(spark, t)) == Set(1L, 2L, 3L))
  }

  test("max-ref-age-ms retires a tag; its snapshot then expires") {
    val t = tbl()
    val s1 = IcebergExport.create(
      Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    IcebergExport.createTag(t, "rel-old", s1)
    IcebergExport.setRefRetention(t, "rel-old", maxRefAgeMs = Some(0L))
    IcebergExport.append(Seq((2L, "b")).toDF("id", "s").coalesce(1), t)
    IcebergExport.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), t)
    // the tag's snapshot is already older than 0 ms → ref retires and
    // releases its snapshot in the same expire
    IcebergExport.expireSnapshots(t, keepLast = 1)
    assert(!IcebergTable.refs(t).contains("rel-old"),
      "aged-out ref must leave the metadata")
    intercept[Exception](
      ids(IcebergTable.read(spark, t, Some(s1))))
    assert(ids(IcebergTable.read(spark, t)) == Set(1L, 2L, 3L))
  }

  test("min-snapshots-to-keep overrides age on a branch line") {
    val t = tbl()
    IcebergExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    IcebergExport.createBranch(t, "wip")
    val b1 = IcebergExport.appendToBranch(
      Seq((2L, "b")).toDF("id", "s").coalesce(1), t, "wip")
    IcebergExport.appendToBranch(
      Seq((3L, "c")).toDF("id", "s").coalesce(1), t, "wip")
    IcebergExport.appendToBranch(
      Seq((4L, "d")).toDF("id", "s").coalesce(1), t, "wip")
    // age bound says "expire everything" (0 ms) but the count floor
    // keeps the 2 newest branch snapshots — count overrides age
    IcebergExport.setRefRetention(t, "wip",
      minSnapshotsToKeep = Some(2), maxSnapshotAgeMs = Some(0L))
    IcebergExport.expireSnapshots(t, keepLast = 1)
    // b1 (3rd newest on the branch) expired; head still reads fully —
    // its manifest list carries b1's data files, which therefore
    // survive (only b1's snapshot identity is gone)
    intercept[Exception](ids(IcebergTable.read(spark, t, Some(b1))))
    assert(ids(IcebergTable.readRef(spark, t, "wip"))
      == Set(1L, 2L, 3L, 4L))
    // a branch WITHOUT a policy still pins its whole line
    assert(IcebergTable.refs(t).contains("wip"))
  }

  test("history.expire table properties apply as branch defaults") {
    val t = tbl()
    IcebergExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    IcebergExport.setProperties(t, Map(
      "history.expire.min-snapshots-to-keep" -> "1",
      "history.expire.max-snapshot-age-ms" -> "0"))
    IcebergExport.createBranch(t, "stage")
    val b1 = IcebergExport.appendToBranch(
      Seq((2L, "b")).toDF("id", "s").coalesce(1), t, "stage")
    IcebergExport.appendToBranch(
      Seq((3L, "c")).toDF("id", "s").coalesce(1), t, "stage")
    IcebergExport.expireSnapshots(t, keepLast = 1)
    // table default policy bounds the branch walk: only the head kept
    intercept[Exception](ids(IcebergTable.read(spark, t, Some(b1))))
    assert(ids(IcebergTable.readRef(spark, t, "stage")) == Set(1L, 2L, 3L))
  }

  test("cherryPick publishes a diverged append-only branch onto main") {
    val t = tbl()
    IcebergExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    IcebergExport.createBranch(t, "wip")
    IcebergExport.appendToBranch(
      Seq((2L, "b")).toDF("id", "s").coalesce(1), t, "wip")
    IcebergExport.appendToBranch(
      Seq((3L, "c")).toDF("id", "s").coalesce(1), t, "wip")
    // main advances independently → fastForward refuses, cherryPick lands
    IcebergExport.append(Seq((9L, "z")).toDF("id", "s").coalesce(1), t)
    intercept[IllegalArgumentException](IcebergExport.fastForward(t, "wip"))
    val preMain = IcebergTable.read(spark, t).collect().map(_.getLong(0)).toSet
    assert(preMain == Set(1L, 9L))
    val picked = IcebergExport.cherryPick(t, "wip")
    assert(picked.nonEmpty)
    assert(ids(IcebergTable.read(spark, t)) == Set(1L, 2L, 3L, 9L),
      "cherry-pick must land the branch's appends on main")
    // the branch itself is untouched, and a second pick of the same
    // branch is a NO-OP (its manifests are already on main)
    assert(ids(IcebergTable.readRef(spark, t, "wip")) == Set(1L, 2L, 3L))
    assert(IcebergExport.cherryPick(t, "wip").isEmpty,
      "re-picking an already-picked branch must not duplicate rows")
    assert(ids(IcebergTable.read(spark, t)) == Set(1L, 2L, 3L, 9L))
    assert(ids(IcebergTable.read(spark, t, picked)) == Set(1L, 2L, 3L, 9L))
  }

  test("v3 cherryPick re-assigns lineage past main's watermark") {
    val t = tbl()
    IcebergExport.createV3(
      (0L until 4L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t) // row ids 0-3, next 4
    IcebergExport.createBranch(t, "wip")
    IcebergExport.appendToBranch(
      Seq((10L, "b1"), (11L, "b2")).toDF("id", "s").coalesce(1),
      t, "wip") // branch rows take 4-5 (the shared watermark)
    IcebergExport.append(
      Seq((20L, "m1")).toDF("id", "s").coalesce(1), t) // main takes 6
    assert(IcebergExport.cherryPick(t, "wip").nonEmpty)
    val lin = IcebergTable.readLineage(spark, t)
      .select(col("id"), col("_row_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // picked rows are NEW rows to lineage consumers: fresh ids 7-8
    // (their branch-time 4-5 stays the branch's own reading), every
    // id on main unique, watermark advanced
    assert(lin(20L) == 6L, s"$lin")
    assert(Set(lin(10L), lin(11L)) == Set(7L, 8L), s"$lin")
    assert(lin.values.toSeq.distinct.size == lin.size, s"$lin")
    assert(IcebergTable.metadataJson(t).get("next-row-id").asLong() == 9L)
    val blin = IcebergTable.refs(t)("wip") match {
      case (id, _) =>
        IcebergTable.readLineage(spark, t, Some(id))
          .select(col("id"), col("_row_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    assert(blin(10L) == 4L && blin(11L) == 5L,
      s"the branch keeps its own lineage: $blin")
    // a v3 re-pick must be a NO-OP despite the lineage rewrite having
    // changed the manifests' paths (provenance dedups on the branch
    // snapshot ids, not paths)
    assert(IcebergExport.cherryPick(t, "wip").isEmpty,
      "re-picking a v3 branch must not duplicate rows or ids")
    assert(IcebergTable.metadataJson(t).get("next-row-id").asLong() == 9L)
  }

  test("cherryPick refuses non-append branch lines (rewrite overlap)") {
    val t = tbl()
    val s1 = IcebergExport.create(
      Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    IcebergExport.append(Seq((2L, "b")).toDF("id", "s").coalesce(1), t)
    // a REPLACE lands on main, a branch pins it, main rolls back past
    // it and moves on — the branch line now carries the replace
    IcebergExport.rewriteDataFiles(spark, t, 128L * 1024 * 1024)
    IcebergExport.createBranch(t, "compacted")
    IcebergExport.rollbackTo(t, s1)
    IcebergExport.append(Seq((9L, "z")).toDF("id", "s").coalesce(1), t)
    val e = intercept[IllegalArgumentException](
      IcebergExport.cherryPick(t, "compacted"))
    assert(e.getMessage.contains("append"), e.getMessage)
  }

  test("ref hygiene: duplicate names, tag appends and unknown refs refuse") {
    val t = tbl()
    val s1 = IcebergExport.create(
      Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    IcebergExport.createTag(t, "pin", s1)
    intercept[IllegalArgumentException] {
      IcebergExport.createBranch(t, "pin") // name taken
    }
    intercept[IllegalArgumentException] {
      IcebergExport.appendToBranch(
        Seq((2L, "b")).toDF("id", "s").coalesce(1), t, "pin") // a tag
    }
    intercept[IllegalArgumentException] {
      IcebergExport.appendToBranch(
        Seq((2L, "b")).toDF("id", "s").coalesce(1), t, "ghost")
    }
    intercept[IllegalArgumentException] {
      IcebergTable.readRef(spark, t, "ghost")
    }
    intercept[IllegalArgumentException] {
      IcebergExport.createTag(t, "bad", 12345L) // no such snapshot
    }
    // refs survive unrelated commits (schema evolution, deletes)
    IcebergExport.renameColumn(t, "s", "name")
    IcebergExport.deleteWhere(spark, t, col("id") === 999L)
    assert(IcebergTable.refs(t).contains("pin"),
      "refs must be carried through every commit path")
  }
}
