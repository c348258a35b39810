package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MERGE INTO (r14): copy-on-write upsert — touched files rewritten,
  * untouched files left byte-identical, matched rows replaced or
  * deleted, not-matched source rows inserted; DV'd positions never
  * match; change data files authored on CDF-enabled tables so the
  * feed shows update_preimage/update_postimage pairs; serializable
  * abort on any concurrent data commit.
  */
class DeltaMergeSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String = {
    val t = Files.createTempDirectory("delta_merge_").toString
    Files.delete(Paths.get(t))
    t
  }

  private def rows(t: String, v: Option[Long] = None): Set[(Long, String, Long)] =
    DeltaLog.read(spark, t, v)
      .select(col("id"), col("s"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def mk(t: String, props: Map[String, String] = Map.empty): Unit = {
    // two files so the merge can touch one and must leave the other
    // byte-identical
    DeltaExport.create(
      (0L until 4L).map(i => (i, s"r$i", i * 10)).toDF("id", "s", "n")
        .coalesce(1), t, Nil, props)
    DeltaExport.append(
      (4L until 8L).map(i => (i, s"r$i", i * 10)).toDF("id", "s", "n")
        .coalesce(1), t)
  }

  test("upsert: matched rows updated, unmatched kept, new rows inserted") {
    val t = tbl(); mk(t)
    val before = DeltaLog.stateAt(spark, t, None).active.keySet
    // touches only the first file (ids 0..3) + inserts
    val src = Seq((1L, "U1", 111L), (3L, "U3", 333L), (20L, "N", 200L))
      .toDF("id", "s", "n")
    val v = DeltaMerge.merge(spark, t, src, Seq("id"),
      Some(DeltaMerge.UpdateAll), insertNotMatched = true)
    assert(v.contains(2L))
    assert(rows(t) == Set(
      (0L, "r0", 0L), (1L, "U1", 111L), (2L, "r2", 20L), (3L, "U3", 333L),
      (4L, "r4", 40L), (5L, "r5", 50L), (6L, "r6", 60L), (7L, "r7", 70L),
      (20L, "N", 200L)))
    // time travel to the pre-merge snapshot still works
    assert(rows(t, Some(1L)) ==
      (0L until 8L).map(i => (i, s"r$i", i * 10)).toSet)
    // the untouched file survived the merge un-rewritten
    val after = DeltaLog.stateAt(spark, t, None).active.keySet
    val untouched = before.intersect(after)
    assert(untouched.nonEmpty, "merge rewrote a file it never matched")
  }

  test("DeleteMatched removes exactly the matched rows") {
    val t = tbl(); mk(t)
    val v = DeltaMerge.merge(spark, t,
      Seq((0L, "", 0L), (5L, "", 0L), (99L, "", 0L)).toDF("id", "s", "n"),
      Seq("id"), Some(DeltaMerge.DeleteMatched), insertNotMatched = false)
    assert(v.contains(2L))
    assert(rows(t).map(_._1) == Set(1L, 2L, 3L, 4L, 6L, 7L))
  }

  test("a DV-deleted position neither matches nor resurrects") {
    val t = tbl(); mk(t)
    DeltaExport.deleteWhere(spark, t, col("id") === 1L) // v2: DV
    // id=1 is dead — the source row for it must INSERT, not update
    DeltaMerge.merge(spark, t,
      Seq((1L, "BACK", 1000L)).toDF("id", "s", "n"),
      Seq("id"), Some(DeltaMerge.UpdateAll), insertNotMatched = true)
    val got = rows(t)
    assert(got.contains((1L, "BACK", 1000L)))
    assert(!got.contains((1L, "r1", 10L)), "the DV'd row came back to life")
    assert(got.size == 8)
  }

  test("duplicate source keys on a matched row are refused; duplicate inserts are not") {
    val t = tbl(); mk(t)
    val dup = Seq((1L, "A", 1L), (1L, "B", 2L)).toDF("id", "s", "n")
    val e = intercept[IllegalArgumentException] {
      DeltaMerge.merge(spark, t, dup, Seq("id"),
        Some(DeltaMerge.UpdateAll), insertNotMatched = false)
    }
    assert(e.getMessage.contains("multiple source rows"))
    assert(rows(t) == (0L until 8L).map(i => (i, s"r$i", i * 10)).toSet)
    // duplicate keys that match NOTHING insert both rows (Delta's rule:
    // only multiple matches are ambiguous)
    val dupIns = Seq((50L, "A", 1L), (50L, "B", 2L)).toDF("id", "s", "n")
    DeltaMerge.merge(spark, t, dupIns, Seq("id"),
      Some(DeltaMerge.UpdateAll), insertNotMatched = true)
    assert(rows(t).count(_._1 == 50L) == 2)
  }

  test("insert-only merge rewrites nothing") {
    val t = tbl(); mk(t)
    val before = DeltaLog.stateAt(spark, t, None).active.keySet
    DeltaMerge.merge(spark, t,
      Seq((1L, "IGNORED", 0L), (30L, "NEW", 300L)).toDF("id", "s", "n"),
      Seq("id"), None, insertNotMatched = true)
    val after = DeltaLog.stateAt(spark, t, None).active.keySet
    assert(before.subsetOf(after), "insert-only merge removed a file")
    assert(rows(t).contains((1L, "r1", 10L)))
    assert(rows(t).contains((30L, "NEW", 300L)))
    // and a merge that changes nothing commits nothing
    val vBefore = DeltaLog.version(spark, t)
    val r = DeltaMerge.merge(spark, t,
      Seq((1L, "X", 0L)).toDF("id", "s", "n"),
      Seq("id"), None, insertNotMatched = true)
    assert(r.isEmpty && DeltaLog.version(spark, t) == vBefore)
  }

  test("CDF-enabled merge feeds update_preimage/postimage, delete and insert") {
    val t = tbl()
    mk(t, Map("delta.enableChangeDataFeed" -> "true"))
    val st = DeltaLog.stateAt(spark, t, None)
    assert(st.minWriter >= 4, "CDF table must declare the writer feature")
    val v = DeltaMerge.merge(spark, t,
      Seq((1L, "U1", 111L), (20L, "N", 200L)).toDF("id", "s", "n"),
      Seq("id"), Some(DeltaMerge.UpdateAll), insertNotMatched = true).get
    val feed = DeltaCdf.readChangeFeed(spark, t, v, Some(v))
      .select(col("id"), col("s"), col("n"), col("_change_type"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(feed == Set(
      (1L, "r1", 10L, "update_preimage"),
      (1L, "U1", 111L, "update_postimage"),
      (20L, "N", 200L, "insert")),
      s"merge feed drifted: $feed")
    // the commit authored real cdc actions (file actions must be
    // ignored for the feed — no phantom delete+insert of carried rows)
    val commit = Files.readAllLines(
      Paths.get(t, "_delta_log", f"$v%020d.json"),
      StandardCharsets.UTF_8).asScala
    assert(commit.exists(_.contains("\"cdc\"")))
    // a DELETE-merge feeds deletes
    val v2 = DeltaMerge.merge(spark, t,
      Seq((2L, "", 0L)).toDF("id", "s", "n"),
      Seq("id"), Some(DeltaMerge.DeleteMatched), insertNotMatched = false).get
    val feed2 = DeltaCdf.readChangeFeed(spark, t, v2, Some(v2))
      .select(col("id"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed2 == Set((2L, "delete")))
  }

  test("partitioned merge keeps rows in their partitions") {
    val t = tbl()
    val df = (0L until 8L).map(i => (i, s"r$i", i * 10, (i % 2).toString))
      .toDF("id", "s", "n", "p")
    DeltaExport.create(df, t, Seq("p"))
    DeltaMerge.merge(spark, t,
      Seq((3L, "U3", 333L, "1"), (10L, "N", 100L, "0"))
        .toDF("id", "s", "n", "p"),
      Seq("id"), Some(DeltaMerge.UpdateAll), insertNotMatched = true)
    val got = DeltaLog.read(spark, t, None)
      .select(col("id"), col("s"), col("p"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got.contains((3L, "U3", "1")))
    assert(got.contains((10L, "N", "0")))
    assert(got.size == 9)
    // partition directories hold the right files
    val st = DeltaLog.stateAt(spark, t, None)
    assert(st.active.values.forall(a => a.partitionValues.contains("p")))
  }

  test("a concurrent data commit aborts the merge; re-run succeeds") {
    val t = tbl(); mk(t)
    val e = intercept[java.util.ConcurrentModificationException] {
      DeltaMerge.merge(spark, t,
        Seq((1L, "U1", 111L)).toDF("id", "s", "n"),
        Seq("id"), Some(DeltaMerge.UpdateAll), insertNotMatched = true,
        beforeCommit = () => {
          // the competitor appends a row the merge never considered
          DeltaExport.append(
            Seq((90L, "RACE", 900L)).toDF("id", "s", "n").coalesce(1), t)
        })
    }
    assert(e.getMessage.contains("MERGE conflict"))
    // nothing committed by the loser; the winner's append is intact
    assert(rows(t) ==
      ((0L until 8L).map(i => (i, s"r$i", i * 10)) :+ ((90L, "RACE", 900L))).toSet)
    // re-run against the new snapshot lands
    DeltaMerge.merge(spark, t,
      Seq((1L, "U1", 111L)).toDF("id", "s", "n"),
      Seq("id"), Some(DeltaMerge.UpdateAll), insertNotMatched = true)
    assert(rows(t).contains((1L, "U1", 111L)))
  }

  test("setProperties preserves the table id and upgrades the protocol for CDF") {
    val t = tbl(); mk(t)
    val id0 = DeltaLog.stateAt(spark, t, None).tableId
    assert(id0.nonEmpty)
    DeltaExport.setProperties(spark, t,
      Map("delta.enableChangeDataFeed" -> "true"))
    val st = DeltaLog.stateAt(spark, t, None)
    assert(st.tableId == id0, "setProperties changed the table identity")
    assert(st.minWriter == 4)
    assert(st.configuration("delta.enableChangeDataFeed") == "true")
    // a merge AFTER enablement writes change data
    val v = DeltaMerge.merge(spark, t,
      Seq((0L, "U0", 1L)).toDF("id", "s", "n"),
      Seq("id"), Some(DeltaMerge.UpdateAll), insertNotMatched = false).get
    val feed = DeltaCdf.readChangeFeed(spark, t, v, Some(v))
      .select(col("_change_type")).collect().map(_.getString(0)).sorted
    assert(feed.toSeq == Seq("update_postimage", "update_preimage"))
    // the id also survives a checkpoint round-trip
    DeltaExport.checkpoint(spark, t)
    // drop the JSON commits the checkpoint subsumes so the replay
    // must come FROM the checkpoint
    assert(DeltaLog.stateAt(spark, t, None).tableId == id0)
  }
}
