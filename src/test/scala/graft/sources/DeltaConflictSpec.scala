package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-writer CONFLICT CHECKING on the Delta write paths (r14 —
  * the "append-only module contract" scope bound lifted):
  * overwriteWhere (dynamic partition overwrite) and compact validate
  * at commit time that no concurrent writer changed the files they
  * computed their removes against. Disjoint writers serialize and
  * both land; overlapping ones abort loudly with
  * ConcurrentModificationException — never lost rows, never a
  * silently-undone delete.
  */
class DeltaConflictSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String = {
    val t = Files.createTempDirectory("delta_conflict_").toString
    Files.delete(Paths.get(t))
    t
  }

  private def rows(t: String): Set[(Long, String)] =
    DeltaLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("overwriteWhere replaces exactly the partitions present in df") {
    val t = tbl()
    DeltaExport.create(
      Seq((1L, "us"), (2L, "us"), (3L, "de"), (4L, "fr"))
        .toDF("id", "region"), t, Seq("region"))
    DeltaExport.overwriteWhere(
      Seq((10L, "us"), (40L, "fr")).toDF("id", "region"), t, Seq("region"))
    assert(rows(t) == Set((10L, "us"), (40L, "fr"), (3L, "de")),
      "us and fr replaced, de untouched")
    // time travel still sees the pre-overwrite snapshot
    assert(DeltaLog.read(spark, t, Some(0L)).count() == 4L)
  }

  test("racing overwriteWhere on DISJOINT partitions: both land") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = tbl()
    DeltaExport.create(
      Seq((1L, "us"), (2L, "de"), (3L, "fr")).toDF("id", "region"),
      t, Seq("region"))
    val fs = Seq(
      Future(DeltaExport.overwriteWhere(
        Seq((10L, "us")).toDF("id", "region"), t, Seq("region"))),
      Future(DeltaExport.overwriteWhere(
        Seq((20L, "de")).toDF("id", "region"), t, Seq("region"))))
    val vs = Await.result(Future.sequence(fs), 2.minutes)
    assert(vs.toSet == Set(1L, 2L), s"distinct versions: $vs")
    assert(rows(t) == Set((10L, "us"), (20L, "de"), (3L, "fr")),
      "both disjoint overwrites must land, fr untouched")
  }

  test("overwriteWhere on the SAME partition: the second writer aborts loudly") {
    val t = tbl()
    DeltaExport.create(
      Seq((1L, "us"), (2L, "de")).toDF("id", "region"), t, Seq("region"))
    // the seam injects a competing commit to the SAME partition into
    // writer A's read→commit window — deterministic overlap
    val e = intercept[java.util.ConcurrentModificationException] {
      DeltaExport.overwriteWhere(
        Seq((10L, "us")).toDF("id", "region"), t, Seq("region"),
        () => {
          DeltaExport.overwriteWhere(
            Seq((99L, "us")).toDF("id", "region"), t, Seq("region"))
          ()
        })
    }
    assert(e.getMessage.contains("conflict"), e.getMessage)
    // the WINNER's rows hold; nothing was lost or doubly applied
    assert(rows(t) == Set((99L, "us"), (2L, "de")))
    // and a re-run against the new snapshot succeeds
    DeltaExport.overwriteWhere(
      Seq((10L, "us")).toDF("id", "region"), t, Seq("region"))
    assert(rows(t) == Set((10L, "us"), (2L, "de")))
  }

  test("a DISJOINT commit in the overwrite window does NOT abort") {
    val t = tbl()
    DeltaExport.create(
      Seq((1L, "us"), (2L, "de")).toDF("id", "region"), t, Seq("region"))
    DeltaExport.overwriteWhere(
      Seq((10L, "us")).toDF("id", "region"), t, Seq("region"),
      () => {
        DeltaExport.overwriteWhere(
          Seq((20L, "de")).toDF("id", "region"), t, Seq("region"))
        ()
      })
    assert(rows(t) == Set((10L, "us"), (20L, "de")),
      "disjoint writers must both land")
  }

  test("a delete racing into the OPTIMIZE commit window aborts the compaction") {
    val t = tbl()
    DeltaExport.create(
      (0L until 40L).map(i => (i, s"r$i")).toDF("id", "s").repartition(4), t)
    val e = intercept[java.util.ConcurrentModificationException] {
      DeltaExport.compact(
        spark, t, 64L * 1024 * 1024,
        () => { DeltaExport.deleteWhere(spark, t, col("id") === 7L); () })
    }
    assert(e.getMessage.contains("OPTIMIZE conflict"), e.getMessage)
    // the delete holds — nothing resurrected by a stale rewrite
    val ids = DeltaLog.read(spark, t).collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 40L).toSet - 7L, "delete must survive the abort")
    // re-run compacts fine and keeps the delete applied
    val (b, a) = DeltaExport.compact(spark, t, 64L * 1024 * 1024)
    assert(a < b, s"$b → $a")
    assert(DeltaLog.read(spark, t).collect().map(_.getLong(0)).toSet
      == (0L until 40L).toSet - 7L)
  }

  test("REPLACE TABLE swaps content AND definition atomically") {
    val t = tbl()
    DeltaExport.create(
      Seq((1L, "us"), (2L, "de")).toDF("id", "region"), t, Seq("region"))
    val id0 = DeltaLog.stateAt(spark, t, None).tableId
    // replace with a DIFFERENT schema, partitioning and properties
    DeltaExport.replaceTable(
      Seq((10L, "a", 1.5), (20L, "b", 2.5)).toDF("k", "name", "score"),
      t, Nil, Map("graft.kind" -> "replaced"))
    val st = DeltaLog.stateAt(spark, t, None)
    assert(st.partitionCols.isEmpty)
    assert(st.configuration.get("graft.kind").contains("replaced"))
    assert(st.tableId != id0,
      "REPLACE must take a fresh table identity (downstream readers reset)")
    val got = DeltaLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((10L, "a", 1.5), (20L, "b", 2.5)), s"$got")
    // time travel still reads the OLD definition's rows
    assert(DeltaLog.read(spark, t, Some(0L)).count() == 2L)
    assert(DeltaLog.read(spark, t, Some(0L)).columns.toSeq
      == Seq("id", "region"))
  }

  test("a data commit racing into the REPLACE window aborts the replace") {
    val t = tbl()
    DeltaExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    intercept[java.util.ConcurrentModificationException] {
      DeltaExport.replaceTable(
        Seq((9L, "z")).toDF("id", "s"), t, Nil, Map.empty,
        () => {
          DeltaExport.append(
            Seq((2L, "b")).toDF("id", "s").coalesce(1), t)
          ()
        })
    }
    // the loser committed nothing: both pre-race rows intact
    assert(rows(t) == Set((1L, "a"), (2L, "b")))
  }

  test("a concurrent APPEND during OPTIMIZE is no conflict") {
    val t = tbl()
    DeltaExport.create(
      (0L until 20L).map(i => (i, s"r$i")).toDF("id", "s").repartition(4), t)
    val (b, a) = DeltaExport.compact(
      spark, t, 64L * 1024 * 1024,
      () => {
        DeltaExport.append(Seq((100L, "x")).toDF("id", "s").coalesce(1), t)
        ()
      })
    assert(a < b)
    assert(DeltaLog.read(spark, t).collect().map(_.getLong(0)).toSet
      == (0L until 20L).toSet + 100L,
      "the concurrent append's rows must survive the compaction commit")
  }
}
