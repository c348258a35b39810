package graft.sources

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Delta RESTORE + timestamp time travel + DESCRIBE HISTORY (r14):
  * restore re-adds the old snapshot's files (deletion vectors and
  * stats re-serialized exactly), removes the newer ones, keeps the
  * history walkable; timestamps resolve through monotonic-adjusted
  * commit times; vacuumed snapshots refuse to restore.
  */
class DeltaRestoreSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String = {
    val t = Files.createTempDirectory("delta_restore_").toString
    Files.delete(Paths.get(t))
    t
  }

  private def ids(t: String, v: Option[Long] = None): Set[Long] =
    DeltaLog.read(spark, t, v).select(col("id"))
      .collect().map(_.getLong(0)).toSet

  test("restore rewinds data and DVs; a later restore fast-forwards again") {
    val t = tbl()
    DeltaExport.create(
      (0L until 8L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t) // v0
    DeltaExport.append(
      Seq((10L, "x")).toDF("id", "s").coalesce(1), t) // v1
    DeltaExport.deleteWhere(spark, t, col("id") === 3L) // v2: DV
    assert(ids(t) == (0L until 8L).toSet - 3L + 10L)
    // rewind to v0: appended file removed, DV'd file re-added PLAIN
    val rv = DeltaExport.restore(spark, t, 0L)
    assert(rv.contains(3L))
    assert(ids(t) == (0L until 8L).toSet, "restore must resurrect the DV'd row")
    // the un-delete is exactly what the change feed cannot represent
    val e = intercept[IllegalArgumentException] {
      DeltaCdf.readChangeFeed(spark, t, 3L, Some(3L)).collect()
    }
    assert(e.getMessage.contains("SHRANK"))
    // every historical version still reads
    assert(ids(t, Some(2L)) == (0L until 8L).toSet - 3L + 10L)
    // restore FORWARD to the v2 state: DV re-attached
    DeltaExport.restore(spark, t, 2L)
    assert(ids(t) == (0L until 8L).toSet - 3L + 10L)
    // a no-op restore commits nothing
    val before = DeltaLog.version(spark, t)
    assert(DeltaExport.restore(spark, t, 2L).isEmpty)
    assert(DeltaLog.version(spark, t) == before)
    // history names every operation, newest first
    val hist = DeltaLog.history(spark, t)
      .select(col("version"), col("operation"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hist.map(_._1) == hist.map(_._1).sorted.reverse)
    assert(hist.map(_._2) == Seq("RESTORE", "RESTORE", "DELETE",
      "WRITE", "CREATE TABLE AS SELECT"))
  }

  test("restore of a vacuumed snapshot refuses loudly") {
    val t = tbl()
    DeltaExport.create(
      (0L until 4L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    DeltaExport.overwrite(
      Seq((9L, "z")).toDF("id", "s").coalesce(1), t)
    // age the tombstoned files past retention, then vacuum them away
    val st0 = DeltaLog.stateAt(spark, t, Some(0L)).active.keySet
    st0.foreach { rel =>
      Files.setLastModifiedTime(Paths.get(t, rel),
        FileTime.fromMillis(System.currentTimeMillis() - 100000))
    }
    assert(DeltaExport.vacuum(spark, t, 50000).nonEmpty)
    val e = intercept[IllegalArgumentException] {
      DeltaExport.restore(spark, t, 0L)
    }
    assert(e.getMessage.contains("vacuumed"))
    assert(ids(t) == Set(9L), "a refused restore must change nothing")
  }

  test("timestamp travel resolves monotonic-adjusted commit times") {
    val t = tbl()
    DeltaExport.create(
      Seq((0L, "a")).toDF("id", "s").coalesce(1), t) // v0
    DeltaExport.append(Seq((1L, "b")).toDF("id", "s").coalesce(1), t) // v1
    DeltaExport.append(Seq((2L, "c")).toDF("id", "s").coalesce(1), t) // v2
    val dir = Paths.get(t, "_delta_log")
    def stamp(v: Long, ms: Long): Unit =
      Files.setLastModifiedTime(
        dir.resolve(f"$v%020d.json"), FileTime.fromMillis(ms))
    stamp(0L, 1000000L)
    stamp(1L, 2000000L)
    stamp(2L, 1500000L) // clock skew: EARLIER than v1 on disk
    assert(DeltaLog.versionAtTimestamp(t, 1000000L) == 0L)
    assert(DeltaLog.versionAtTimestamp(t, 1999999L) == 0L)
    // v2's skewed time adjusts UP to v1's — both resolve in order
    assert(DeltaLog.versionAtTimestamp(t, 2000000L) == 2L)
    assert(DeltaLog.readAsOfTimestamp(spark, t, 1500000L)
      .count() == 1L)
    intercept[IllegalArgumentException] {
      DeltaLog.versionAtTimestamp(t, 999999L) // before the first commit
    }
    intercept[IllegalArgumentException] {
      DeltaLog.versionAtTimestamp(t, 3000000L) // after the latest
    }
  }
}
