package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CDC replication (r14): a replica maintained ONLY from the source's
  * change feed equals the source snapshot after every sync; the
  * consumed offset commits atomically with the data (txn handshake),
  * so replays and zero-net windows are exactly-once.
  */
class CdfReplicaSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String = {
    val t = Files.createTempDirectory("cdf_replica_").toString
    Files.delete(Paths.get(t))
    t
  }

  private def snap(t: String): Set[(Long, String, Long)] =
    DeltaLog.read(spark, t).select(col("id"), col("s"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("the replica tracks creates, merges, DV deletes and appends exactly") {
    val src = tbl(); val rep = tbl()
    DeltaExport.create(
      (0L until 8L).map(i => (i, s"r$i", i * 10)).toDF("id", "s", "n")
        .coalesce(1), src, Nil,
      Map("delta.enableChangeDataFeed" -> "true"))
    CdfReplica.init(spark, src, rep)
    CdfReplica.sync(spark, src, rep, Seq("id"), "mirror")
    assert(snap(rep) == snap(src), "replica must replay the create")
    // a real merge (update pre/post pairs + insert), a DV delete and
    // an append land between syncs
    DeltaMerge.merge(spark, src,
      Seq((1L, "U1", 111L), (20L, "N", 200L)).toDF("id", "s", "n"),
      Seq("id"), Some(DeltaMerge.UpdateAll), insertNotMatched = true)
    DeltaExport.deleteWhere(spark, src, col("id") === 4L)
    DeltaExport.append(
      Seq((30L, "A", 300L)).toDF("id", "s", "n").coalesce(1), src)
    CdfReplica.sync(spark, src, rep, Seq("id"), "mirror")
    assert(snap(rep) == snap(src), "replica must track the window")
    // nothing new → no commit
    val v = DeltaLog.version(spark, rep)
    assert(CdfReplica.sync(spark, src, rep, Seq("id"), "mirror").isEmpty)
    assert(DeltaLog.version(spark, rep) == v)
  }

  test("a key inserted and deleted inside one window nets to nothing, watermark still advances") {
    val src = tbl(); val rep = tbl()
    DeltaExport.create(
      Seq((0L, "a", 0L)).toDF("id", "s", "n").coalesce(1), src, Nil,
      Map("delta.enableChangeDataFeed" -> "true"))
    CdfReplica.init(spark, src, rep)
    CdfReplica.sync(spark, src, rep, Seq("id"), "mirror")
    DeltaExport.append(Seq((5L, "x", 5L)).toDF("id", "s", "n").coalesce(1), src)
    DeltaExport.deleteWhere(spark, src, col("id") === 5L)
    CdfReplica.sync(spark, src, rep, Seq("id"), "mirror")
    assert(snap(rep) == snap(src))
    assert(!snap(rep).exists(_._1 == 5L))
    // the zero-net window advanced the watermark: the next sync sees
    // nothing new instead of re-reading it
    assert(DeltaLog.lastTxnVersion(spark, rep, "mirror")
      .contains(DeltaLog.version(spark, src)))
    assert(CdfReplica.sync(spark, src, rep, Seq("id"), "mirror").isEmpty)
  }

  test("a replayed window is rejected by the txn gate (crash-retry safety)") {
    val src = tbl(); val rep = tbl()
    DeltaExport.create(
      (0L until 4L).map(i => (i, s"r$i", i)).toDF("id", "s", "n")
        .coalesce(1), src, Nil,
      Map("delta.enableChangeDataFeed" -> "true"))
    CdfReplica.init(spark, src, rep)
    CdfReplica.sync(spark, src, rep, Seq("id"), "mirror")
    // simulate the crash-retry: re-apply the SAME window by hand
    val latest = DeltaLog.version(spark, src)
    val feed = DeltaCdf.readChangeFeed(spark, src, 0L, Some(latest))
    val replay = DeltaMerge.applyChanges(spark, rep,
      CdfReplica.netChanges(feed, Seq("id")), Seq("id"),
      Some(("mirror", latest)))
    assert(replay.isEmpty, "the txn gate must reject the replay")
    assert(snap(rep) == snap(src))
    assert(DeltaLog.read(spark, rep).count() == 4L, "no duplicated rows")
  }

  test("update-heavy feeds fold to the LAST postimage per key") {
    val src = tbl(); val rep = tbl()
    DeltaExport.create(
      Seq((1L, "v0", 0L)).toDF("id", "s", "n").coalesce(1), src, Nil,
      Map("delta.enableChangeDataFeed" -> "true"))
    CdfReplica.init(spark, src, rep)
    // three updates of the same key across three versions, in one window
    for (i <- 1 to 3)
      DeltaMerge.merge(spark, src,
        Seq((1L, s"v$i", i.toLong)).toDF("id", "s", "n"),
        Seq("id"), Some(DeltaMerge.UpdateAll), insertNotMatched = false)
    CdfReplica.sync(spark, src, rep, Seq("id"), "mirror")
    assert(snap(rep) == Set((1L, "v3", 3L)))
  }
}
