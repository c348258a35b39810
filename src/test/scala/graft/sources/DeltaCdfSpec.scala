package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Delta CHANGE DATA FEED (r14): incremental row-level changes
  * between versions — computed from add/remove/DV deltas (inserts
  * for new files, deletes for removed files' live rows and for
  * newly-DV'd positions), `cdc` actions taken verbatim when a writer
  * recorded them, OPTIMIZE contributing nothing. The invariant every
  * consumer relies on: applying the feed over a window to the
  * starting snapshot reproduces the ending snapshot.
  */
class DeltaCdfSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String = {
    val t = Files.createTempDirectory("delta_cdf_").toString
    Files.delete(Paths.get(t))
    t
  }

  private def changes(
      t: String, from: Long, to: Option[Long] = None): Seq[(Long, String, Long)] =
    DeltaCdf.readChangeFeed(spark, t, from, to)
      .select(col("id"), col("_change_type"), col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted

  test("appends, DV deletes and OPTIMIZE feed the expected changes") {
    val t = tbl()
    DeltaExport.create(
      (0L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    DeltaExport.append(
      Seq((10L, "x"), (11L, "y")).toDF("id", "s").coalesce(1), t) // v1
    DeltaExport.deleteWhere(spark, t, col("id") === 2L) // v2
    DeltaExport.deleteWhere(spark, t, col("id") === 10L) // v3
    DeltaExport.compact(spark, t, 64L * 1024 * 1024) // v4: dataChange false
    val got = changes(t, 0L)
    val want = ((0L until 6L).map(i => (i, "insert", 0L)) ++
      Seq((10L, "insert", 1L), (11L, "insert", 1L),
        (2L, "delete", 2L), (10L, "delete", 3L))).sorted
    assert(got == want, s"feed drifted:\n$got\nvs\n$want")
    // a subrange sees only its versions
    assert(changes(t, 2L, Some(3L))
      == Seq((2L, "delete", 2L), (10L, "delete", 3L)))
    // the OPTIMIZE-only window is empty with the right schema
    val opt = DeltaCdf.readChangeFeed(spark, t, 4L, Some(4L))
    assert(opt.count() == 0L)
    assert(opt.columns.toSeq
      == Seq("id", "s", "_change_type", "_commit_version"))
  }

  test("applying the feed to the start snapshot reproduces the end snapshot") {
    val t = tbl()
    DeltaExport.create(
      (0L until 20L).map(i => (i, i % 3)).toDF("id", "grp").coalesce(1), t)
    DeltaExport.append(
      (20L until 25L).map(i => (i, i % 3)).toDF("id", "grp").coalesce(1), t)
    DeltaExport.deleteWhere(spark, t, col("id") % 4 === 1L)
    DeltaExport.overwrite(
      (100L until 105L).map(i => (i, i % 3)).toDF("id", "grp").coalesce(1), t)
    DeltaExport.deleteWhere(spark, t, col("id") === 103L)
    val latest = DeltaLog.version(spark, t)
    for (from <- 1L to latest) {
      def snap(v: Long): Seq[(Long, Long)] =
        DeltaLog.read(spark, t, Some(v)).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val feed = DeltaCdf.readChangeFeed(spark, t, from, Some(latest))
        .select(col("id"), col("grp"), col("_change_type")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val inserts = feed.filter(_._3 == "insert").map(x => (x._1, x._2))
      val deletes = feed.filter(_._3 == "delete").map(x => (x._1, x._2))
      val applied =
        ((snap(from - 1) ++ inserts).groupBy(identity).flatMap {
          case (row, occ) =>
            val del = deletes.count(_ == row)
            Seq.fill(occ.size - del)(row)
        }).toSeq.sorted
      assert(applied == snap(latest),
        s"CDF from $from must rebuild the end snapshot")
    }
  }

  test("an SCD2 MERGE feeds as delete+insert pairs that rebuild the dimension") {
    val t = tbl()
    def obs(rows: (Long, String, Long, String)*) =
      rows.toDF("user_id", "event_type", "tus", "event_id")
    DeltaScd2.merge(spark, t, obs((1L, "view", 100L, "e1"))) // v0
    DeltaScd2.merge(spark, t, obs((1L, "purchase", 200L, "e2"),
      (2L, "view", 150L, "e3"))) // v1
    val latest = DeltaLog.version(spark, t)
    assert(latest == 1L)
    def snap(v: Long): Set[(Long, Long, String)] =
      DeltaLog.read(spark, t, Some(v))
        .select(col("user_id"), col("version"), col("event_type"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
    val feed = DeltaCdf.readChangeFeed(spark, t, 1L, Some(1L))
      .select(col("user_id"), col("version"), col("event_type"),
        col("_change_type"))
      .collect().map(r =>
        ((r.getLong(0), r.getLong(1), r.getString(2)), r.getString(3)))
    val ins = feed.filter(_._2 == "insert").map(_._1).toSet
    val del = feed.filter(_._2 == "delete").map(_._1).toSet
    assert((snap(0L) -- del) ++ ins == snap(1L),
      s"merge feed must rebuild the dimension: ins=$ins del=$del")
    // the closed version appears as delete(old open row) + inserts
    assert(del.contains((1L, 1L, "view")),
      "closing user 1's open version must feed its pre-image delete")
  }

  test("cdc actions are taken verbatim; file actions then don't double-count") {
    val t = tbl()
    DeltaExport.create(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), t)
    // forge a writer that recorded explicit change files: an update
    // of id=2 as pre/postimage rows, alongside the remove+add file
    // churn that would otherwise feed delete+insert of everything
    val stage = Files.createTempDirectory("cdf_cdc")
    Seq((2L, "b", "update_preimage"), (2L, "B2", "update_postimage"))
      .toDF("id", "s", "_change_type")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = {
      val s = Files.list(stage)
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    Files.createDirectories(Paths.get(t, "_change_data"))
    val cdcRel = "_change_data/cdc-0.parquet"
    Files.move(part, Paths.get(t, cdcRel))
    // the rewritten data file (id=2 updated)
    val stage2 = Files.createTempDirectory("cdf_cdc2")
    Seq((1L, "a"), (2L, "B2")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(stage2.toString)
    val part2 = {
      val s = Files.list(stage2)
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    val newRel = "part-upd.parquet"
    Files.move(part2, Paths.get(t, newRel))
    val oldRel = DeltaLog.activeFiles(spark, t)
      .collect().map(_.getString(0)).head
      .split('/').last
    Files.write(Paths.get(t, "_delta_log", f"${1L}%020d.json"),
      (s"""{"cdc":{"path":"$cdcRel","partitionValues":{},"size":1,"dataChange":false}}""" + "\n" +
        s"""{"remove":{"path":"$oldRel","deletionTimestamp":1,"dataChange":true}}""" + "\n" +
        s"""{"add":{"path":"$newRel","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}""" + "\n")
        .getBytes(StandardCharsets.UTF_8))
    val feed = DeltaCdf.readChangeFeed(spark, t, 1L, Some(1L))
      .select(col("id"), col("s"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(feed == Set(
      (2L, "b", "update_preimage"), (2L, "B2", "update_postimage")),
      s"cdc rows verbatim, file churn ignored: $feed")
  }

  test("overwriteWhere feeds exactly the replaced partition's rows") {
    val t = tbl()
    DeltaExport.create(
      Seq((1L, "us"), (2L, "us"), (3L, "de")).toDF("id", "region"),
      t, Seq("region"))
    DeltaExport.overwriteWhere(
      Seq((10L, "us")).toDF("id", "region"), t, Seq("region"))
    val feed = DeltaCdf.readChangeFeed(spark, t, 1L, Some(1L))
      .select(col("id"), col("region"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(feed == Set(
      (1L, "us", "delete"), (2L, "us", "delete"), (10L, "us", "insert")),
      s"de must not appear in the feed: $feed")
  }

  test("guards: shrunken vectors and cleaned-up commits refuse loudly") {
    val t = tbl()
    DeltaExport.create(
      (0L until 8L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    DeltaExport.deleteWhere(spark, t, col("id") < 3L)
    // forge an UN-delete: re-add the file with a smaller vector
    val st = DeltaLog.stateAt(spark, t, None)
    val a = st.active.values.head
    val smaller = DeltaDv.writeFileU(t, Array(0L))
    val pvJson = "{}"
    Files.write(Paths.get(t, "_delta_log", f"${2L}%020d.json"),
      (s"""{"remove":{"path":"${a.path}","deletionTimestamp":1,"dataChange":true}}""" + "\n" +
        s"""{"add":{"path":"${a.path}","partitionValues":$pvJson,"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"${smaller.storageType}","pathOrInlineDv":"${smaller.pathOrInlineDv}","offset":${smaller.offset},"sizeInBytes":${smaller.sizeInBytes},"cardinality":${smaller.cardinality}}}}""" + "\n")
        .getBytes(StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] {
      DeltaCdf.readChangeFeed(spark, t, 2L, Some(2L)).collect()
    }
    assert(e.getMessage.contains("SHRANK"), e.getMessage)
    // a range past the log's JSON commits refuses (checkpoint + clean)
    val e2 = intercept[IllegalArgumentException] {
      DeltaCdf.readChangeFeed(spark, t, 0L, Some(99L))
    }
    assert(e2.getMessage.contains("invalid CDF range"), e2.getMessage)
    DeltaExport.checkpoint(spark, t)
    Files.delete(Paths.get(t, "_delta_log", f"${0L}%020d.json"))
    val e3 = intercept[IllegalArgumentException] {
      DeltaCdf.readChangeFeed(spark, t, 0L, Some(1L)).collect()
    }
    assert(e3.getMessage.contains("JSON commit"), e3.getMessage)
  }
}
