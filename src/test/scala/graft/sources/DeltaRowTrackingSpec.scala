package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Delta ROW TRACKING (r14) — the Delta-side sibling of Iceberg v3
  * row lineage: stable `_row_id` / `_row_commit_version` through
  * appends, DV deletes, OPTIMIZE (materialization) and checkpoints;
  * the rowIdHighWaterMark rides the `delta.rowTracking`
  * domainMetadata action and never reuses ids.
  */
class DeltaRowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String = {
    val t = Files.createTempDirectory("delta_rt_").toString
    Files.delete(Paths.get(t))
    t
  }

  private def rt(): Map[String, String] =
    Map("delta.enableRowTracking" -> "true")

  private def idsOf(t: String, v: Option[Long] = None): Map[Long, (Long, Long)] =
    DeltaRowTracking.readRowIds(spark, t, v)
      .select(col("id"), col("_row_id"), col("_row_commit_version"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("create + append assign stable ids; the watermark never reuses") {
    val t = tbl()
    DeltaExport.create(
      (0L until 5L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t, Nil, rt()) // v0: row ids 0-4
    val st0 = DeltaLog.stateAt(spark, t, None)
    assert(st0.minWriter == 7 &&
      st0.writerFeatures.contains("rowTracking") &&
      st0.writerFeatures.contains("domainMetadata"), s"$st0")
    assert(DeltaRowTracking.highWaterMark(st0) == 4L)
    DeltaExport.append(
      (10L until 13L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t) // v1: 5-7
    val got = idsOf(t)
    assert(got == ((0L until 5L).map(i => i -> ((i, 0L))) ++
      (10L until 13L).map(i => i -> ((i - 5L, 1L)))).toMap, s"$got")
    assert(DeltaRowTracking.highWaterMark(
      DeltaLog.stateAt(spark, t, None)) == 7L)
    // plain reads are untouched by the feature
    assert(DeltaLog.read(spark, t).count() == 8L)
  }

  test("DV deletes keep survivor ids; the re-add carries baseRowId") {
    val t = tbl()
    DeltaExport.create(
      (0L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t, Nil, rt())
    val before = idsOf(t)
    DeltaExport.deleteWhere(spark, t, col("id") === 2L)
    val after = idsOf(t)
    assert(after == before - 2L, s"$after")
    val add = DeltaLog.stateAt(spark, t, None).active.values.head
    assert(add.baseRowId.contains(0L) &&
      add.defaultRowCommitVersion.contains(0L),
      s"the DV re-add must keep row-tracking fields: $add")
  }

  test("OPTIMIZE materializes ids: identical through the rewrite") {
    val t = tbl()
    DeltaExport.create(
      (0L until 3L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t, Nil, rt()) // ids 0-2 @ v0
    DeltaExport.append(
      (3L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t) // 3-5 @ v1
    DeltaExport.deleteWhere(spark, t, col("id") === 4L) // v2
    val before = idsOf(t)
    val preV = DeltaLog.version(spark, t)
    val (nb, na) = DeltaExport.compact(spark, t, 128L * 1024 * 1024)
    assert(nb == 2 && na == 1)
    val after = idsOf(t)
    assert(after == before,
      s"ids AND commit versions survive OPTIMIZE:\n$after\nvs\n$before")
    // the rewritten file physically carries the materialized columns
    val st = DeltaLog.stateAt(spark, t, None)
    val ridCol = st.configuration(DeltaRowTracking.RowIdColKey)
    val newAdd = st.active.values.head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(DeltaLog.absPath(t, newAdd.path)),
        spark.sparkContext.hadoopConfiguration))
    val names =
      try reader.getFooter.getFileMetaData.getSchema
        .getFields.asScala.map(_.getName).toSet
      finally reader.close()
    assert(names.contains(ridCol), s"materialized column in footer: $names")
    // the rewrite took FRESH base ids past the watermark (shadowed by
    // the materialized values on read) and bumped it
    assert(newAdd.baseRowId.exists(_ >= 6L), s"$newAdd")
    assert(DeltaRowTracking.highWaterMark(st) >= 10L)
    // time travel: pre-OPTIMIZE ids identical too
    assert(idsOf(t, Some(preV)) == before)
    // post-OPTIMIZE appends continue past the bumped watermark with
    // no overlap against any live id
    DeltaExport.append(Seq((100L, "n")).toDF("id", "s").coalesce(1), t)
    val now = idsOf(t)
    assert(now(100L)._1 > 10L && now.values.map(_._1).toSeq.distinct.size
      == now.size, s"$now")
  }

  test("checkpoint carries the watermark, ids and domain metadata") {
    val t = tbl()
    DeltaExport.create(
      (0L until 4L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t, Nil, rt())
    DeltaExport.deleteWhere(spark, t, col("id") === 1L)
    val before = idsOf(t)
    DeltaExport.checkpoint(spark, t)
    // the checkpoint now FEEDS stateAt (commits before it are ignored
    // when present) — watermark, baseRowIds and the DV all come back
    val st = DeltaLog.stateAt(spark, t, None)
    assert(DeltaRowTracking.highWaterMark(st) == 3L)
    assert(idsOf(t) == before)
    DeltaExport.append(Seq((50L, "n")).toDF("id", "s").coalesce(1), t)
    assert(idsOf(t)(50L) == ((4L, DeltaLog.version(spark, t))))
  }

  test("MERGE preserves ids: update keeps, insert fresh, delete never reused") {
    val t = tbl()
    DeltaExport.create(
      (0L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t, Nil, rt()) // ids 0-5 @ v0
    val before = idsOf(t)
    val v1 = DeltaMerge.merge(spark, t,
      Seq((2L, "upd"), (100L, "new")).toDF("id", "s"), Seq("id"),
      Some(DeltaMerge.UpdateAll), insertNotMatched = true).get
    val after = idsOf(t)
    // carried rows keep BOTH id and commit version through the rewrite
    (0L until 6L).filterNot(_ == 2L).foreach { k =>
      assert(after(k) == before(k), s"carried $k: ${after(k)} vs ${before(k)}")
    }
    // the updated row keeps its id; its commit version becomes the
    // merge commit's (content changed)
    assert(after(2L) == ((before(2L)._1, v1)), s"${after(2L)}")
    // the inserted row takes a FRESH id past the pre-merge watermark
    assert(after(100L)._1 > 5L && after(100L)._2 == v1, s"${after(100L)}")
    assert(after.values.map(_._1).toSeq.distinct.size == after.size)
    // the update is real, not just id bookkeeping
    assert(DeltaLog.read(spark, t).filter(col("id") === 2L)
      .select(col("s")).head().getString(0) == "upd")
    // a matched DELETE retires the id forever
    val deadId = before(3L)._1
    DeltaMerge.merge(spark, t,
      Seq((3L, "x")).toDF("id", "s"), Seq("id"),
      Some(DeltaMerge.DeleteMatched), insertNotMatched = false)
    val afterDel = idsOf(t)
    assert(!afterDel.contains(3L))
    assert(!afterDel.values.exists(_._1 == deadId))
    DeltaExport.append(Seq((200L, "n")).toDF("id", "s").coalesce(1), t)
    val last = idsOf(t)
    assert(last(200L)._1 > afterDel.values.map(_._1).max
      && last(200L)._1 != deadId, s"${last(200L)}")
  }

  test("applyChanges preserves ids through CDC-apply") {
    val t = tbl()
    DeltaExport.create(
      (0L until 4L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t, Nil, rt())
    val before = idsOf(t)
    val changes = Seq[(Long, String, String)](
      (1L, "upd", "update_postimage"), (2L, "x", "delete"),
      (40L, "new", "insert")).toDF("id", "s", "_change_type")
    val v = DeltaMerge.applyChanges(spark, t, changes, Seq("id")).get
    val after = idsOf(t)
    assert(after(1L) == ((before(1L)._1, v)), s"${after(1L)}")
    assert(after(0L) == before(0L) && after(3L) == before(3L))
    assert(!after.contains(2L))
    assert(after(40L)._1 > 3L && after(40L)._2 == v, s"${after(40L)}")
  }

  test("overwriteWhere: fresh ids for replaced partitions, untouched keep") {
    val t = tbl()
    DeltaExport.create(
      Seq((0L, "a", "p1"), (1L, "b", "p1"), (2L, "c", "p2"))
        .toDF("id", "s", "p").coalesce(1), t, Seq("p"), rt())
    val before = idsOf(t)
    val hwm0 = DeltaRowTracking.highWaterMark(DeltaLog.stateAt(spark, t, None))
    DeltaExport.overwriteWhere(
      Seq((10L, "x", "p1"), (11L, "y", "p1")).toDF("id", "s", "p")
        .coalesce(1), t, Seq("p"))
    val after = idsOf(t)
    assert(after(2L) == before(2L), "untouched partition keeps its ids")
    assert(!after.contains(0L) && !after.contains(1L))
    assert(Seq(10L, 11L).forall(k => after(k)._1 > hwm0), s"$after")
    assert(DeltaRowTracking.highWaterMark(
      DeltaLog.stateAt(spark, t, None)) > hwm0)
  }

  test("full overwrite: every row is new — all-fresh ids") {
    val t = tbl()
    DeltaExport.create(
      (0L until 3L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t, Nil, rt())
    val hwm0 = DeltaRowTracking.highWaterMark(DeltaLog.stateAt(spark, t, None))
    DeltaExport.overwrite(
      Seq((7L, "x"), (8L, "y")).toDF("id", "s").coalesce(1), t)
    val after = idsOf(t)
    assert(after.keySet == Set(7L, 8L))
    assert(after.values.forall(_._1 > hwm0), s"$after")
  }

  test("RESTORE brings back original ids; the watermark never rewinds") {
    val t = tbl()
    DeltaExport.create(
      (0L until 5L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t, Nil, rt()) // v0: ids 0-4
    val orig = idsOf(t)
    DeltaExport.deleteWhere(spark, t, col("id") === 1L) // v1
    DeltaExport.append(
      (10L until 12L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t) // v2: ids 5-6
    assert(DeltaRowTracking.highWaterMark(
      DeltaLog.stateAt(spark, t, None)) == 6L)
    DeltaExport.restore(spark, t, 0L) // v3: the v0 state again
    val after = idsOf(t)
    assert(after == orig, s"$after\nvs\n$orig")
    // the watermark did NOT rewind with the state — ids 5-6 (removed
    // by the restore) stay retired forever
    assert(DeltaRowTracking.highWaterMark(
      DeltaLog.stateAt(spark, t, None)) == 6L)
    DeltaExport.append(Seq((50L, "n")).toDF("id", "s").coalesce(1), t)
    assert(idsOf(t)(50L)._1 == 7L)
  }

  test("self-written tables read with ZERO footer probes (write-time tags)") {
    val t = tbl()
    DeltaExport.create(
      (0L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t, Nil, rt())
    DeltaExport.append(
      (10L until 13L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    DeltaExport.deleteWhere(spark, t, col("id") === 2L)
    val p0 = DeltaRowTracking.footerProbes.get()
    DeltaExport.compact(spark, t, 128L * 1024 * 1024)
    DeltaMerge.merge(spark, t,
      Seq((3L, "u"), (77L, "n")).toDF("id", "s"), Seq("id"),
      Some(DeltaMerge.UpdateAll), insertNotMatched = true)
    val ids = idsOf(t)
    assert(ids.size == 9, s"$ids")
    assert(DeltaRowTracking.footerProbes.get() == p0,
      "tagged adds must answer materialized-presence without footer reads")
    // the tag survives a checkpoint (replay source after log cleanup)
    DeltaExport.checkpoint(spark, t)
    assert(idsOf(t) == ids)
    assert(DeltaRowTracking.footerProbes.get() == p0)
  }

  test("setProperties refuses enabling row tracking after the fact") {
    val t = tbl()
    DeltaExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    val e = intercept[IllegalArgumentException](
      DeltaExport.setProperties(spark, t,
        Map("delta.enableRowTracking" -> "true")))
    assert(e.getMessage.contains("enablement"), e.getMessage)
    // a table that already HAS the feature may keep setting properties
    val t2 = tbl()
    DeltaExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1),
      t2, Nil, rt())
    DeltaExport.setProperties(spark, t2,
      Map("delta.enableRowTracking" -> "true", "graft.note" -> "x"))
    assert(DeltaLog.stateAt(spark, t2, None)
      .configuration.get("graft.note").contains("x"))
  }

  test("readRowIds refuses un-backfilled foreign files loudly") {
    val t = tbl()
    DeltaExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1),
      t, Nil, rt())
    // a foreign writer lands an add WITHOUT baseRowId (enabled-mid-life
    // table, no backfill)
    val st = DeltaLog.stateAt(spark, t, None)
    val src = Paths.get(DeltaLog.absPath(t, st.active.keys.head))
    val cp = "part-foreign.parquet"
    Files.copy(src, Paths.get(t, cp))
    DeltaExport.claim(t, 1L, Seq(
      s"""{"add":{"path":"$cp","partitionValues":{},"size":${Files.size(src)},"modificationTime":0,"dataChange":true}}""",
      """{"commitInfo":{"operation":"WRITE"}}"""))
    val e = intercept[IllegalArgumentException](
      DeltaRowTracking.readRowIds(spark, t))
    assert(e.getMessage.contains("baseRowId"), e.getMessage)
  }

  test("foreign checkpoint domain tombstones do not resurrect domains") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val t = tbl()
    DeltaExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    val st0 = DeltaLog.stateAt(spark, t, None)
    // a FOREIGN v0 checkpoint retaining a removed=true tombstone
    // (PROTOCOL.md keeps tombstones in checkpoints until expiry) —
    // replaying it as live would resurrect a stale watermark
    val ckptSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType))))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("stats", StringType)))),
      StructField("domainMetadata", StructType(Seq(
        StructField("domain", StringType),
        StructField("configuration", StringType),
        StructField("removed", BooleanType))))))
    val rows = Seq(
      Row(Row(1, 2), null, null, null),
      Row(null, Row("tid", st0.schemaJson.get, Seq.empty[String],
        Map.empty[String, String]), null, null),
      Row(null, null, Row(st0.active.keys.head,
        Map.empty[String, String], null), null),
      Row(null, null, null,
        Row("delta.rowTracking", """{"rowIdHighWaterMark":99}""", true)),
      Row(null, null, null, Row("other.live", "cfg", false)))
    val tmp = Files.createTempDirectory("ckpt_foreign")
    spark.createDataFrame(rows.asJava, ckptSchema).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val s = Files.list(tmp)
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    Files.move(part,
      Paths.get(t, "_delta_log", f"${0L}%020d.checkpoint.parquet"))
    val st = DeltaLog.stateAt(spark, t, None)
    assert(!st.domains.contains("delta.rowTracking"), s"${st.domains}")
    assert(st.domains.get("other.live").contains("cfg"), s"${st.domains}")
  }

  test("ZORDER materializes ids through the Morton re-cluster") {
    val t = tbl()
    DeltaExport.create(
      (0L until 8L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t, Nil, rt())
    DeltaExport.append(
      (20L until 24L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    DeltaExport.deleteWhere(spark, t, col("id") === 3L)
    val before = idsOf(t)
    val hwm0 = DeltaRowTracking.highWaterMark(DeltaLog.stateAt(spark, t, None))
    val p0 = DeltaRowTracking.footerProbes.get()
    DeltaExport.zorder(spark, t, "id", "id", 2)
    val after = idsOf(t)
    assert(after == before,
      s"ids AND commit versions survive ZORDER:\n$after\nvs\n$before")
    // fresh base ids past the watermark (shadowed by materialization)
    assert(DeltaRowTracking.highWaterMark(
      DeltaLog.stateAt(spark, t, None)) > hwm0)
    assert(DeltaRowTracking.footerProbes.get() == p0,
      "the zorder adds carry the materialized tag — no probes")
  }

  test("SHALLOW CLONE carries ids and the watermark") {
    val t = tbl()
    DeltaExport.create(
      (0L until 5L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t, Nil, rt())
    DeltaExport.deleteWhere(spark, t, col("id") === 2L)
    val src = idsOf(t)
    val c = tbl()
    DeltaExport.shallowClone(spark, t, c)
    assert(idsOf(c) == src, "the clone reads the source's exact ids")
    // the domain carried: the clone's first append takes FRESH ids
    DeltaExport.append(Seq((50L, "n")).toDF("id", "s").coalesce(1), c)
    val cloneIds = idsOf(c)
    assert(cloneIds(50L)._1 == 5L,
      s"clone append must continue past the cloned watermark: $cloneIds")
    assert(cloneIds.values.map(_._1).toSeq.distinct.size == cloneIds.size)
    // the source is untouched by the clone's append
    assert(idsOf(t) == src)
  }

  test("appendBatch assigns ids exactly once (replays burn nothing)") {
    val t = tbl()
    DeltaExport.create(
      (0L until 3L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t, Nil, rt())
    val v = DeltaExport.appendBatch(
      Seq((10L, "a"), (11L, "b")).toDF("id", "s").coalesce(1),
      t, "app", 1L)
    assert(v.nonEmpty)
    val after = idsOf(t)
    assert(after(10L)._1 >= 3L && after(11L)._1 >= 3L, s"$after")
    val hwm = DeltaRowTracking.highWaterMark(DeltaLog.stateAt(spark, t, None))
    // at-least-once redelivery: the replay commits NOTHING — no new
    // version, no watermark movement, no id burn
    assert(DeltaExport.appendBatch(
      Seq((10L, "a"), (11L, "b")).toDF("id", "s").coalesce(1),
      t, "app", 1L).isEmpty)
    assert(DeltaRowTracking.highWaterMark(
      DeltaLog.stateAt(spark, t, None)) == hwm)
    assert(idsOf(t) == after)
  }

  test("readRowIds refuses tables without the feature") {
    val plain = tbl()
    DeltaExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), plain)
    val e = intercept[IllegalArgumentException] {
      DeltaRowTracking.readRowIds(spark, plain)
    }
    assert(e.getMessage.contains("row tracking"), e.getMessage)
  }
}
