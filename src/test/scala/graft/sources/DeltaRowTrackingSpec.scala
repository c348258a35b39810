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

  test("unsupported writers refuse row-tracking tables loudly") {
    val t = tbl()
    DeltaExport.create(
      (0L until 3L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      t, Nil, rt())
    def refused(f: => Any): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("row-tracking"), e.getMessage)
    }
    refused(DeltaExport.overwrite(
      Seq((9L, "o")).toDF("id", "s").coalesce(1), t))
    refused(DeltaExport.zorder(spark, t, "id", "id", 2))
    refused(DeltaExport.restore(spark, t, 0L))
    refused(DeltaExport.shallowClone(spark, t, tbl()))
    refused(DeltaExport.appendBatch(
      Seq((9L, "o")).toDF("id", "s").coalesce(1), t, "app", 1L))
    refused(DeltaMerge.merge(spark, t,
      Seq((1L, "u")).toDF("id", "s"), Seq("id"),
      Some(DeltaMerge.UpdateAll), insertNotMatched = false))
    // readRowIds refuses tables WITHOUT the feature
    val plain = tbl()
    DeltaExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), plain)
    val e = intercept[IllegalArgumentException] {
      DeltaRowTracking.readRowIds(spark, plain)
    }
    assert(e.getMessage.contains("row tracking"), e.getMessage)
  }
}
