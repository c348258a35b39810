package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{DeltaExport, DeltaLog, IcebergExport, IcebergTable}
import org.apache.spark.sql.functions._

/** The DataSourceV2 read path: `spark.read.format("graft-delta")` /
  * `format("graft-iceberg")` must (a) return exactly the rows the
  * bespoke readers return — deletion vectors, position deletes,
  * equality deletes and partition reconstruction included — and
  * (b) PRUNE at the file level from planner-pushed filters, asserted
  * through the [[Dsv2Planning]] file counter (the "a plain
  * spark.read user gets the skipping" contract).
  */
class Dsv2ReadSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows100 =
    (0 until 100).map(i => (i.toLong, i % 7, s"name_$i"))
      .toDF("id", "grp", "name")

  // ----------------------------------------------------------------- delta

  test("graft-delta reads what DeltaLog.read reads (DV delete applied)") {
    val t = tmp("dsv2_delta")
    DeltaExport.create(
      rows100.repartitionByRange(4, col("id")).sortWithinPartitions("id"), t)
    DeltaExport.deleteWhere(spark, t, col("id") % 10 === 3)
    val bespoke = DeltaLog.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val dsv2 = spark.read.format("graft-delta").load(t)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(dsv2 == bespoke)
    assert(dsv2.size == 90 && !dsv2.exists(_._1 == 3L))
  }

  test("pushed filter prunes files via add.stats; rows still exact") {
    val t = tmp("dsv2_delta_prune")
    // 4 range-disjoint files: id ∈ [0,25) [25,50) [50,75) [75,100)
    DeltaExport.create(
      rows100.repartitionByRange(4, col("id")).sortWithinPartitions("id"), t)
    val got = spark.read.format("graft-delta").load(t)
      .filter(col("id") >= 80L)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == (80L until 100L).toSet)
    val Some((planned, total)) = Dsv2Planning.plannedFor(t)
    assert(total == 4, s"expected 4 data files, saw $total")
    assert(planned == 1,
      s"id >= 80 must prune to the one matching file, planned $planned")
    // the pushed filters surface in the scan's explain description
    val plan = spark.read.format("graft-delta").load(t)
      .filter(col("id") >= 80L).queryExecution.executedPlan.toString
    assert(plan.contains("graft-delta"), plan)
  }

  test("column pruning reaches the scan (select two of three)") {
    val t = tmp("dsv2_delta_cols")
    DeltaExport.create(rows100.coalesce(1), t)
    val df = spark.read.format("graft-delta").load(t).select("name", "id")
    assert(df.columns.toSeq == Seq("name", "id"))
    assert(df.collect().map(_.getLong(1)).toSet == (0L until 100L).toSet)
    // empty projection (pure count) still works
    assert(spark.read.format("graft-delta").load(t).count() == 100L)
  }

  test("partitioned delta table: values reconstructed, partition filter prunes") {
    val t = tmp("dsv2_delta_part")
    DeltaExport.create(rows100, t, partitionBy = Seq("grp"))
    val all = spark.read.format("graft-delta").load(t)
    assert(all.schema.fieldNames.toSet == Set("id", "grp", "name"))
    val bespoke = DeltaLog.read(spark, t)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("grp"))).toSet
    assert(all.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("grp"))).toSet == bespoke)
    val one = spark.read.format("graft-delta").load(t)
      .filter(col("grp") === 2)
    assert(one.collect().map(_.getAs[Long]("id")).toSet ==
      (0L until 100L).filter(_ % 7 == 2).toSet)
    val Some((planned, total)) = Dsv2Planning.plannedFor(t)
    assert(total >= 7 && planned < total,
      s"partition filter must prune ($planned/$total)")
  }

  test("versionAsOf option time travels") {
    val t = tmp("dsv2_delta_tt")
    DeltaExport.create(rows100.coalesce(1), t)
    DeltaExport.deleteWhere(spark, t, col("id") < 50L)
    assert(spark.read.format("graft-delta")
      .option("versionAsOf", "0").load(t).count() == 100L)
    assert(spark.read.format("graft-delta").load(t).count() == 50L)
  }

  test("column-mapped tables are refused toward the bespoke reader") {
    // minimal hand-authored name-mode table (delta-spark's rename
    // output shape): the gate must fire before any data read
    val t = Files.createTempDirectory("dsv2_delta_cm")
    val dir = t.resolve("_delta_log")
    Files.createDirectories(dir)
    val fieldMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("delta.columnMapping.id", 1L)
      .putString("delta.columnMapping.physicalName", "col-xy")
      .build()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "id", org.apache.spark.sql.types.LongType, nullable = true,
        fieldMeta)))
    val ss = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    Files.write(dir.resolve(f"${0L}%020d.json"), Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"cm-dsv2","format":{"provider":"parquet","options":{}},"schemaString":"$ss","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"1"},"createdTime":1700000000000}}"""
    ).mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-delta").load(t.toString).collect()
    }
    assert(e.getMessage.contains("DeltaLog.read"), e.getMessage)
  }

  // --------------------------------------------------------------- iceberg

  test("graft-iceberg reads what IcebergTable.read reads (pos + eq deletes)") {
    val t = tmp("dsv2_iceberg")
    IcebergExport.create(
      rows100.repartitionByRange(4, col("id")).sortWithinPartitions("id"), t)
    IcebergExport.deleteWhere(spark, t, col("id") % 5 === 0)
    IcebergExport.deleteWhereEquality(
      spark, t, Seq(1, 3).map(g => Tuple1(g)).toDF("grp"))
    val bespoke = IcebergTable.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val dsv2 = spark.read.format("graft-iceberg").load(t)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(dsv2 == bespoke)
    assert(!dsv2.exists(_._1 % 5 == 0) && !dsv2.exists(r =>
      r._2 == 1 || r._2 == 3))
    assert(dsv2.nonEmpty)
  }

  test("iceberg manifest bounds prune files from a pushed filter") {
    val t = tmp("dsv2_iceberg_prune")
    IcebergExport.create(
      rows100.repartitionByRange(4, col("id")).sortWithinPartitions("id"), t)
    val got = spark.read.format("graft-iceberg").load(t)
      .filter(col("id") < 20L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == (0L until 20L).toSet)
    val Some((planned, total)) = Dsv2Planning.plannedFor(t)
    assert(total == 4 && planned == 1, s"$planned/$total")
  }

  test("identity-partitioned iceberg: values attach from metadata, filter prunes") {
    val t = tmp("dsv2_iceberg_idpart")
    IcebergExport.create(rows100, t, partitionBy = Seq("grp"))
    val bespoke = IcebergTable.read(spark, t)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("grp"))).toSet
    val dsv2 = spark.read.format("graft-iceberg").load(t)
    assert(dsv2.schema.fieldNames.toSet == Set("id", "grp", "name"))
    assert(dsv2.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("grp"))).toSet == bespoke)
    val one = spark.read.format("graft-iceberg").load(t)
      .filter(col("grp") === 4)
    assert(one.collect().map(_.getAs[Long]("id")).toSet ==
      (0L until 100L).filter(_ % 7 == 4).toSet)
    val Some((planned, total)) = Dsv2Planning.plannedFor(t)
    assert(total >= 7 && planned < total,
      s"identity-partition filter must prune ($planned/$total)")
  }

  test("iceberg snapshotId option time travels; eq deletes stay seq-scoped") {
    val t = tmp("dsv2_iceberg_tt")
    IcebergExport.create(rows100.coalesce(1), t)
    val snaps0 = IcebergTable.snapshotIds(t)
    IcebergExport.deleteWhereEquality(
      spark, t, Seq(Tuple1(0)).toDF("grp"))
    // rows APPENDED after the delete carry a higher sequence number:
    // the old equality delete must NOT touch them
    IcebergExport.append(
      Seq((1000L, 0, "post_delete")).toDF("id", "grp", "name"), t)
    val cur = spark.read.format("graft-iceberg").load(t)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cur.contains((1000L, 0)), "post-delete append must survive")
    assert(!cur.exists(r => r._2 == 0 && r._1 != 1000L))
    val asOf = spark.read.format("graft-iceberg")
      .option("snapshotId", snaps0.head.toString).load(t)
    assert(asOf.count() == 100L)
    val sameAsBespoke = IcebergTable.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cur == sameAsBespoke)
  }
}
