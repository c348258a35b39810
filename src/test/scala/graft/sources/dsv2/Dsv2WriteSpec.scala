package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{DeltaExport, DeltaLog, IcebergExport, IcebergTable}
import org.apache.spark.sql.functions._

/** The DSv2 WRITE path (`df.write.format("graft-delta"/"graft-iceberg")
  * .mode(...).save(path)`) — the V1Write fallback delegating to the
  * existing transactional writers, so the plain-Spark write surface
  * carries the same commit semantics as the bespoke API:
  *  - append commits a new version (Delta) / snapshot (Iceberg),
  *    readable by both the bespoke and DSv2 readers, time travel
  *    intact;
  *  - overwrite replaces the content transactionally;
  *  - a partitioned Delta table keeps its hive staging + partition
  *    values through the DSv2 append;
  *  - partitioned Iceberg overwrite refuses (spec preservation).
  */
class Dsv2WriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def df(ids: Range) =
    ids.map(i => (i.toLong, i % 5, s"v$i")).toDF("id", "grp", "name")

  test("delta DSv2 append and overwrite carry full commit semantics") {
    val t = tmp("dsv2_w_delta")
    DeltaExport.create(df(0 until 10).coalesce(1), t)
    df(10 until 15).coalesce(1)
      .write.format("graft-delta").mode("append").save(t)
    assert(DeltaLog.read(spark, t).count() == 15L)
    assert(DeltaLog.version(spark, t) == 1L)
    df(100 until 103).coalesce(1)
      .write.format("graft-delta").mode("overwrite").save(t)
    assert(spark.read.format("graft-delta").load(t)
      .collect().map(_.getLong(0)).toSet == (100L until 103L).toSet)
    // time travel still sees the appended state
    assert(DeltaLog.read(spark, t, Some(1L)).count() == 15L)
    // columns arrive REORDERED: Spark resolves by name against the
    // table schema before insert
    Seq((1, "x", 200L)).toDF("grp", "name", "id")
      .write.format("graft-delta").mode("append").save(t)
    val got = DeltaLog.read(spark, t).filter(col("id") === 200L).collect()
    assert(got.length == 1 && got(0).getAs[Int]("grp") == 1 &&
      got(0).getAs[String]("name") == "x")
  }

  test("partitioned delta table: DSv2 append stages hive partitions") {
    val t = tmp("dsv2_w_delta_part")
    DeltaExport.create(df(0 until 10), t, partitionBy = Seq("grp"))
    df(10 until 20).write.format("graft-delta").mode("append").save(t)
    val all = spark.read.format("graft-delta").load(t)
    assert(all.count() == 20L)
    assert(all.filter(col("grp") === 2).collect()
      .map(_.getAs[Long]("id")).toSet ==
      (0L until 20L).filter(_ % 5 == 2).toSet)
  }

  test("iceberg DSv2 append and overwrite; partitioned overwrite keeps the spec") {
    val t = tmp("dsv2_w_ice")
    IcebergExport.create(df(0 until 10).coalesce(1), t)
    df(10 until 15).coalesce(1)
      .write.format("graft-iceberg").mode("append").save(t)
    assert(IcebergTable.read(spark, t).count() == 15L)
    df(100 until 104).coalesce(1)
      .write.format("graft-iceberg").mode("overwrite").save(t)
    assert(spark.read.format("graft-iceberg").load(t)
      .collect().map(_.getLong(0)).toSet == (100L until 104L).toSet)

    // PARTITIONED overwrite (r17): replaceTable with the EXPLICIT
    // current spec — the relaid table keeps identity partitioning
    val tp = tmp("dsv2_w_ice_part")
    IcebergExport.create(df(0 until 10), tp, partitionBy = Seq("grp"))
    df(20 until 26).write.format("graft-iceberg").mode("overwrite").save(tp)
    assert(IcebergTable.read(spark, tp)
      .collect().map(_.getLong(0)).toSet == (20L until 26L).toSet)
    assert(IcebergExport.currentSpecOf(tp) == Seq(("identity", "grp")),
      "overwrite must preserve the partition spec explicitly")
    // identity values still reconstruct from partition metadata
    assert(IcebergTable.read(spark, tp).filter(col("grp") === 2)
      .collect().map(_.getLong(0)).toSet ==
      (20L until 26L).filter(_ % 5 == 2).toSet)
  }

  test("delta overwrite-by-filter (REPLACE WHERE): untouched files byte-identical") {
    val t = tmp("dsv2_w_replwhere")
    // two partitions, one file each
    DeltaExport.create(df(0 until 10), t, partitionBy = Seq("grp"))
    val filesBefore = DeltaLog.activeFiles(spark, t)
      .collect().map(_.getString(0)).toSet
    val untouched = filesBefore.filterNot(_.contains("grp=2"))
    // SQL INSERT REPLACE WHERE through the catalog
    spark.conf.set(
      "spark.sql.catalog.graft", "graft.sources.dsv2.GraftCatalog")
    Seq((200L, 2, "r200"), (201L, 2, "r201")).toDF("id", "grp", "name")
      .createOrReplaceTempView("rw_src")
    spark.sql(
      s"""INSERT INTO graft.delta.`$t` REPLACE WHERE grp = 2
          SELECT * FROM rw_src""")
    val after = spark.read.format("graft-delta").load(t)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("grp"))).toSet
    val expect = (0L until 10L).filter(_ % 5 != 2).map(i =>
      (i, (i % 5).toInt)).toSet ++ Set((200L, 2), (201L, 2))
    assert(after == expect, after.toString)
    // files of other partitions are EXACTLY the same paths (untouched)
    val filesAfter = DeltaLog.activeFiles(spark, t)
      .collect().map(_.getString(0)).toSet
    assert(untouched.subsetOf(filesAfter),
      "non-matching partitions' files must carry unchanged")
    // rows outside the replaced region refuse
    Seq((300L, 3, "bad")).toDF("id", "grp", "name")
      .createOrReplaceTempView("rw_bad")
    val e = intercept[Exception] {
      spark.sql(
        s"""INSERT INTO graft.delta.`$t` REPLACE WHERE grp = 2
            SELECT * FROM rw_bad""")
    }
    def msgs(x: Throwable): String =
      if (x == null) "" else Option(x.getMessage).getOrElse("") + msgs(x.getCause)
    assert(msgs(e).contains("NOT matching"), msgs(e))
  }

  test("dynamic partition overwrite: loud refusal; REPLACE WHERE expresses it") {
    val t = tmp("dsv2_w_dynpart")
    spark.conf.set(
      "spark.sql.catalog.graft", "graft.sources.dsv2.GraftCatalog")
    DeltaExport.create(df(0 until 10), t, partitionBy = Seq("grp"))
    // Spark's OverwritePartitionsDynamicExec has no V1 fallback: the
    // capability is not declared, so the check fails LOUDLY up front
    val e = intercept[Exception] {
      Seq((500L, 1, "d500")).toDF("id", "grp", "name")
        .writeTo(s"graft.delta.`$t`").overwritePartitions()
    }
    assert(e.getMessage.contains("dynamic overwrite"), e.getMessage)
    // the same replacement through REPLACE WHERE on the partition key
    Seq((500L, 1, "d500")).toDF("id", "grp", "name")
      .createOrReplaceTempView("dyn_src")
    spark.sql(
      s"""INSERT INTO graft.delta.`$t` REPLACE WHERE grp = 1
          SELECT * FROM dyn_src""")
    val after = spark.read.format("graft-delta").load(t)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("grp"))).toSet
    val expect = (0L until 10L).filter(_ % 5 != 1).map(i =>
      (i, (i % 5).toInt)).toSet + ((500L, 1))
    assert(after == expect, after.toString)
    // and the bespoke dynamic-partition writer covers the API form
    val t2 = tmp("dsv2_w_dynpart2")
    DeltaExport.create(df(0 until 10), t2, partitionBy = Seq("grp"))
    DeltaExport.overwriteWhere(
      Seq((500L, 1, "d500")).toDF("id", "grp", "name"), t2, Seq("grp"))
    assert(spark.read.format("graft-delta").load(t2)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("grp")))
      .toSet == expect)
  }
}
