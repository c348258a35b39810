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

  test("iceberg DSv2 append and unpartitioned overwrite; partitioned refusal") {
    val t = tmp("dsv2_w_ice")
    IcebergExport.create(df(0 until 10).coalesce(1), t)
    df(10 until 15).coalesce(1)
      .write.format("graft-iceberg").mode("append").save(t)
    assert(IcebergTable.read(spark, t).count() == 15L)
    df(100 until 104).coalesce(1)
      .write.format("graft-iceberg").mode("overwrite").save(t)
    assert(spark.read.format("graft-iceberg").load(t)
      .collect().map(_.getLong(0)).toSet == (100L until 104L).toSet)

    val tp = tmp("dsv2_w_ice_part")
    IcebergExport.create(df(0 until 10), tp, partitionBy = Seq("grp"))
    val e = intercept[Exception] {
      df(0 until 3).write.format("graft-iceberg").mode("overwrite").save(tp)
    }
    def chain(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: chain(x.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(c => Option(c.getMessage)
        .exists(_.contains("UNPARTITIONED"))), e.toString)
  }
}
