package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{DeltaExport, DeltaLog, IcebergExport, IcebergTable}
import org.apache.spark.sql.functions._

/** SQL DML over the lakehouse catalog (r17): DELETE FROM / UPDATE /
  * MERGE INTO against `graft.delta.`p`` / `graft.iceberg.`p``.
  * DELETE with Filter-algebra predicates works in a PLAIN session
  * (SupportsDeleteV2 on the tables); everything else through the
  * [[GraftDmlRule]] analyzer rewrite, delegating to the
  * engine's existing transactional writers (the analyzer rule is
  * injected session-wide through spark.sql.extensions =
  * graft.plans.GraftExtensions in SparkSpec — the delta-spark
  * registration pattern). The simple-predicate DELETE is served by
  * Spark's own DeleteFromTableExec via SupportsDeleteV2, extension or
  * not; the rule only intercepts conditions outside the Filter
  * algebra.
  */
class GraftDmlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def cat(): Unit =
    spark.conf.set(
      "spark.sql.catalog.graft", "graft.sources.dsv2.GraftCatalog")

  private def rows(n: Int) =
    (0 until n).map(i => (i.toLong, i % 7, s"name_$i"))
      .toDF("id", "grp", "name")

  test("DELETE FROM with a simple predicate rides Spark's SupportsDelete path") {
    cat()
    val t = tmp("dml_del_plain")
    DeltaExport.create(rows(100).coalesce(1), t)
    spark.sql(s"DELETE FROM graft.delta.`$t` WHERE id >= 90")
    val got = DeltaLog.read(spark, t).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == (0L until 90L).toSet)
    // metadata-only: the original file is still the only data file,
    // now DV'd
    assert(DeltaLog.version(spark, t) == 1L)
  }

  test("DELETE FROM with a non-Filter condition routes through the DML rule") {
    cat()
    val t = tmp("dml_del_mod")
    DeltaExport.create(rows(100).coalesce(1), t)
    spark.sql(s"DELETE FROM graft.delta.`$t` WHERE id % 10 = 3")
    val got = DeltaLog.read(spark, t).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == (0L until 100L).filter(_ % 10 != 3).toSet)
  }

  test("UPDATE applies assignments in ONE commit via deletion vectors") {
    cat()
    val t = tmp("dml_update")
    DeltaExport.create(rows(100).coalesce(1), t)
    val v0 = DeltaLog.version(spark, t)
    spark.sql(
      s"""UPDATE graft.delta.`$t`
          SET name = concat('U:', name), grp = grp + 10
          WHERE id % 4 = 1""")
    assert(DeltaLog.version(spark, t) == v0 + 1L, "one commit")
    val got = DeltaLog.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val expect = (0 until 100).map { i =>
      if (i % 4 == 1) (i.toLong, i % 7 + 10, s"U:name_$i")
      else (i.toLong, i % 7, s"name_$i")
    }.toSet
    assert(got == expect)
    // unmatched rows of the touched file were NOT rewritten twice:
    // row count is exact (no duplicates from the DV + append pair)
    assert(DeltaLog.read(spark, t).count() == 100L)
  }

  test("MERGE INTO delta: UPDATE SET * + INSERT *, then matched DELETE") {
    cat()
    val t = tmp("dml_merge_delta")
    DeltaExport.create(rows(100).repartition(2, col("id")), t)
    rows(100).filter(col("id") % 4 === 1)
      .withColumn("name", concat(lit("U:"), col("name")))
      .unionByName(rows(100).filter(col("id") % 50 === 0)
        .select((col("id") + 1000L).as("id"), col("grp"),
          concat(lit("N:"), col("name")).as("name")))
      .createOrReplaceTempView("dml_src1")
    spark.sql(
      s"""MERGE INTO graft.delta.`$t` AS t USING dml_src1 AS s
          ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    rows(100).filter(col("id") % 10 === 5).createOrReplaceTempView("dml_src2")
    spark.sql(
      s"""MERGE INTO graft.delta.`$t` AS t USING dml_src2 AS s
          ON t.id = s.id
          WHEN MATCHED THEN DELETE""")
    val got = DeltaLog.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val afterUpsert = (0 until 100).map(i =>
      (i.toLong, if (i % 4 == 1) s"U:name_$i" else s"name_$i")) ++
      (0 until 100).filter(_ % 50 == 0).map(i =>
        (i + 1000L, s"N:name_$i"))
    val expect = afterUpsert.filterNot(_._1 % 10 == 5).toSet
    assert(got == expect, s"got ${got.size} vs expect ${expect.size}")
  }

  test("MERGE INTO iceberg: blind upsert and equality delete") {
    cat()
    val t = tmp("dml_merge_ice")
    IcebergExport.create(rows(100).repartition(2, col("id")), t)
    rows(100).filter(col("id") % 4 === 1)
      .withColumn("name", concat(lit("U:"), col("name")))
      .createOrReplaceTempView("dml_ice_src1")
    spark.sql(
      s"""MERGE INTO graft.iceberg.`$t` AS t USING dml_ice_src1 AS s
          ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    rows(100).filter(col("id") % 10 === 5)
      .createOrReplaceTempView("dml_ice_src2")
    spark.sql(
      s"""MERGE INTO graft.iceberg.`$t` AS t USING dml_ice_src2 AS s
          ON t.id = s.id
          WHEN MATCHED THEN DELETE""")
    val got = IcebergTable.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val expect = (0 until 100).map(i =>
      (i.toLong, if (i % 4 == 1) s"U:name_$i" else s"name_$i"))
      .filterNot(_._1 % 10 == 5).toSet
    assert(got == expect)
    // and DELETE FROM through the same SQL surface
    spark.sql(s"DELETE FROM graft.iceberg.`$t` WHERE id < 10")
    assert(!IcebergTable.read(spark, t).collect()
      .exists(_.getLong(0) < 10L))
  }

  test("unsupported shapes refuse loudly, naming the writer API") {
    cat()
    val t = tmp("dml_refuse")
    IcebergExport.create(rows(10).coalesce(1), t)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.iceberg.`$t` SET name = 'x' WHERE id = 1")
    }
    def msgs(x: Throwable): String =
      if (x == null) "" else Option(x.getMessage).getOrElse("") + msgs(x.getCause)
    assert(msgs(e).contains("mergeUpsert"), msgs(e))

    val td = tmp("dml_refuse_delta")
    DeltaExport.create(rows(10).coalesce(1), td, Nil,
      Map("delta.enableChangeDataFeed" -> "true"))
    val e2 = intercept[Exception] {
      spark.sql(s"UPDATE graft.delta.`$td` SET name = 'x' WHERE id = 1")
    }
    assert(msgs(e2).contains("DeltaMerge"), msgs(e2))
  }
}
