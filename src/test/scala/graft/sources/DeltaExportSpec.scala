package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Delta writer must produce logs the from-scratch reader (and,
  * by protocol, any v1 Delta reader) replays exactly: create →
  * read-back equality with partition reconstruction, append → next
  * version with only the new files, time travel across the append
  * boundary, and contending appends claiming distinct versions.
  */
class DeltaExportSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String)] =
    df.select(col("id"), col("payload"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq.sortBy(_._1)

  test("create then read back: schema, rows and partition values round-trip") {
    val table = Files.createTempDirectory("delta_rt").toString
    Files.delete(Paths.get(table))
    val df = Seq(
      (1L, "a", "en"), (2L, "b", "en"), (3L, "c", "fr"))
      .toDF("id", "payload", "lang")
    DeltaExport.create(df, table, partitionBy = Seq("lang"))
    val back = DeltaLog.read(spark, table)
    assert(back.schema.fieldNames.toSeq == Seq("id", "payload", "lang"))
    assert(rows(back) == Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "fr")))
    assert(DeltaLog.version(spark, table) == 0L)
  }

  test("append commits the next version; time travel sees the pre-append snapshot") {
    val table = Files.createTempDirectory("delta_ap").toString
    Files.delete(Paths.get(table))
    DeltaExport.create(
      Seq((1L, "a", "en")).toDF("id", "payload", "lang"),
      table, partitionBy = Seq("lang"))
    val v = DeltaExport.append(
      Seq((2L, "b", "fr"), (3L, "c", "en")).toDF("id", "payload", "lang"),
      table, partitionBy = Seq("lang"))
    assert(v == 1L)
    assert(rows(DeltaLog.read(spark, table)) ==
      Seq((1L, "a", "en"), (2L, "b", "fr"), (3L, "c", "en")))
    assert(rows(DeltaLog.read(spark, table, Some(0L))) == Seq((1L, "a", "en")))
  }

  test("unpartitioned tables round-trip too") {
    val table = Files.createTempDirectory("delta_np").toString
    Files.delete(Paths.get(table))
    DeltaExport.create(Seq((1L, "x"), (2L, "y")).toDF("id", "payload"), table)
    val back = DeltaLog.read(spark, table)
    assert(back.schema.fieldNames.toSeq == Seq("id", "payload"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq.sortBy(_._1) == Seq((1L, "x"), (2L, "y")))
  }

  test("create refuses a table that already has a log") {
    val table = Files.createTempDirectory("delta_dup").toString
    Files.delete(Paths.get(table))
    DeltaExport.create(Seq((1L, "a")).toDF("id", "payload"), table)
    val ex = intercept[IllegalArgumentException] {
      DeltaExport.create(Seq((2L, "b")).toDF("id", "payload"), table)
    }
    assert(ex.getMessage.contains("already has a Delta log"))
  }

  test("two contending appends claim distinct versions and lose no rows") {
    val table = Files.createTempDirectory("delta_cc").toString
    Files.delete(Paths.get(table))
    DeltaExport.create(Seq((1L, "a")).toDF("id", "payload"), table)
    val dfs = Seq(
      Seq((2L, "b")).toDF("id", "payload"),
      Seq((3L, "c")).toDF("id", "payload"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val vs = Await.result(
      Future.sequence(dfs.map(d => Future(DeltaExport.append(d, table)))),
      2.minutes).toVector
    assert(vs.sorted == Vector(1L, 2L), s"contenders must split versions: $vs")
    assert(DeltaLog.read(spark, table).collect()
      .map(r => r.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
