package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iceberg REPLACE TABLE (r15): one commit swaps content AND
  * definition — fresh field ids (never reused), fresh default spec,
  * a `replace` snapshot holding only the new manifests — while old
  * snapshots stay time-travelable under their own schemas and the
  * table-uuid is unchanged (Iceberg's replace keeps table identity).
  */
class IcebergReplaceSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("iceberg_replace_").resolve("t").toString

  test("replace swaps schema, spec and content; history survives") {
    val t = tbl()
    val s1 = IcebergExport.create(
      Seq((1L, "us"), (2L, "de")).toDF("id", "region").coalesce(1),
      t, partitionBy = Seq("region"))
    val meta0 = IcebergTable.metadataJson(t)
    val uuid0 = meta0.get("table-uuid").asText()
    val lastCol0 = meta0.get("last-column-id").asInt()
    IcebergExport.replaceTable(
      Seq((10L, "a", 1.5), (20L, "b", 2.5)).toDF("k", "name", "score")
        .coalesce(1), t)
    val meta = IcebergTable.metadataJson(t)
    assert(meta.get("table-uuid").asText() == uuid0,
      "Iceberg REPLACE keeps the table identity")
    // field ids continued past the old last-column-id — never reused
    assert(meta.get("last-column-id").asInt() > lastCol0)
    val got = IcebergTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((10L, "a", 1.5), (20L, "b", 2.5)), s"$got")
    // time travel reads the OLD definition's rows under the old schema
    val old = IcebergTable.read(spark, t, Some(s1))
    assert(old.columns.toSeq == Seq("id", "region"))
    assert(old.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "us"), (2L, "de")))
    // the table keeps working: append under the new definition
    IcebergExport.append(
      Seq((30L, "c", 3.5)).toDF("k", "name", "score").coalesce(1), t)
    assert(IcebergTable.read(spark, t).count() == 3L)
    // replace again, back to a partitioned shape — spec ids advance
    IcebergExport.replaceTable(
      Seq((5L, "x", "p1")).toDF("id", "s", "p").coalesce(1), t,
      spec = Seq(("identity", "p")))
    assert(IcebergTable.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).toSet == Set(5L))
    assert(IcebergTable.metadataJson(t).get("default-spec-id").asInt() >= 2)
  }

  test("a racing commit aborts the replace with nothing committed") {
    val t = tbl()
    IcebergExport.create(
      Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    intercept[java.util.ConcurrentModificationException] {
      IcebergExport.replaceTable(
        Seq((9L, "z", 0.0)).toDF("k", "name", "score"), t, Nil,
        () => {
          IcebergExport.append(
            Seq((2L, "b")).toDF("id", "s").coalesce(1), t)
          ()
        })
    }
    // the loser committed nothing: both pre-race rows intact
    assert(IcebergTable.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("v3 replace assigns fresh row ids past the watermark") {
    val t = tbl()
    IcebergExport.createV3(
      (0L until 5L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    assert(IcebergTable.metadataJson(t).get("next-row-id").asLong() == 5L)
    IcebergExport.replaceTable(
      Seq((100L, "n1"), (101L, "n2")).toDF("id", "s").coalesce(1), t)
    val meta = IcebergTable.metadataJson(t)
    assert(meta.get("next-row-id").asLong() == 7L,
      "replacement rows continue the id space, never reuse")
    val lin = IcebergTable.readLineage(spark, t)
      .select(col("id"), col("_row_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lin == Map(100L -> 5L, 101L -> 6L), s"$lin")
  }
}
