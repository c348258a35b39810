package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VARIANT columns — both formats' 2026 interop frontier (r15
  * verdict #5): Delta's `variantType` reader+writer feature and
  * Iceberg v3's `variant` type, carried as the OPEN variant binary
  * encoding (metadata dictionary + value) that Spark's native
  * `VariantType` reads and writes. Pinned here:
  *  - Delta roundtrip: `parse_json` → create (protocol declares the
  *    feature both sides) → read (bespoke AND DSv2) → `variant_get`
  *    extraction equal to extracting from the original JSON strings;
  *  - SHREDDED tables refuse loudly (`variantShredding-preview`
  *    stays on the refusal list — reading a shredded file's null
  *    `value` as the value would be wrong rows);
  *  - Iceberg v3 roundtrip through the `variant` schema type.
  */
class VariantSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  private def jsonRows = Seq(
    (1L, """{"k":10,"tag":"a"}"""),
    (2L, """{"k":20,"tag":"b"}"""),
    (3L, """{"k":null,"tag":"c"}"""),
    (4L, """{"tag":"d"}"""),
    (5L, """{"k":50,"nested":{"x":1}}""")).toDF("id", "js")

  test("delta variant roundtrip: parse_json -> create -> variant_get") {
    val t = tmp("var_delta")
    DeltaExport.create(
      jsonRows.select(col("id"), parse_json(col("js")).as("payload"))
        .coalesce(1), t)
    val st = DeltaLog.stateAt(spark, t, None)
    assert(st.minReader == 3 && st.readerFeatures == Set("variantType"))
    assert(st.writerFeatures.contains("variantType"))
    val expected = jsonRows.select(col("id"),
      get_json_object(col("js"), "$.k").cast("long").as("k"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      assert(df.schema("payload").dataType ==
        org.apache.spark.sql.types.VariantType)
      val got = df.select(col("id"),
        variant_get(col("payload"), "$.k", "long").as("k"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getLong(1))).toMap
      assert(got == expected, s"got $got")
    }
    check(DeltaLog.read(spark, t))
    check(spark.read.format("graft-delta").load(t))
    // nested path extraction too
    val nested = DeltaLog.read(spark, t)
      .select(variant_get(col("payload"), "$.nested.x", "long"))
      .collect().flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(nested.toSeq == Seq(1L))
  }

  test("shredded variant tables refuse loudly") {
    val t = Files.createTempDirectory("var_shred")
    val dir = t.resolve("_delta_log")
    Files.createDirectories(dir)
    Files.write(dir.resolve(f"${0L}%020d.json"), Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["variantType","variantShredding-preview"],"writerFeatures":["variantType","variantShredding-preview"]}}""",
      s"""{"metaData":{"id":"shred-fixture","format":{"provider":"parquet","options":{}},"schemaString":"{\\"type\\":\\"struct\\",\\"fields\\":[]}","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}"""
    ).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] {
      DeltaLog.read(spark, t.toString)
    }
    assert(e.getMessage.contains("variantShredding-preview"), e.getMessage)
  }

  test("iceberg v3 variant roundtrip") {
    val t = tmp("var_ice")
    IcebergExport.createV3(
      jsonRows.select(col("id"), parse_json(col("js")).as("payload"))
        .coalesce(1), t)
    val meta = IcebergTable.metadataJson(t)
    assert(meta.get("format-version").asInt() == 3)
    val df = IcebergTable.read(spark, t)
    assert(df.schema("payload").dataType ==
      org.apache.spark.sql.types.VariantType)
    val got = df.select(col("id"),
      variant_get(col("payload"), "$.tag", "string").as("tag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> null))
  }
}
