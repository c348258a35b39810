package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VARIANT columns — both formats' 2026 interop frontier (r15
  * verdict #5): Delta's `variantType` reader+writer feature and
  * Iceberg v3's `variant` type, carried as the OPEN variant binary
  * encoding that Spark's native `VariantType` reads and writes.
  * Pinned here:
  *  - Delta roundtrip: `parse_json` → create (protocol declares the
  *    feature both sides) → read (bespoke AND DSv2) → `variant_get`
  *    extraction equal to extracting from the original JSON strings;
  *  - WRITER HONESTY (r17): Spark 4.1 shreds variant parquet writes
  *    BY DEFAULT, but a shredded file is only legal under the
  *    `variantShredding-preview` feature — so the engine's staged
  *    writes pin unshredded emission (footer-asserted) and declare
  *    `variantType` alone;
  *  - SHREDDED tables (r17): `createShredded` writes the Parquet
  *    Variant Shredding `typed_value` layout (footer-asserted),
  *    declares the feature + `delta.enableVariantShredding`, and
  *    BOTH readers rebuild the values — byte-equal extraction to the
  *    unshredded twin;
  *  - Iceberg v3 roundtrip through the `variant` schema type, plus a
  *    shredded v3 table read (v3 shredding is file-layout-level — no
  *    table flag — so readers must handle both layouts).
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

  /** Whether any data-file footer under `dir` carries the shredded
    * `typed_value` group.
    */
  private def anyShredded(dir: String): Boolean = {
    val files = Files.walk(java.nio.file.Paths.get(dir))
    val parquets =
      try {
        import scala.jdk.CollectionConverters._
        files.iterator().asScala
          .filter(p => p.getFileName.toString.endsWith(".parquet") &&
            !p.toString.contains("_delta_log") &&
            !p.toString.contains("metadata"))
          .toList
      } finally files.close()
    parquets.exists { p =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.toString),
          spark.sparkContext.hadoopConfiguration))
      try rdr.getFooter.getFileMetaData.getSchema.toString
        .contains("typed_value")
      finally rdr.close()
    }
  }

  private def expectedK: Map[Long, Any] =
    jsonRows.select(col("id"),
      get_json_object(col("js"), "$.k").cast("long").as("k"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap

  private def checkK(df: org.apache.spark.sql.DataFrame): Unit = {
    assert(df.schema("payload").dataType ==
      org.apache.spark.sql.types.VariantType)
    val got = df.select(col("id"),
      variant_get(col("payload"), "$.k", "long").as("k"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got == expectedK, s"got $got")
  }

  test("delta variant roundtrip: parse_json -> create -> variant_get; engine files stay unshredded") {
    val t = tmp("var_delta")
    DeltaExport.create(
      jsonRows.select(col("id"), parse_json(col("js")).as("payload"))
        .coalesce(1), t)
    val st = DeltaLog.stateAt(spark, t, None)
    assert(st.minReader == 3 && st.readerFeatures == Set("variantType"))
    assert(st.writerFeatures.contains("variantType"))
    // writer honesty: Spark's default would have shredded these files
    assert(!anyShredded(t),
      "engine-staged variant files must be UNSHREDDED when only " +
        "variantType is declared")
    checkK(DeltaLog.read(spark, t))
    checkK(spark.read.format("graft-delta").load(t))
    // nested path extraction too
    val nested = DeltaLog.read(spark, t)
      .select(variant_get(col("payload"), "$.nested.x", "long"))
      .collect().flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(nested.toSeq == Seq(1L))
  }

  test("shredded delta table: feature declared, typed_value layout, both readers rebuild") {
    val t = tmp("var_delta_shred")
    DeltaExport.createShredded(
      jsonRows.select(col("id"), parse_json(col("js")).as("payload"))
        .coalesce(1), t, Some("k bigint, tag string"))
    val st = DeltaLog.stateAt(spark, t, None)
    assert(st.readerFeatures ==
      Set("variantType", "variantShredding-preview"), st.readerFeatures)
    assert(st.writerFeatures.contains("variantShredding-preview"))
    assert(st.configuration.get("delta.enableVariantShredding")
      .contains("true"))
    assert(anyShredded(t),
      "createShredded must emit the typed_value shredding layout")
    // the rebuild: k=10 lives ONLY in typed_value in these files —
    // reading the raw `value` field as the value would yield nulls
    checkK(DeltaLog.read(spark, t))
    checkK(spark.read.format("graft-delta").load(t))
    val tags = DeltaLog.read(spark, t)
      .select(col("id"), variant_get(col("payload"), "$.tag", "string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tags == Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d",
      5L -> null), tags)
    // an un-shredded field (`nested`) still reaches through `value`
    val nested = spark.read.format("graft-delta").load(t)
      .select(variant_get(col("payload"), "$.nested.x", "long"))
      .collect().flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(nested.toSeq == Seq(1L))
    // and the engine posture is restored after the opt-in scope
    assert(spark.conf.get("spark.sql.variant.writeShredding.enabled")
      == "false")
  }

  test("iceberg v3 variant roundtrip") {
    val t = tmp("var_ice")
    IcebergExport.createV3(
      jsonRows.select(col("id"), parse_json(col("js")).as("payload"))
        .coalesce(1), t)
    val meta = IcebergTable.metadataJson(t)
    assert(meta.get("format-version").asInt() == 3)
    assert(!anyShredded(t), "engine v3 variant files stay unshredded")
    val df = IcebergTable.read(spark, t)
    assert(df.schema("payload").dataType ==
      org.apache.spark.sql.types.VariantType)
    val got = df.select(col("id"),
      variant_get(col("payload"), "$.tag", "string").as("tag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> null))
  }

  test("shredded iceberg v3 files read back rebuilt (layout-level, no table flag)") {
    val t = tmp("var_ice_shred")
    VariantWrite.shredded(spark, Some("k bigint, tag string")) {
      IcebergExport.createV3(
        jsonRows.select(col("id"), parse_json(col("js")).as("payload"))
          .coalesce(1), t)
    }
    assert(anyShredded(t), "fixture must be shredded")
    val df = IcebergTable.read(spark, t)
    checkK(df.select(col("id"), col("payload")))
    checkK(spark.read.format("graft-iceberg").load(t)
      .select(col("id"), col("payload")))
  }
}
