package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg SCHEMA EVOLUTION (r12): rename/add/drop are metadata-only
  * commits; the reader resolves every manifest's data files through
  * that manifest's embedded write-time schema BY FIELD-ID — the
  * spec's resolution rule — so old files read correctly under new
  * names, added columns read null from pre-add files, and a re-added
  * name (new field-id) never resurrects dropped values.
  */
class IcebergEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("iceberg_evo_").resolve("t").toString

  test("rename resolves OLD data files by field-id; appends use the new name") {
    val t = tmpTable()
    IcebergExport.create(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "score"), t)
    IcebergExport.renameColumn(t, "name", "title")
    // current schema shows the new name; old files' values resolve
    val afterRename = IcebergTable.read(spark, t)
    assert(afterRename.schema.fieldNames.toSeq == Seq("id", "title", "score"))
    assert(afterRename.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")),
      "old files must resolve the renamed column by field-id, not null")
    // an append AFTER the rename writes (and validates) the new name
    IcebergExport.append(
      Seq((3L, "c", 3.0)).toDF("id", "title", "score"), t)
    val all = IcebergTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(all == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"mixed-era read drifted: $all")
    // the OLD name is refused on append now
    val e = intercept[IllegalArgumentException] {
      IcebergExport.append(
        Seq((9L, "x", 9.0)).toDF("id", "name", "score"), t)
    }
    assert(e.getMessage.contains("schema mismatch"), e.getMessage)
  }

  test("added column reads null from pre-add files, values from post-add files") {
    val t = tmpTable()
    IcebergExport.create(Seq((1L, "a")).toDF("id", "name"), t)
    IcebergExport.addColumn(t, "lang", StringType)
    val afterAdd = IcebergTable.read(spark, t).collect()
    assert(afterAdd.length == 1 && afterAdd.head.isNullAt(2),
      "pre-add files must read the new column as null")
    IcebergExport.append(
      Seq((2L, "b", "en")).toDF("id", "name", "lang"), t)
    val got = IcebergTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)))).toSeq
    assert(got == Seq((1L, None), (2L, Some("en"))), s"add drifted: $got")
  }

  test("drop is metadata-only; a re-added name gets a NEW id and never old values") {
    val t = tmpTable()
    IcebergExport.create(Seq((1L, "secret", 1.0)).toDF("id", "name", "score"), t)
    IcebergExport.dropColumn(t, "name")
    assert(IcebergTable.read(spark, t).schema.fieldNames.toSeq ==
      Seq("id", "score"))
    // re-add under the same name: a fresh field-id — the spec's
    // id-identity rule means the dropped values must NOT come back
    IcebergExport.addColumn(t, "name", StringType)
    val got = IcebergTable.read(spark, t).collect()
    assert(got.length == 1 && got.head.isNullAt(2),
      "a re-added column must not resurrect dropped values")
  }

  test("renaming a partition SOURCE keeps partition reconstruction working") {
    val t = tmpTable()
    IcebergExport.create(
      Seq((1L, "us", 1.0), (2L, "de", 2.0)).toDF("id", "region", "score"),
      t, Seq("region"))
    IcebergExport.renameColumn(t, "region", "geo")
    val got = IcebergTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "us"), (2L, "de")),
      s"partition values must attach under the renamed source: $got")
    // dropping a partition source is refused — the spec references it
    val e = intercept[Exception] {
      IcebergExport.dropColumn(t, "geo")
    }
    assert(e.getMessage.contains("partition source"), e.getMessage)
  }

  test("TYPE evolution: lossless promotions read; anything else is refused") {
    val t = tmpTable()
    IcebergExport.create(Seq((1, 1.5)).toDF("id", "score"), t)
    val v1 = Paths.get(t, "metadata", "v1.metadata.json")
    // the spec's int → long promotion: old int files read as long
    val promoted = Files.readString(v1)
      .replace("\"type\" : \"int\"", "\"type\" : \"long\"")
    Files.writeString(Paths.get(t, "metadata", "v2.metadata.json"), promoted)
    Files.writeString(Paths.get(t, "metadata", "version-hint.text"), "2")
    val got = IcebergTable.read(spark, t)
    assert(got.schema("id").dataType.typeName == "long")
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(1L),
      "int→long promotion must read the old int values")
    // a NON-promotion change (double → string) is refused
    val forged = Files.readString(v1)
      .replace("\"type\" : \"double\"", "\"type\" : \"string\"")
    Files.writeString(Paths.get(t, "metadata", "v3.metadata.json"), forged)
    Files.writeString(Paths.get(t, "metadata", "version-hint.text"), "3")
    val e = intercept[IllegalArgumentException] {
      IcebergTable.read(spark, t).collect()
    }
    assert(e.getMessage.contains("changed TYPE"), e.getMessage)
  }

  test("nested struct REORDER and rename resolve by field-id, never position") {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    import scala.jdk.CollectionConverters._
    val mapper = new ObjectMapper()
    def forge(mutate: ArrayNode => Unit): String = {
      val t = tmpTable()
      IcebergExport.create(
        Seq((1L, "x", "y")).toDF("id", "a", "b")
          .select(col("id"), struct(col("a"), col("b")).as("s")), t)
      val root = mapper.readTree(
        Paths.get(t, "metadata", "v1.metadata.json").toFile)
        .asInstanceOf[ObjectNode]
      val evolved = root.get("schemas").get(0).deepCopy[ObjectNode]()
      val nested = evolved.get("fields").elements().asScala
        .find(_.get("name").asText() == "s").get
        .get("type").withArray[ArrayNode]("fields")
      mutate(nested)
      evolved.put("schema-id", 1)
      root.put("current-schema-id", 1)
      root.withArray[ArrayNode]("schemas").add(evolved)
      root.set[ObjectNode]("schema", evolved.deepCopy[ObjectNode]())
      Files.writeString(
        Paths.get(t, "metadata", "v2.metadata.json"), root.toString)
      Files.writeString(Paths.get(t, "metadata", "version-hint.text"), "2")
      t
    }
    // two same-typed nested strings SWAPPED (ids keep their names):
    // the positional cast would silently exchange the values — the
    // by-id nested remap must keep each value with its field-id
    val swapped = forge { nested =>
      val (f0, f1) = (nested.get(0).deepCopy[ObjectNode](),
        nested.get(1).deepCopy[ObjectNode]())
      nested.removeAll()
      nested.add(f1); nested.add(f0)
    }
    val sw = IcebergTable.read(spark, swapped)
    assert(sw.schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("b", "a"), "current order is the output order")
    val swRow = sw.select(col("s.a"), col("s.b")).collect().head
    assert((swRow.getString(0), swRow.getString(1)) == ("x", "y"),
      "reordered nested fields must keep values with their FIELD-IDS — " +
        s"a positional read swaps them: $swRow")
    // a nested field SWAP-plus-RENAME (a→bb at a's id, b→aa): values
    // must follow the ids, not the lookalike names
    val renamedSwap = forge { nested =>
      val (f0, f1) = (nested.get(0).deepCopy[ObjectNode](),
        nested.get(1).deepCopy[ObjectNode]())
      f0.put("name", "bb"); f1.put("name", "aa")
      nested.removeAll()
      nested.add(f1); nested.add(f0)
    }
    val rs = IcebergTable.read(spark, renamedSwap)
      .select(col("s.bb"), col("s.aa")).collect().head
    assert((rs.getString(0), rs.getString(1)) == ("x", "y"),
      s"renamed+reordered nested fields must resolve by id: $rs")
    // a nested RENAME in place (same ids, same order) stays readable —
    // position equals identity here, so the rename is value-correct
    val renamed = forge { nested =>
      nested.get(0).asInstanceOf[ObjectNode].put("name", "a2")
    }
    val df = IcebergTable.read(spark, renamed)
    assert(df.schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("a2", "b"))
    val r = df.select(col("s.a2"), col("s.b")).collect().head
    assert((r.getString(0), r.getString(1)) == ("x", "y"),
      "in-place nested rename must keep values with their ids")
  }

  test("time travel across evolution reads each snapshot under the CURRENT schema") {
    // Iceberg semantics: time travel picks a SNAPSHOT (data), not a
    // schema — the current schema projects whatever files that
    // snapshot had
    val t = tmpTable()
    val s1 = IcebergExport.create(Seq((1L, "a")).toDF("id", "name"), t)
    IcebergExport.renameColumn(t, "name", "title")
    val s2 = IcebergExport.append(Seq((2L, "b")).toDF("id", "title"), t)
    assert(s1 != s2)
    val old = IcebergTable.read(spark, t, Some(s1))
    assert(old.schema.fieldNames.toSeq == Seq("id", "title"))
    assert(old.collect().map(_.getString(1)).toSeq == Seq("a"))
  }

  test("WRITE-side type promotion: evolveType commits metadata-only; both eras read") {
    val t = tmpTable()
    IcebergExport.create(
      Seq((1, 1.5f, BigDecimal("12.34"))).toDF("id", "score", "amt")
        .select(col("id"), col("score"),
          col("amt").cast(DecimalType(9, 2)).as("amt")).coalesce(1), t)
    val filesBefore = {
      val m = IcebergTable.metadataJson(t)
      IcebergTable.dataFilesOf(t, m, IcebergTable.currentSnapshotNode(m)).toSet
    }
    IcebergExport.evolveType(t, "id", LongType)
    IcebergExport.evolveType(t, "score", DoubleType)
    IcebergExport.evolveType(t, "amt", DecimalType(18, 2))
    // metadata-only: no data file touched
    val filesAfter = {
      val m = IcebergTable.metadataJson(t)
      IcebergTable.dataFilesOf(t, m, IcebergTable.currentSnapshotNode(m)).toSet
    }
    assert(filesAfter == filesBefore, "promotion must not rewrite data")
    // appends must present the PROMOTED types; both eras read widened
    IcebergExport.append(
      Seq((10_000_000_000L, 2.5, BigDecimal("9999999999999999.99")))
        .toDF("id", "score", "amt")
        .select(col("id"), col("score"),
          col("amt").cast(DecimalType(18, 2)).as("amt")).coalesce(1), t)
    val got = IcebergTable.read(spark, t).orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 10_000_000_000L))
    assert(got.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5))
    assert(got.map(_.getDecimal(2).toString).toSeq
      == Seq("12.34", "9999999999999999.99"))
    // non-lossless promotions refuse loudly
    val e1 = intercept[IllegalArgumentException] {
      IcebergExport.evolveType(t, "id", IntegerType) // narrowing
    }
    assert(e1.getMessage.contains("lossless"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      IcebergExport.evolveType(t, "amt", DecimalType(20, 4)) // scale change
    }
    assert(e2.getMessage.contains("lossless"), e2.getMessage)
    intercept[IllegalArgumentException] {
      IcebergExport.evolveType(t, "score", StringType) // cross-kind
    }
  }
}
