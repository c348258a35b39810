package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** COLUMN MAPPING, both modes. NAME mode (r12): a protocol-v2 Delta
  * table whose fields carry `delta.columnMapping.physicalName`
  * metadata stores PHYSICAL column names in its parquet files — the
  * reader must remap physical → logical at every nesting level and
  * key `add.partitionValues` by physical name. ID mode (r13): the
  * parquet files carry FIELD-IDS matching `delta.columnMapping.id`;
  * resolution goes through the footer ids (physical names are
  * irrelevant), and a file WITHOUT footer ids fails loudly instead of
  * name-matching to wrong columns. Fixtures authored by the spec,
  * exactly as delta-spark writes them after
  * `ALTER TABLE ... RENAME COLUMN` (rename = metadata-only).
  */
class DeltaColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def v(n: Long): String = f"$n%020d"

  private def writeCommit(table: Path, version: Long, lines: Seq[String]): Unit = {
    val dir = table.resolve("_delta_log")
    Files.createDirectories(dir)
    Files.write(
      dir.resolve(s"${v(version)}.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  private def mapMeta(id: Long, phys: String): Metadata =
    new MetadataBuilder()
      .putLong("delta.columnMapping.id", id)
      .putString("delta.columnMapping.physicalName", phys)
      .build()

  /** Logical schema: (doc_id, body, info{words}, region) — physical
    * names are the uuid-ish stable ones delta-spark assigns.
    */
  private val logicalSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = true, mapMeta(1, "col-aa11")),
    StructField("body", StringType, nullable = true, mapMeta(2, "col-bb22")),
    StructField("info",
      StructType(Seq(
        StructField("words", LongType, nullable = true, mapMeta(4, "col-dd44")))),
      nullable = true, mapMeta(3, "col-cc33")),
    StructField("region", StringType, nullable = true, mapMeta(5, "col-ee55"))))

  private def metaDataJson(mode: String): String = {
    val ss = logicalSchema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"metaData":{"id":"cm-fixture","format":{"provider":"parquet","options":{}},"schemaString":"$ss","partitionColumns":["region"],"configuration":{"delta.columnMapping.mode":"$mode","delta.columnMapping.maxColumnId":"5"},"createdTime":1700000000000}}"""
  }

  /** One parquet file with PHYSICAL column names (no partition col —
    * Delta never stores it in the data).
    */
  private def writePhysicalFile(
      table: Path, rel: String, rows: Seq[(Long, String, Long)]): Unit = {
    val tmp = Files.createTempDirectory("cm_part")
    rows.toDF("col-aa11", "col-bb22", "w")
      .select(col("col-aa11"), col("col-bb22"),
        struct(col("w").as("col-dd44")).as("col-cc33"))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val s = Files.list(tmp)
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    val dest = table.resolve(rel)
    Files.createDirectories(dest.getParent)
    Files.move(part, dest)
  }

  private def makeTable(mode: String = "name", minReader: Int = 2): Path = {
    val table = Files.createTempDirectory("delta_cm")
    writePhysicalFile(table, "f1.parquet", Seq((1L, "alpha", 5L), (2L, "beta", 7L)))
    writePhysicalFile(table, "f2.parquet", Seq((3L, "gamma", 9L)))
    writeCommit(table, 0, Seq(
      s"""{"protocol":{"minReaderVersion":$minReader,"minWriterVersion":5}}""",
      metaDataJson(mode),
      // partitionValues keyed by the partition column's PHYSICAL name
      """{"add":{"path":"f1.parquet","partitionValues":{"col-ee55":"us"},"size":512,"modificationTime":1700000000000,"dataChange":true}}""",
      """{"add":{"path":"f2.parquet","partitionValues":{"col-ee55":"de"},"size":512,"modificationTime":1700000000000,"dataChange":true}}"""))
    table
  }

  test("name-mode: physical parquet names remap to logical, nested levels included") {
    val t = makeTable()
    val df = DeltaLog.read(spark, t.toString)
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "body", "info", "region"),
      "logical names in table-schema order")
    assert(df.schema("info").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("words"),
      "nested physical names must remap too")
    val got = df.select(
      col("doc_id"), col("body"), col("info.words"), col("region"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, "alpha", 5L, "us"), (2L, "beta", 7L, "us"), (3L, "gamma", 9L, "de")),
      s"values drifted: $got")
  }

  test("name-mode partition reconstruction keys partitionValues by physical name") {
    val t = makeTable()
    val af = DeltaLog.activeFiles(spark, t.toString)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(af.map(_._2).sorted == Seq("de", "us"),
      s"physical-keyed partitionValues must resolve: $af")
  }

  test("a logical rename is metadata-only: same files, new logical name") {
    val t = makeTable()
    // delta-spark RENAME COLUMN = a new metaData with a changed
    // logical name, same physicalName — no file is rewritten
    val renamed = StructType(logicalSchema.fields.map(f =>
      if (f.name == "body") f.copy(name = "text") else f))
    val ss = renamed.json.replace("\\", "\\\\").replace("\"", "\\\"")
    writeCommit(t, 1, Seq(
      s"""{"metaData":{"id":"cm-fixture","format":{"provider":"parquet","options":{}},"schemaString":"$ss","partitionColumns":["region"],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"5"},"createdTime":1700000000000}}"""))
    val df = DeltaLog.read(spark, t.toString)
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "text", "info", "region"))
    assert(df.filter(col("text") === "beta").count() == 1L)
    // time travel to v0 still reads the OLD logical name
    assert(DeltaLog.read(spark, t.toString, Some(0L))
      .schema.fieldNames.contains("body"))
  }

  // ---- ID mode ----

  private def fid(id: Long): Metadata =
    new MetadataBuilder().putLong("parquet.field.id", id).build()

  /** One parquet file whose footer carries FIELD-IDS under arbitrary
    * physical names — what an id-mode writer (e.g. an Iceberg
    * migration) produces.
    */
  private def writeIdFile(
      table: Path, rel: String, rows: Seq[(Long, String, Long)],
      physPrefix: String = "col"): Unit = {
    val tmp = Files.createTempDirectory("cm_id_part")
    rows.toDF("a", "b", "w")
      .select(
        col("a").as(s"$physPrefix-aa11", fid(1)),
        col("b").as(s"$physPrefix-bb22", fid(2)),
        struct(col("w").as(s"$physPrefix-dd44", fid(4)))
          .as(s"$physPrefix-cc33", fid(3)))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val s = Files.list(tmp)
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    val dest = table.resolve(rel)
    Files.createDirectories(dest.getParent)
    Files.move(part, dest)
  }

  private def makeIdTable(): Path = {
    val table = Files.createTempDirectory("delta_cm_id")
    writeIdFile(table, "f1.parquet", Seq((1L, "alpha", 5L), (2L, "beta", 7L)))
    // the second file uses DIFFERENT physical names for the same ids —
    // exactly why id-mode cannot resolve by name
    writeIdFile(table, "f2.parquet", Seq((3L, "gamma", 9L)),
      physPrefix = "renamed")
    writeCommit(table, 0, Seq(
      s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaDataJson("id"),
      """{"add":{"path":"f1.parquet","partitionValues":{"col-ee55":"us"},"size":512,"modificationTime":1700000000000,"dataChange":true}}""",
      """{"add":{"path":"f2.parquet","partitionValues":{"col-ee55":"de"},"size":512,"modificationTime":1700000000000,"dataChange":true}}"""))
    table
  }

  test("id-mode: footer field-ids resolve columns, nested levels included") {
    val t = makeIdTable()
    val df = DeltaLog.read(spark, t.toString)
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "body", "info", "region"))
    val got = df.select(
      col("doc_id"), col("body"), col("info.words"), col("region"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, "alpha", 5L, "us"), (2L, "beta", 7L, "us"), (3L, "gamma", 9L, "de")),
      s"id-resolved values drifted (f2 has different physical names): $got")
  }

  test("id-mode: a logical rename is metadata-only; ids keep resolving") {
    val t = makeIdTable()
    val renamed = StructType(logicalSchema.fields.map(f =>
      if (f.name == "body") f.copy(name = "text") else f))
    val ss = renamed.json.replace("\\", "\\\\").replace("\"", "\\\"")
    writeCommit(t, 1, Seq(
      s"""{"metaData":{"id":"cm-fixture","format":{"provider":"parquet","options":{}},"schemaString":"$ss","partitionColumns":["region"],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"5"},"createdTime":1700000000000}}"""))
    val df = DeltaLog.read(spark, t.toString)
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "text", "info", "region"))
    assert(df.filter(col("text") === "beta").count() == 1L)
    assert(DeltaLog.read(spark, t.toString, Some(0L))
      .schema.fieldNames.contains("body"))
  }

  test("id-mode files WITHOUT footer ids fail loudly, never name-match") {
    // the name-mode fixture's files carry physical names but no ids;
    // an id-mode table pointing at them must refuse, not return
    // accidental name matches or silent nulls
    val t = makeTable(mode = "id")
    val e = intercept[Exception] {
      DeltaLog.read(spark, t.toString).collect()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ").toLowerCase
    assert(messages.contains("field id"),
      s"expected a loud missing-field-id error, got: $messages")
  }

  test("unknown reader features stay refused loudly") {
    val e2 = intercept[IllegalArgumentException] {
      DeltaLog.read(spark, makeTable(minReader = 3).toString)
    }
    assert(e2.getMessage.contains("minReaderVersion=3"), e2.getMessage)
  }

  test("file skipping on mapped tables resolves stats by PHYSICAL name") {
    val t = makeTable()
    // hand-attach physical-keyed stats, as delta-spark writes them
    val rel1 = "f1.parquet"
    val rel2 = "f2.parquet"
    writeCommit(t, 1, Seq(
      s"""{"remove":{"path":"$rel1","deletionTimestamp":1,"dataChange":false}}""",
      s"""{"remove":{"path":"$rel2","deletionTimestamp":1,"dataChange":false}}""",
      s"""{"add":{"path":"$rel1","partitionValues":{"col-ee55":"us"},"size":512,"modificationTime":1,"dataChange":false,"stats":"{\\"numRecords\\":2,\\"minValues\\":{\\"col-aa11\\":1},\\"maxValues\\":{\\"col-aa11\\":2}}"}}""",
      s"""{"add":{"path":"$rel2","partitionValues":{"col-ee55":"de"},"size":512,"modificationTime":1,"dataChange":false,"stats":"{\\"numRecords\\":1,\\"minValues\\":{\\"col-aa11\\":3},\\"maxValues\\":{\\"col-aa11\\":3}}"}}"""))
    // probe by the LOGICAL name: the physical-keyed stats must prune
    val (kept, total) = DeltaLog.prunedFiles(spark, t.toString, "doc_id", 3L, 9L)
    assert(total == 2 && kept == Seq(rel2),
      s"physical-keyed stats must resolve from the logical probe: $kept")
    val got = DeltaLog.readRange(spark, t.toString, "doc_id", 3L, 9L)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L), got)
  }

  test("compaction works on mapped tables, keeping both resolution styles") {
    // UNPARTITIONED name-mode fixture: two physical-named small files
    def makeFlat(mode: String): Path = {
      val table = Files.createTempDirectory("delta_cm_flat")
      if (mode == "name") {
        writePhysicalFile(table, "f1.parquet", Seq((1L, "alpha", 5L)))
        writePhysicalFile(table, "f2.parquet", Seq((2L, "beta", 7L)))
      } else {
        writeIdFile(table, "f1.parquet", Seq((1L, "alpha", 5L)))
        writeIdFile(table, "f2.parquet", Seq((2L, "beta", 7L)),
          physPrefix = "other") // different physical names, same ids
      }
      val flatSchema = StructType(logicalSchema.fields.filterNot(_.name == "region"))
      val ss = flatSchema.json.replace("\\", "\\\\").replace("\"", "\\\"")
      writeCommit(table, 0, Seq(
        s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"cm-flat","format":{"provider":"parquet","options":{}},"schemaString":"$ss","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"$mode","delta.columnMapping.maxColumnId":"5"},"createdTime":1700000000000}}""",
        """{"add":{"path":"f1.parquet","partitionValues":{},"size":512,"modificationTime":1700000000000,"dataChange":true}}""",
        """{"add":{"path":"f2.parquet","partitionValues":{},"size":512,"modificationTime":1700000000000,"dataChange":true}}"""))
      table
    }
    for (mode <- Seq("name", "id")) {
      val t = makeFlat(mode)
      val pre = DeltaLog.read(spark, t.toString).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val (before, after) = DeltaExport.compact(
        spark, t.toString, 64L * 1024 * 1024)
      assert(before == 2 && after == 1, s"$mode: $before → $after")
      val post = DeltaLog.read(spark, t.toString).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(post == pre, s"$mode-mode compaction drifted: $post vs $pre")
      assert(post == Set((1L, "alpha"), (2L, "beta")))
      // the id-mode rewrite carries footer FIELD-IDS under the
      // physicalName names, so either resolution style keeps working
      if (mode == "id") {
        val newFile = DeltaLog.activeFiles(spark, t.toString)
          .collect().map(_.getString(0)).head
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(newFile),
            spark.sparkContext.hadoopConfiguration))
        val ids = try reader.getFooter.getFileMetaData.getSchema.getFields
          .asScala.flatMap(f => Option(f.getId).map(_.intValue())).toSet
        finally reader.close()
        assert(ids == Set(1, 2, 3), s"rewrite must emit field-ids: $ids")
      }
    }
  }

  test("PARTITIONED mapped tables compact per partition under physical keys") {
    // the r13 refusal lifted (r14): the relayout is keyed by the
    // partition column's PHYSICAL name end-to-end — group keys and
    // the rewritten adds' partitionValues — so mapped readers keep
    // resolving partitions after OPTIMIZE
    def makePartitioned(mode: String): Path = {
      val table = Files.createTempDirectory("delta_cm_part")
      if (mode == "name") {
        writePhysicalFile(table, "f1.parquet", Seq((1L, "alpha", 5L)))
        writePhysicalFile(table, "f2.parquet", Seq((2L, "beta", 7L)))
        writePhysicalFile(table, "f3.parquet", Seq((3L, "gamma", 9L)))
      } else {
        writeIdFile(table, "f1.parquet", Seq((1L, "alpha", 5L)))
        writeIdFile(table, "f2.parquet", Seq((2L, "beta", 7L)),
          physPrefix = "other") // same ids, different physical names
        writeIdFile(table, "f3.parquet", Seq((3L, "gamma", 9L)))
      }
      writeCommit(table, 0, Seq(
        s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        metaDataJson(mode),
        // f1+f2 share the us partition (compaction candidates); f3 is de
        """{"add":{"path":"f1.parquet","partitionValues":{"col-ee55":"us"},"size":512,"modificationTime":1700000000000,"dataChange":true}}""",
        """{"add":{"path":"f2.parquet","partitionValues":{"col-ee55":"us"},"size":512,"modificationTime":1700000000000,"dataChange":true}}""",
        """{"add":{"path":"f3.parquet","partitionValues":{"col-ee55":"de"},"size":512,"modificationTime":1700000000000,"dataChange":true}}"""))
      table
    }
    for (mode <- Seq("name", "id")) {
      val t = makePartitioned(mode)
      val pre = DeltaLog.read(spark, t.toString).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
      assert(pre == Set((1L, "alpha", "us"), (2L, "beta", "us"),
        (3L, "gamma", "de")))
      val (before, after) = DeltaExport.compact(
        spark, t.toString, 64L * 1024 * 1024)
      assert(before == 3 && after == 2,
        s"$mode: us compacts 2→1, de untouched: $before → $after")
      val post = DeltaLog.read(spark, t.toString).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
      assert(post == pre, s"$mode-mode partitioned compaction drifted")
      // the rewritten add keys partitionValues by the PHYSICAL name
      // and stages under a physical-keyed hive dir
      val newPaths = DeltaLog.activeFiles(spark, t.toString)
        .collect().map(_.getString(0)).toSeq
      assert(newPaths.exists(_.contains("col-ee55=us")),
        s"$mode: rewritten file must live under the physical key: $newPaths")
      // partition pruning via reconstruction still works
      assert(DeltaLog.read(spark, t.toString)
        .filter(col("region") === "us").count() == 2L)
    }
  }

  test("row tracking + column mapping: ids read and survive compaction") {
    // a FOREIGN table carrying BOTH features (r15, the last
    // row-tracking refusal lifted): data columns resolve physically
    // and rename back to logical; the materialized columns' config
    // names are physical already (outside the logical schema)
    val table = Files.createTempDirectory("delta_cm_rt")
    writePhysicalFile(table, "f1.parquet", Seq((1L, "alpha", 5L)))
    writePhysicalFile(table, "f2.parquet", Seq((2L, "beta", 7L)))
    writePhysicalFile(table, "f3.parquet", Seq((3L, "gamma", 9L)))
    val ss = logicalSchema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val conf =
      """{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"5","delta.enableRowTracking":"true","delta.rowTracking.materializedRowIdColumnName":"_mat_rid","delta.rowTracking.materializedRowCommitVersionColumnName":"_mat_rvc"}"""
    writeCommit(table, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":7,"writerFeatures":["columnMapping","domainMetadata","rowTracking"]}}""",
      s"""{"metaData":{"id":"cm-rt","format":{"provider":"parquet","options":{}},"schemaString":"$ss","partitionColumns":["region"],"configuration":$conf,"createdTime":1700000000000}}""",
      """{"add":{"path":"f1.parquet","partitionValues":{"col-ee55":"us"},"size":512,"modificationTime":1700000000000,"dataChange":true,"baseRowId":0,"defaultRowCommitVersion":0}}""",
      """{"add":{"path":"f2.parquet","partitionValues":{"col-ee55":"us"},"size":512,"modificationTime":1700000000000,"dataChange":true,"baseRowId":1,"defaultRowCommitVersion":0}}""",
      """{"add":{"path":"f3.parquet","partitionValues":{"col-ee55":"de"},"size":512,"modificationTime":1700000000000,"dataChange":true,"baseRowId":2,"defaultRowCommitVersion":0}}""",
      """{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\"rowIdHighWaterMark\":2}","removed":false}}""",
      """{"commitInfo":{"operation":"CREATE"}}"""))
    def ids(): Map[Long, (Long, Long)] =
      DeltaRowTracking.readRowIds(spark, table.toString)
        .select(col("doc_id"), col("_row_id"), col("_row_commit_version"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val before = ids()
    assert(before == Map(
      1L -> ((0L, 0L)), 2L -> ((1L, 0L)), 3L -> ((2L, 0L))), s"$before")
    // logical columns + partition reconstruction under the mapping
    val full = DeltaRowTracking.readRowIds(spark, table.toString)
    assert(full.columns.toSeq == Seq(
      "doc_id", "body", "info", "region", "_row_id",
      "_row_commit_version"), full.columns.toSeq)
    assert(full.filter(col("region") === "us").count() == 2L)
    assert(full.filter(col("body") === "beta")
      .select(col("_row_id")).head().getLong(0) == 1L)
    // OPTIMIZE compacts the us partition's two files; ids and commit
    // versions survive by materialization under the mapping
    val (nb, na) =
      DeltaExport.compact(spark, table.toString, 128L * 1024 * 1024)
    assert(nb == 3 && na == 2, s"($nb, $na)")
    assert(ids() == before,
      "ids must survive mapped compaction via materialized columns")
  }

  test("checkpointing a mapped table carries the configuration") {
    val t = makeTable()
    DeltaExport.checkpoint(spark, t.toString)
    // drop the JSON commit: the checkpoint is now the only state source
    Files.delete(t.resolve("_delta_log").resolve(s"${v(0)}.json"))
    val df = DeltaLog.read(spark, t.toString)
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "body", "info", "region"))
    assert(df.count() == 3L,
      "mapping mode lost through the checkpoint → physical names would " +
        "have name-resolved to null columns")
    assert(df.filter(col("doc_id").isNull).count() == 0L)
  }
}
