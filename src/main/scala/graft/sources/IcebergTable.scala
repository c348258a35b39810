package graft.sources

import java.io.File
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Read-only Apache Iceberg table reader built from the OPEN Iceberg
  * table spec (iceberg.apache.org/spec: a `metadata/` directory of
  * `v<N>.metadata.json` files — the HadoopCatalog layout — each
  * naming a current snapshot whose avro manifest list references avro
  * manifest files that enumerate the data files) — no iceberg-spark
  * runtime dependency, which this offline environment cannot resolve.
  * With [[DeltaLog]]/[[DeltaExport]] this completes the two open
  * lakehouse formats' interop tier; [[IcebergExport]] is the write
  * side.
  *
  * Supported: format-version 1 and 2 READS of append-only tables —
  * current or time-traveled snapshot by snapshot-id, manifest-list or
  * (legacy v1) inline-manifests snapshots, multi-manifest snapshots,
  * `version-hint.text` or max-version discovery, Iceberg→Spark schema
  * conversion (primitives, struct/list/map, decimal, fixed).
  * IDENTITY-partition source columns are materialized from the
  * manifests' typed partition structs as per-file constants — exactly
  * Iceberg's own `PartitionUtil.constantsMap` read path — via ONE
  * broadcast equi-join on canonical `input_file_name()`, so
  * [[IcebergExport]]'s hive-staged tables, UniForm-converted Delta
  * tables, and Hive-migrated tables (none of which carry the source
  * columns in their data files) all read correctly; non-identity
  * transforms need no reconstruction (Iceberg always writes their
  * source columns into the files). Unsupported features fail LOUDLY
  * rather than return wrong rows: format-version ≥ 3, delete
  * manifests (v2 content=1), data files carrying position/equality
  * deletes, non-parquet file formats, schema EVOLUTION (a `schemas`
  * history with more than one entry), and a sampled data-file footer
  * missing current-schema columns (a rename without rewrite — name
  * resolution would return silent nulls where the spec requires
  * field-id resolution) all throw.
  *
  * Scale shape: manifest replay is driver-side metadata work bounded
  * by files-in-snapshot (the same state the Iceberg library's
  * planning keeps); avro decoding uses the file-embedded writer
  * schema (`GenericDatumReader`), so real manifests with optional
  * fields this reader doesn't know still decode. The DATA read is one
  * `spark.read.parquet` over the snapshot's file set — distributed
  * scan, schema projection pushed down.
  */
object IcebergTable {

  private val mapper = new ObjectMapper()

  private def metaDir(table: String): Path = Paths.get(table, "metadata")

  /** Strip a `file:` scheme — manifests written by real engines carry
    * absolute URIs; ours carry absolute paths.
    */
  private def local(uri: String): String =
    uri.replaceFirst("^file:/*", "/")

  /** The newest `v<N>.metadata.json`. `version-hint.text` (when
    * present and valid) is a STARTING POINT, not the answer — the
    * HadoopTableOperations discipline probes FORWARD from it while the
    * next version file exists, so a hint gone stale under concurrent
    * writers (it is written non-atomically, after the commit) never
    * hides a committed version. A missing/garbled hint falls back to a
    * directory scan.
    */
  private[sources] def currentMetadataVersion(table: String): Int = {
    val dir = metaDir(table)
    require(Files.isDirectory(dir), s"not an Iceberg table (no metadata/): $table")
    val hint = dir.resolve("version-hint.text")
    val hinted =
      if (Files.isRegularFile(hint))
        scala.util.Try(
          new String(Files.readAllBytes(hint)).trim.toInt).toOption
          .filter(v => Files.isRegularFile(dir.resolve(s"v$v.metadata.json")))
      else None
    var v = hinted.getOrElse {
      val s = Files.list(dir)
      val vs =
        try s.iterator().asScala.map(_.getFileName.toString)
          .flatMap { n =>
            val m = "^v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(n)
            m.map(_.group(1).toInt)
          }.toVector
        finally s.close()
      vs.maxOption.getOrElse(
        throw new IllegalStateException(s"no v*.metadata.json under $dir"))
    }
    while (Files.isRegularFile(dir.resolve(s"v${v + 1}.metadata.json"))) v += 1
    v
  }

  private[sources] def metadataJson(table: String): JsonNode = {
    val v = currentMetadataVersion(table)
    val node = mapper.readTree(
      metaDir(table).resolve(s"v$v.metadata.json").toFile)
    val fv = node.get("format-version").asInt()
    require(fv <= 2,
      s"unsupported Iceberg format-version=$fv at $table: this reader " +
        "implements v1/v2 and refuses rather than returning wrong rows " +
        "(v3 adds row lineage / deletion vectors)")
    node
  }

  /** The current schema node: v2 `schemas` + `current-schema-id`,
    * falling back to v1's single `schema`. A `schemas` HISTORY of more
    * than one entry means the table has evolved — this reader resolves
    * parquet columns by NAME where the spec requires field-ids, so an
    * evolved table (renames especially) could silently read nulls;
    * refuse loudly instead.
    */
  private def schemaNodeOf(meta: JsonNode): JsonNode =
    if (meta.has("schemas")) {
      val n = meta.get("schemas").size()
      require(n <= 1,
        s"table has $n schemas (schema evolution): this reader resolves " +
          "columns by name, not field-id, and refuses evolved tables " +
          "rather than returning wrong rows")
      val cur = meta.get("current-schema-id").asInt()
      meta.get("schemas").elements().asScala
        .find(_.get("schema-id").asInt() == cur)
        .getOrElse(throw new IllegalStateException(
          s"current-schema-id=$cur not present in schemas"))
    } else meta.get("schema")

  /** The table schema as a Spark StructType. */
  private[sources] def schemaOf(meta: JsonNode): StructType =
    toSparkType(schemaNodeOf(meta)).asInstanceOf[StructType]

  /** Identity-transform partition fields of the DEFAULT spec, as
    * (partition field name, source column name) with the source
    * resolved by field-id against the current schema's top-level
    * columns. Non-identity transforms are skipped (their source
    * columns live in the data files); an identity transform whose
    * source-id is not a top-level column is refused (nested
    * partitioning is out of scope).
    */
  private[sources] def identityPartitionSources(
      meta: JsonNode): Seq[(String, String)] = {
    val specFields: Seq[JsonNode] =
      if (meta.has("partition-specs")) {
        val defId =
          if (meta.has("default-spec-id")) meta.get("default-spec-id").asInt()
          else 0
        meta.get("partition-specs").elements().asScala
          .find(_.get("spec-id").asInt() == defId)
          .map(_.get("fields").elements().asScala.toSeq)
          .getOrElse(Nil)
      } else if (meta.has("partition-spec"))
        meta.get("partition-spec").elements().asScala.toSeq
      else Nil
    if (specFields.isEmpty) return Nil
    val idToName = schemaNodeOf(meta).get("fields").elements().asScala
      .map(f => f.get("id").asInt() -> f.get("name").asText()).toMap
    specFields.flatMap { f =>
      f.get("transform").asText() match {
        case "identity" =>
          val sid = f.get("source-id").asInt()
          val src = idToName.getOrElse(sid,
            throw new IllegalStateException(
              s"identity partition source-id $sid is not a top-level " +
                "schema column (nested partitioning unsupported)"))
          Some(f.get("name").asText() -> src)
        case "void" => None
        case _ => None // bucket/day/...: source columns are in the files
      }
    }
  }

  /** Iceberg type JSON → Spark type. Primitive names per the spec's
    * "Primitive Types" table; nested types are JSON objects.
    */
  private[sources] def toSparkType(t: JsonNode): DataType =
    if (t.isTextual) {
      val s = t.asText()
      val dec = "^decimal\\(\\s*(\\d+)\\s*,\\s*(\\d+)\\s*\\)$".r
      val fixed = "^fixed\\[(\\d+)\\]$".r
      s match {
        case "boolean" => BooleanType
        case "int" => IntegerType
        case "long" => LongType
        case "float" => FloatType
        case "double" => DoubleType
        case "date" => DateType
        case "time" => LongType // micros since midnight; Spark has no TimeType
        case "timestamp" => TimestampNTZType
        case "timestamptz" => TimestampType
        case "string" => StringType
        case "uuid" => StringType
        case "binary" => BinaryType
        case dec(p, sc) => DecimalType(p.toInt, sc.toInt)
        case fixed(_) => BinaryType
        case other =>
          throw new IllegalStateException(s"unsupported Iceberg type: $other")
      }
    } else t.get("type").asText() match {
      case "struct" =>
        StructType(t.get("fields").elements().asScala.map { f =>
          StructField(
            f.get("name").asText(),
            toSparkType(f.get("type")),
            nullable = !f.get("required").asBoolean())
        }.toSeq)
      case "list" =>
        ArrayType(
          toSparkType(t.get("element")),
          containsNull = !t.get("element-required").asBoolean())
      case "map" =>
        MapType(
          toSparkType(t.get("key")),
          toSparkType(t.get("value")),
          valueContainsNull = !t.get("value-required").asBoolean())
      case other =>
        throw new IllegalStateException(s"unsupported Iceberg type: $other")
    }

  private def snapshotNode(meta: JsonNode, snapshotId: Option[Long]): JsonNode = {
    val snaps = Option(meta.get("snapshots"))
      .map(_.elements().asScala.toVector).getOrElse(Vector.empty)
    snapshotId match {
      case Some(id) =>
        snaps.find(_.get("snapshot-id").asLong() == id).getOrElse(
          throw new IllegalArgumentException(
            s"snapshot $id not found (expired or never existed)"))
      case None =>
        val cur = Option(meta.get("current-snapshot-id")).map(_.asLong())
          .filter(_ != -1L)
        cur.flatMap(id => snaps.find(_.get("snapshot-id").asLong() == id))
          .getOrElse(throw new IllegalStateException(
            "table has no current snapshot (empty table)"))
    }
  }

  /** Decode every record of an avro file with its embedded writer
    * schema (driver-side; manifests are metadata-sized).
    */
  private def avroRecords(path: String): Vector[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](
      new File(local(path)), new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toVector
    finally reader.close()
  }

  private def str(r: GenericRecord, field: String): String =
    r.get(field).toString

  /** Field lookup that treats fields ABSENT from the writer schema as
    * null (avro 1.12's `Record.get(String)` throws instead) — v1
    * manifests simply lack the v2-only fields.
    */
  private def opt(r: GenericRecord, field: String): Option[AnyRef] =
    Option(r.getSchema.getField(field)).flatMap(f => Option(r.get(f.pos())))

  /** Typed avro partition value → Spark-castable string (dates come
    * back as ISO strings so `cast(string as date)` round-trips).
    */
  private def partValueString(
      rec: GenericRecord, field: String): Option[String] = {
    val f = Option(rec.getSchema.getField(field)).getOrElse(
      throw new IllegalStateException(
        s"manifest partition struct lacks field $field — cannot " +
          "reconstruct the identity partition column"))
    Option(rec.get(f.pos())).map { v =>
      val base = {
        val s = f.schema()
        if (s.getType == org.apache.avro.Schema.Type.UNION)
          s.getTypes.asScala.find(
            _.getType != org.apache.avro.Schema.Type.NULL).getOrElse(s)
        else s
      }
      val isDate = Option(base.getLogicalType).exists(_.getName == "date") ||
        Option(base.getProp("logicalType")).contains("date")
      if (isDate)
        java.time.LocalDate.ofEpochDay(v.toString.toLong).toString
      else v.toString
    }
  }

  /** Data files of a snapshot with their manifest partition values
    * (keyed by partition FIELD name), refusing delete content loudly.
    */
  private[sources] def dataFilesWithPartitions(
      table: String, meta: JsonNode, snap: JsonNode,
      partFields: Seq[String]): Seq[(String, Map[String, Option[String]])] = {
    val manifestPaths: Seq[String] =
      if (snap.has("manifest-list"))
        avroRecords(snap.get("manifest-list").asText()).map { m =>
          // v2 manifest lists carry content: 0=data, 1=deletes
          val content = opt(m, "content").map(_.toString.toInt).getOrElse(0)
          require(content == 0,
            s"delete manifest in snapshot (content=$content): this " +
              "append-only reader refuses v2 row-level deletes rather " +
              "than returning undeleted rows")
          str(m, "manifest_path")
        }
      else if (snap.has("manifests")) // legacy v1 inline form
        snap.get("manifests").elements().asScala.map(_.asText()).toSeq
      else throw new IllegalStateException(
        "snapshot has neither manifest-list nor manifests")
    manifestPaths.flatMap { mp =>
      avroRecords(mp).flatMap { entry =>
        val status = entry.get("status").toString.toInt
        if (status == 2) None // DELETED: not part of this snapshot
        else {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          val content = opt(df, "content").map(_.toString.toInt).getOrElse(0)
          require(content == 0,
            s"data_file with content=$content (position/equality " +
              "deletes): refused by this append-only reader")
          val fmt = str(df, "file_format").toUpperCase
          require(fmt == "PARQUET",
            s"unsupported file_format=$fmt (only PARQUET is wired)")
          val pv =
            if (partFields.isEmpty) Map.empty[String, Option[String]]
            else {
              val part = df.get("partition").asInstanceOf[GenericRecord]
              partFields.map(n => n -> partValueString(part, n)).toMap
            }
          Some(local(str(df, "file_path")) -> pv)
        }
      }
    }.distinctBy(_._1)
  }

  /** Data-file paths of a snapshot (partition-value-free view, kept
    * for audits like the UniForm same-files assertion).
    */
  private[sources] def dataFilesOf(
      table: String, meta: JsonNode, snap: JsonNode): Seq[String] =
    dataFilesWithPartitions(table, meta, snap, Nil).map(_._1)

  /** Snapshot ids in commit order (snapshot-log order when present,
    * else `snapshots` array order) — the time-travel index.
    */
  def snapshotIds(table: String): Seq[Long] = {
    val meta = metadataJson(table)
    if (meta.has("snapshot-log"))
      meta.get("snapshot-log").elements().asScala
        .map(_.get("snapshot-id").asLong()).toSeq
    else Option(meta.get("snapshots"))
      .map(_.elements().asScala.map(_.get("snapshot-id").asLong()).toSeq)
      .getOrElse(Nil)
  }

  /** Rename-without-rewrite detection (a bounded ONE-footer driver
    * read): parquet columns are resolved by NAME below, but the spec
    * requires field-id resolution — a real table whose column was
    * renamed in place would name-resolve to silent nulls. A sampled
    * data file whose footer lacks an expected column name fails
    * loudly instead.
    */
  private def requireFooterNames(
      spark: SparkSession, sample: String, expected: Seq[String]): Unit = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(sample),
        spark.sparkContext.hadoopConfiguration))
    val names =
      try reader.getFooter.getFileMetaData.getSchema
        .getFields.asScala.map(_.getName).toSet
      finally reader.close()
    val missing = expected.filterNot(names)
    require(missing.isEmpty,
      s"data file $sample lacks column(s) ${missing.mkString(", ")} " +
        "present in the table schema — a rename without rewrite; this " +
        "reader resolves columns by name (not field-id) and refuses " +
        "rather than returning null columns")
  }

  /** [[DeltaLog]]'s canonical-path discipline: `input_file_name()`'s
    * URI spelling → the manifests' absolute-path spelling, as a
    * codegen column expression (no Scala UDF).
    */
  private def canonFile(c: org.apache.spark.sql.Column) =
    regexp_replace(
      url_decode(regexp_replace(c, "^file:/*", "/")), "/+", "/")

  /** Read the table at `snapshotId` (or the current snapshot).
    * Columns appear in table-schema order with Iceberg-declared
    * types; identity-partition source columns are materialized from
    * the manifests' partition structs (see the object Scaladoc) via
    * one broadcast join on the file path.
    */
  def read(
      spark: SparkSession, table: String,
      snapshotId: Option[Long] = None): DataFrame = {
    val meta = metadataJson(table)
    val schema = schemaOf(meta)
    val snap = snapshotNode(meta, snapshotId)
    val idParts = identityPartitionSources(meta)
      .filter { case (_, src) => schema.fieldNames.contains(src) }
    val filesPv = dataFilesWithPartitions(
      table, meta, snap, idParts.map(_._1))
    val files = filesPv.map(_._1)
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val srcCols = idParts.map(_._2)
    val dataSchema = StructType(
      schema.fields.filterNot(f => srcCols.contains(f.name)))
    requireFooterNames(spark, files.head, dataSchema.fieldNames.toSeq)
    val data = spark.read.schema(dataSchema).parquet(files: _*)
    val withParts =
      if (idParts.isEmpty) data
      else {
        // (file, one STRING column per identity source) — metadata-
        // sized build side, broadcast; values cast to declared types
        import spark.implicits._
        val pvRows = filesPv.map { case (f, pv) =>
          (f, idParts.map { case (pn, _) => pv(pn).orNull })
        }
        val pvFrame = pvRows.toDF("__file", "__pv")
          .select(
            col("__file") +:
              idParts.zipWithIndex.map { case ((_, src), i) =>
                col("__pv").getItem(i).as(src)
              }: _*)
        data
          .withColumn("__canon_file", canonFile(input_file_name()))
          .join(broadcast(pvFrame), col("__canon_file") === col("__file"))
          .drop("__canon_file", "__file")
      }
    withParts.select(schema.fields.map { f =>
      if (srcCols.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else col(f.name)
    }: _*)
  }
}
