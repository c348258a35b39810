package graft.sources

import java.io.File
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
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
  * conversion (primitives, struct/list/map, decimal, fixed). Data
  * files are read directly: unlike Hive/Delta layouts, Iceberg writes
  * partition SOURCE columns into the data files themselves, so no
  * partition reconstruction join is needed for any transform.
  * Unsupported features fail LOUDLY rather than return wrong rows:
  * format-version ≥ 3, delete manifests (v2 content=1), data files
  * carrying position/equality deletes, and non-parquet file formats
  * all throw.
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

  /** The table schema as a Spark StructType: v2 `schemas` +
    * `current-schema-id`, falling back to v1's single `schema`.
    */
  private[sources] def schemaOf(meta: JsonNode): StructType = {
    val schemaNode =
      if (meta.has("schemas")) {
        val cur = meta.get("current-schema-id").asInt()
        meta.get("schemas").elements().asScala
          .find(_.get("schema-id").asInt() == cur)
          .getOrElse(throw new IllegalStateException(
            s"current-schema-id=$cur not present in schemas"))
      } else meta.get("schema")
    toSparkType(schemaNode).asInstanceOf[StructType]
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

  /** Data-file paths of a snapshot: manifest list → manifests →
    * non-deleted entries, refusing delete content loudly.
    */
  private[sources] def dataFilesOf(
      table: String, meta: JsonNode, snap: JsonNode): Seq[String] = {
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
          Some(local(str(df, "file_path")))
        }
      }
    }.distinct
  }

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

  /** Read the table at `snapshotId` (or the current snapshot).
    * Columns appear in table-schema order with Iceberg-declared types.
    */
  def read(
      spark: SparkSession, table: String,
      snapshotId: Option[Long] = None): DataFrame = {
    val meta = metadataJson(table)
    val schema = schemaOf(meta)
    val snap = snapshotNode(meta, snapshotId)
    val files = dataFilesOf(table, meta, snap)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(files: _*)
        .select(schema.fieldNames.map(col): _*)
  }
}
