package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Write-side complement of [[IcebergTable]]: export DataFrames AS an
  * Apache Iceberg table by authoring the open table spec directly —
  * `v<N>.metadata.json` (format-version 1; 2 once [[deleteWhere]]
  * runs), avro manifest lists and manifests with the spec's
  * field-ids (incl. per-file `lower_bounds`/`upper_bounds` for file
  * skipping), data files under `data/`. Append + row-level DELETE
  * (v2 position deletes) + schema evolution
  * ([[renameColumn]]/[[addColumn]]/[[dropColumn]]) + retention
  * ([[expireSnapshots]]) + blind-upsert MERGE ([[mergeUpsert]], r14)
  * + atomic REPLACE TABLE ([[replaceTable]], r15).
  *
  * Partitioning (r12): IDENTITY transforms over
  * string/int/long/date/boolean source columns — the default
  * production table shape. Data is staged with Spark's hive-layout
  * `partitionBy` (one file belongs to exactly one partition, the
  * spec's contract), and each manifest entry carries the spec's TYPED
  * partition struct (r102, field-ids from 1000) decoded from the
  * hive path. Like a Hive-migrated Iceberg table, the data files do
  * NOT contain the identity source columns; [[IcebergTable]]
  * materializes them from partition metadata as per-file constants —
  * exactly Iceberg's own `PartitionUtil.constantsMap` read path for
  * identity transforms. Non-identity transforms (bucket/day/truncate)
  * are refused: they require transform evaluation at write time and
  * are a pruning optimization, not a semantics feature.
  *
  * Concurrency: metadata versions are claimed with the same
  * atomic-exclusive hardlink discipline as [[DeltaExport]] /
  * [[graft.etl.SnapshotStore]] — exactly the optimistic-commit
  * protocol Iceberg's HadoopTableOperations implements with an atomic
  * rename; the loser re-reads the table state and retries, which is
  * always safe for appends (disjoint uniquely-named data files).
  * `version-hint.text` is written LAST and non-atomically — the spec
  * treats it as a hint; [[IcebergTable]] falls back to a directory
  * scan.
  *
  * Scale shape: the data write is one distributed
  * `df.write.parquet`; manifest/metadata authoring is driver-side
  * work bounded by files-added-per-commit plus one carried
  * manifest-list record per prior snapshot's manifest. Record counts
  * come from parquet FOOTERS (bounded per-commit driver reads), never
  * a second scan job.
  */
object IcebergExport {

  private val mapper = new ObjectMapper()

  /** One partition field: `name` = partition field name (identity's
    * is the source column name; transforms get the spec's
    * `src_day`/`src_bucket`/… names), `sourceId` = the source
    * column's schema field-id, `fieldId` = the partition field's own
    * id (spec: assigned from 1000), `dt` = the partition VALUE's type
    * (identity/truncate: the source type; day: date; year/month/hour/
    * bucket: int), `transform` per the spec's grammar
    * (`identity`, `day`, `year`, `month`, `hour`, `bucket[N]`,
    * `truncate[W]`), `srcName` = the source column's current name.
    */
  private[sources] case class PartField(
      name: String, sourceId: Int, fieldId: Int, dt: DataType,
      transform: String = "identity", srcName: String = "") {
    def sourceName: String = if (srcName.isEmpty) name else srcName
  }

  /** The spec's 32-bit Murmur3 (x86, seed 0) — the BUCKET transform's
    * hash (Appendix B): ints/longs/dates/timestamps hash their 8-byte
    * little-endian long form, strings their UTF-8 bytes;
    * `bucket = (hash & Int.MaxValue) % N`. Hand-rolled from the
    * public algorithm; pinned against the spec's own test vectors.
    */
  /** The canonical murmur3_x86_32 lives in
    * [[graft.functions.BucketHash]] (the codegen'd bucket
    * expression's static helper); this alias keeps the writer-side
    * call sites and specs working.
    */
  private[sources] def murmur3(bytes: Array[Byte], seed: Int = 0): Int =
    graft.functions.BucketHash.murmur3(bytes, seed)

  private[sources] def longLeBytes(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var x = v; var i = 0
    while (i < 8) { b(i) = (x & 0xFF).toByte; x >>>= 8; i += 1 }
    b
  }

  private[sources] def bucketOf(hash: Int, n: Int): Int =
    (hash & Int.MaxValue) % n

  /** Partition source types this writer supports (identity transform).
    * Each must round-trip exactly through a hive path segment AND an
    * avro partition-struct value; float/double/timestamp partitioning
    * is refused (a correctness hazard in every engine).
    */
  private def avroPartType(dt: DataType): String = dt match {
    case StringType => "\"string\""
    case IntegerType => "\"int\""
    case LongType => "\"long\""
    case BooleanType => "\"boolean\""
    case DateType => "{\"type\":\"int\",\"logicalType\":\"date\"}"
    case other => throw new IllegalArgumentException(
      s"unsupported Iceberg identity-partition source type $other " +
        "(supported: string, int, long, date, boolean)")
  }

  /** Hive path / Delta partitionValues string → typed avro value.
    * `__HIVE_DEFAULT_PARTITION__` is Spark's null marker.
    */
  private def partAvroValue(dt: DataType, raw: Option[String]): AnyRef =
    raw.filter(_ != "__HIVE_DEFAULT_PARTITION__").map[AnyRef] { v =>
      dt match {
        case StringType => v
        case IntegerType => Int.box(v.toInt)
        case LongType => Long.box(v.toLong)
        case BooleanType => Boolean.box(v.toBoolean)
        case DateType =>
          Int.box(java.time.LocalDate.parse(v).toEpochDay.toInt)
        case other => throw new IllegalArgumentException(
          s"unsupported partition source type $other")
      }
    }.orNull

  /** manifest_entry with the spec's v1 required fields and field-ids
    * (status, snapshot_id, data_file{file_path, file_format,
    * partition, record_count, file_size_in_bytes,
    * block_size_in_bytes}); `partition` is the typed struct r102 —
    * one field per partition field (empty for spec-id 0 unpartitioned
    * tables). `block_size_in_bytes` (field-id 105) is required for v1
    * WRITERS (deprecated in v2) — omitted and a real library
    * projecting the required v1 schema rejects the manifest.
    */
  private def manifestEntrySchema(pfs: Seq[PartField]): Schema = {
    val partFields = pfs.map { pf =>
      s"""{"name":"${pf.name}","type":["null",${avroPartType(pf.dt)}],""" +
        s""""default":null,"field-id":${pf.fieldId}}"""
    }.mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int","field-id":0},
        {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
        {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
        {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
          {"name":"content","type":"int","default":0,"field-id":134},
          {"name":"file_path","type":"string","field-id":100},
          {"name":"file_format","type":"string","field-id":101},
          {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[$partFields]}},
          {"name":"record_count","type":"long","field-id":103},
          {"name":"file_size_in_bytes","type":"long","field-id":104},
          {"name":"block_size_in_bytes","type":"long","field-id":105},
          {"name":"equality_ids","type":["null",{"type":"array","items":"int","element-id":136}],"default":null,"field-id":135},
          {"name":"first_row_id","type":["null","long"],"default":null,"field-id":142},
          {"name":"referenced_data_file","type":["null","string"],"default":null,"field-id":143},
          {"name":"content_offset","type":["null","long"],"default":null,"field-id":144},
          {"name":"content_size_in_bytes","type":["null","long"],"default":null,"field-id":145},
          {"name":"null_value_counts","type":["null",{"type":"array","logicalType":"map","items":{"type":"record","name":"k121_v122","fields":[
            {"name":"key","type":"int","field-id":121},
            {"name":"value","type":"long","field-id":122}]}}],"default":null,"field-id":110},
          {"name":"lower_bounds","type":["null",{"type":"array","logicalType":"map","items":{"type":"record","name":"k126_v127","fields":[
            {"name":"key","type":"int","field-id":126},
            {"name":"value","type":"bytes","field-id":127}]}}],"default":null,"field-id":125},
          {"name":"upper_bounds","type":["null",{"type":"array","logicalType":"map","items":{"type":"record","name":"k129_v130","fields":[
            {"name":"key","type":"int","field-id":129},
            {"name":"value","type":"bytes","field-id":130}]}}],"default":null,"field-id":128}
        ]}}
      ]}""".replaceAll("\\s+", " "))
  }

  /** The v1 spec's historical HDFS block size default — the value the
    * reference implementation wrote before v2 deprecated the field.
    */
  private val DefaultBlockSize = 64L * 1024 * 1024

  /** manifest_file (manifest-list entry) with v1 required field-ids.
    * `added_snapshot_id` (503) is required non-null for v1 writers.
    */
  private val ManifestFileSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","default":0,"field-id":517},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":515},
      {"name":"min_sequence_number","type":["null","long"],"default":null,"field-id":516},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_data_files_count","type":["null","int"],"default":null,"field-id":504},
      {"name":"existing_data_files_count","type":["null","int"],"default":null,"field-id":505},
      {"name":"deleted_data_files_count","type":["null","int"],"default":null,"field-id":506}
    ]}""".replaceAll("\\s+", " "))

  private def metaDir(table: String): Path = Paths.get(table, "metadata")

  private[sources] case class FileBounds(
      lower: Map[Int, Array[Byte]], upper: Map[Int, Array[Byte]],
      nullCounts: Map[Int, Long])

  /** One manifest entry to write. `seq` — an EXPLICIT data sequence
    * number (compaction survivors keep their original one so equality
    * deletes keep scoping correctly); None inherits the manifest's.
    * `status` — 1 ADDED (default) or 0 EXISTING (carried forward).
    */
  private[sources] case class Added(
      absPath: String, sizeBytes: Long, records: Long,
      pv: Map[String, Option[String]] = Map.empty,
      bounds: Option[FileBounds] = None,
      seq: Option[Long] = None,
      status: Int = 1,
      format: String = "PARQUET",
      firstRowId: Option[Long] = None,
      referencedDataFile: Option[String] = None,
      contentOffset: Option[Long] = None,
      contentSizeInBytes: Option[Long] = None)

  /** Top-level column name → schema field-id (the bounds map keys). */
  private def topFieldIds(
      schemaNode: com.fasterxml.jackson.databind.JsonNode): Map[String, Int] =
    schemaNode.get("fields").elements().asScala
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap

  /** Row-group statistics min/max fold in the parquet value domain. */
  private def statPick(a: AnyRef, b: AnyRef, takeMin: Boolean): AnyRef = {
    val lt = (a, b) match {
      case (x: java.lang.Integer, y: java.lang.Integer) => x < y
      case (x: java.lang.Long, y: java.lang.Long) => x < y
      case (x: java.lang.Float, y: java.lang.Float) => x < y
      case (x: java.lang.Double, y: java.lang.Double) => x < y
      case (x: java.lang.Boolean, y: java.lang.Boolean) => !x && y
      case (x: org.apache.parquet.io.api.Binary,
        y: org.apache.parquet.io.api.Binary) =>
        new String(x.getBytes, StandardCharsets.UTF_8) <
          new String(y.getBytes, StandardCharsets.UTF_8)
      case _ => true
    }
    if (lt == takeMin) a else b
  }

  /** (record count, per-column spec bounds) from ONE parquet footer
    * read — the [[DeltaExport]] add.stats discipline for the Iceberg
    * manifest's `lower_bounds`/`upper_bounds`/`null_value_counts`.
    */
  private def footerInfo(
      conf: org.apache.hadoop.conf.Configuration, abs: String,
      fieldIds: Map[String, Int]): (Long, Option[FileBounds]) = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(abs), conf))
    try {
      val n = reader.getRecordCount
      if (fieldIds.isEmpty) return (n, None)
      val footer = reader.getFooter
      val schema = footer.getFileMetaData.getSchema
      val mins = scala.collection.mutable.Map[String, AnyRef]()
      val maxs = scala.collection.mutable.Map[String, AnyRef]()
      val nulls = scala.collection.mutable.Map[String, Long]()
      val bad = scala.collection.mutable.Set[String]()
      footer.getBlocks.asScala.foreach { block =>
        block.getColumns.asScala.foreach { cc =>
          val path = cc.getPath.toDotString
          if (!path.contains('.') && fieldIds.contains(path)) {
            val st = cc.getStatistics
            if (st == null || (!st.hasNonNullValue && st.getNumNulls < 0)) {
              bad += path
            } else {
              nulls(path) =
                nulls.getOrElse(path, 0L) + math.max(0L, st.getNumNulls)
              if (st.hasNonNullValue) {
                val mn = st.genericGetMin.asInstanceOf[AnyRef]
                val mx = st.genericGetMax.asInstanceOf[AnyRef]
                mins(path) = mins.get(path)
                  .map(statPick(_, mn, takeMin = true)).getOrElse(mn)
                maxs(path) = maxs.get(path)
                  .map(statPick(_, mx, takeMin = false)).getOrElse(mx)
              }
            }
          }
        }
      }
      def encode(m: scala.collection.Map[String, AnyRef]): Map[Int, Array[Byte]] =
        m.toSeq.filterNot(kv => bad(kv._1)).flatMap { case (path, v) =>
          IcebergBounds.encodeStat(
            schema.getType(Seq(path): _*).asPrimitiveType(), v)
            .map(fieldIds(path) -> _)
        }.toMap
      val lower = encode(mins)
      val upper = encode(maxs)
      // a bound is sound only as a PAIR: drop ids present on one side
      val both = lower.keySet intersect upper.keySet
      (n, Some(FileBounds(
        lower.view.filterKeys(both).toMap,
        upper.view.filterKeys(both).toMap,
        nulls.toSeq.filterNot(kv => bad(kv._1))
          .map { case (p, c) => fieldIds(p) -> c }.toMap)))
    } catch {
      case _: Exception => (footerCount(conf, abs), None) // optimization only
    } finally reader.close()
  }

  /** Spark type → Iceberg type JSON node, assigning nested field-ids
    * from `nextId` (the spec requires every field/element/key/value to
    * carry a unique id).
    */
  private def icebergType(
      dt: DataType, nextId: () => Int): com.fasterxml.jackson.databind.JsonNode =
    dt match {
      case s: StructType =>
        val n = mapper.createObjectNode()
        n.put("type", "struct")
        val fs = n.putArray("fields")
        // ids for this level first (Iceberg's assignment order), then
        // recurse — matters only for id stability, not for our reader
        val ids = s.fields.map(_ => nextId())
        s.fields.zip(ids).foreach { case (f, id) =>
          val fn = mapper.createObjectNode()
          fn.put("id", id)
          fn.put("name", f.name)
          fn.put("required", !f.nullable)
          fn.set[ObjectNode]("type", icebergType(f.dataType, nextId))
          fs.add(fn)
        }
        n
      case ArrayType(et, containsNull) =>
        val n = mapper.createObjectNode()
        n.put("type", "list")
        n.put("element-id", nextId())
        n.set[ObjectNode]("element", icebergType(et, nextId))
        n.put("element-required", !containsNull)
        n
      case MapType(kt, vt, valueContainsNull) =>
        val n = mapper.createObjectNode()
        n.put("type", "map")
        n.put("key-id", nextId())
        n.set[ObjectNode]("key", icebergType(kt, nextId))
        n.put("value-id", nextId())
        n.set[ObjectNode]("value", icebergType(vt, nextId))
        n.put("value-required", !valueContainsNull)
        n
      case p =>
        val name = p match {
          case BooleanType => "boolean"
          case IntegerType | ShortType | ByteType => "int"
          case LongType => "long"
          case FloatType => "float"
          case DoubleType => "double"
          case StringType => "string"
          case BinaryType => "binary"
          case DateType => "date"
          case TimestampType => "timestamptz"
          case TimestampNTZType => "timestamp"
          case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
          // v3 variant — unshredded open-encoding binary pair, what
          // Spark's parquet writer emits for VariantType
          case _: VariantType => "variant"
          case other =>
            throw new IllegalArgumentException(
              s"no Iceberg mapping for Spark type $other")
        }
        mapper.getNodeFactory.textNode(name)
    }

  private def icebergSchemaNode(
      schema: StructType, startAfter: Int = 0): (ObjectNode, Int) = {
    // field ids start past `startAfter` — REPLACE TABLE's new columns
    // are NEW fields and the spec forbids reusing ids of dropped ones
    var last = startAfter
    val next = () => { last += 1; last }
    val node = icebergType(schema, next).asInstanceOf[ObjectNode]
    (node, last)
  }

  /** Resolve `partitionBy` column names into identity [[PartField]]s
    * against the authored schema node (source-id = the column's
    * schema field-id; partition field-ids assigned from 1000).
    */
  private def partFieldsOf(
      schemaNode: ObjectNode, schema: StructType,
      partitionBy: Seq[String]): Seq[PartField] =
    partitionBy.zipWithIndex.map { case (c, i) =>
      val field = schemaNode.get("fields").elements().asScala
        .find(_.get("name").asText() == c)
        .getOrElse(throw new IllegalArgumentException(
          s"partition column $c is not a top-level schema column"))
      val dt = schema(c).dataType
      avroPartType(dt) // validates the type, throws with the full list
      PartField(c, field.get("id").asInt(), 1000 + i, dt,
        "identity", c)
    }

  /** The partition VALUE type a transform produces over a source
    * type (spec "Partition Transforms"): identity/truncate keep the
    * source type, day is a date, year/month/hour/bucket are ints.
    */
  private def transformValueType(transform: String, srcDt: DataType): DataType =
    transform match {
      case "identity" => srcDt
      case "day" => DateType
      case "year" | "month" | "hour" => IntegerType
      case t if t.startsWith("bucket[") => IntegerType
      case t if t.startsWith("truncate[") => srcDt
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform $other (supported: identity, " +
          "day, year, month, hour, bucket[N], truncate[W])")
    }

  /** The staging column computing one transform over its source — the
    * value that becomes the hive dir segment and, parsed back, the
    * manifest's typed partition value. Timestamps transform in UTC
    * (the spec's frame).
    */
  private def transformColumn(pf: PartField, srcDt: DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val src = col(pf.sourceName)
    val bucketRe = "^bucket\\[(\\d+)\\]$".r
    val truncRe = "^truncate\\[(\\d+)\\]$".r
    // the spec's temporal frame is UTC. TIMESTAMP (an instant)
    // derives from epoch seconds — a cast(DateType) would be
    // SESSION-timezone dependent (a non-UTC session would write
    // misplaced partition values that the reader's UTC
    // temporalOrdinal pruning then prunes incorrectly). DATE and
    // TIMESTAMP_NTZ are zoneless: field extraction on them is
    // session-independent already (and NTZ cannot cast to BIGINT).
    def utcDate = srcDt match {
      case DateType => src
      case TimestampNTZType => src.cast(DateType)
      case TimestampType =>
        date_from_unix_date(
          floor(src.cast(LongType) / lit(86400)).cast(IntegerType))
      case other => throw new IllegalArgumentException(
        s"temporal transform over non-temporal type $other")
    }
    def hourOrdinal = srcDt match {
      case TimestampType =>
        floor(src.cast(LongType) / lit(3600)).cast(IntegerType)
      case TimestampNTZType =>
        (unix_date(src.cast(DateType)) * lit(24) + hour(src))
          .cast(IntegerType)
      case DateType => (unix_date(src) * lit(24)).cast(IntegerType)
      case other => throw new IllegalArgumentException(
        s"temporal transform over non-temporal type $other")
    }
    pf.transform match {
      case "identity" => src
      case "day" => utcDate
      case "year" => year(utcDate) - lit(1970)
      case "month" =>
        (year(utcDate) - lit(1970)) * lit(12) + month(utcDate) - lit(1)
      case "hour" => hourOrdinal
      case bucketRe(n) =>
        val buckets = n.toInt
        require(buckets > 0, s"bucket[$n] needs N > 0")
        // codegen'd Catalyst expression (r15 — no ScalaUDF boundary
        // in the bucketed-write staging projection)
        def bucketCol(c: org.apache.spark.sql.Column) =
          org.apache.spark.sql.graftext.Bridge.column(
            graft.functions.IcebergBucket(
              org.apache.spark.sql.graftext.Bridge.expression(c), buckets))
        srcDt match {
          case IntegerType | LongType => bucketCol(src.cast(LongType))
          case DateType => bucketCol(src)
          case StringType => bucketCol(src)
          case other => throw new IllegalArgumentException(
            s"bucket transform over unsupported type $other")
        }
      case truncRe(w) =>
        val width = w.toInt
        require(width > 0, s"truncate[$w] needs W > 0")
        srcDt match {
          case StringType => substring(src, 1, width)
          case IntegerType | LongType =>
            // spec: v - (((v % W) + W) % W) — floors toward -inf
            (src - (((src % width) + width) % width)).cast(srcDt)
          case other => throw new IllegalArgumentException(
            s"truncate transform over unsupported type $other")
        }
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform $other")
    }
  }

  /** Parse the table's DEFAULT partition spec into [[PartField]]s —
    * the non-create commit paths' source of truth (the spec JSON
    * itself carries forward VERBATIM; these typed fields drive the
    * manifest partition struct and staging).
    */
  /** The current default partition spec as (transform, source column)
    * — what [[replaceTable]] needs to preserve layout explicitly.
    */
  private[sources] def currentSpecOf(table: String): Seq[(String, String)] =
    partFieldsFromMeta(IcebergTable.metadataJson(table))
      .map(pf => (pf.transform, pf.sourceName))

  private def partFieldsFromMeta(
      meta: com.fasterxml.jackson.databind.JsonNode): Seq[PartField] = {
    val specFields: Seq[com.fasterxml.jackson.databind.JsonNode] =
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
    val schemaNode = IcebergTable.schemaNodeOf(meta)
    val byId = schemaNode.get("fields").elements().asScala
      .map(f => f.get("id").asInt() -> f).toMap
    val schema = IcebergTable.schemaOf(meta)
    specFields.flatMap { f =>
      val transform = f.get("transform").asText()
      if (transform == "void") None
      else {
        val sid = f.get("source-id").asInt()
        val srcField = byId.getOrElse(sid,
          throw new IllegalStateException(
            s"partition source-id $sid is not a top-level schema column"))
        val srcName = srcField.get("name").asText()
        val srcDt = schema(srcName).dataType
        Some(PartField(
          f.get("name").asText(), sid,
          Option(f.get("field-id")).map(_.asInt()).getOrElse(-1),
          transformValueType(transform, srcDt), transform, srcName))
      }
    }
  }

  /** Add the DERIVED staging columns for non-identity transforms
    * (identity stages on the source column itself, whose name IS the
    * partition field name).
    */
  private def deriveCols(df: DataFrame, pfs: Seq[PartField]): DataFrame =
    pfs.filterNot(_.transform == "identity").foldLeft(df) { (d, pf) =>
      d.withColumn(pf.name, transformColumn(pf, df.schema(pf.sourceName).dataType))
    }

  /** Iceberg snapshot ids are random positive longs. */
  private def newSnapshotId(): Long =
    java.util.UUID.randomUUID().getLeastSignificantBits & Long.MaxValue

  /** Row count from the parquet FOOTER — a bounded driver read, never
    * a scan job.
    */
  private def footerCount(
      conf: org.apache.hadoop.conf.Configuration, abs: String): Long = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(abs), conf))
    try reader.getRecordCount finally reader.close()
  }

  /** Hive `k=v/` dirs of a staged relative path → raw partition
    * values (URL-decoded, null marker preserved as the marker string
    * for [[partAvroValue]] to null out).
    */
  private def hivePartValues(
      rel: String, partitionBy: Seq[String]): Map[String, Option[String]] = {
    val kv = rel.split('/').dropRight(1).flatMap { d =>
      val i = d.indexOf('=')
      if (i > 0)
        Some(d.take(i) -> java.net.URLDecoder.decode(d.drop(i + 1), "UTF-8"))
      else None
    }.toMap
    partitionBy.map { c =>
      c -> kv.get(c).filter(_ != "__HIVE_DEFAULT_PARTITION__")
    }.toMap
  }

  /** Stage `df` privately (hive `partitionBy` layout when
    * partitioned), move the parquet parts under `data/` preserving
    * their partition dirs, and return (path, size, footer row count,
    * partition values) per file — the [[DeltaExport]] stage-in
    * discipline, so concurrent writers never share a `_temporary` dir
    * or enumerate each other's files.
    */
  private def stageIn(
      df: DataFrame, table: String, partitionBy: Seq[String],
      fieldIds: Map[String, Int] = Map.empty): Seq[Added] = {
    VariantWrite.applyPosture(df.sparkSession)
    val stage = Files.createTempDirectory("iceberg_stage")
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(stage.toString)
    val rels = {
      val s = Files.walk(stage)
      try s.iterator().asScala
        .filter(p => Files.isRegularFile(p)
          && p.getFileName.toString.endsWith(".parquet"))
        .map(p => stage.relativize(p).toString)
        .toVector.sorted
      finally s.close()
    }
    val dataDir = Paths.get(table, "data")
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    rels.map { rel =>
      val dest = dataDir.resolve(rel)
      Files.createDirectories(dest.getParent)
      Files.move(stage.resolve(rel), dest)
      val (records, bounds) =
        footerInfo(conf, dest.toAbsolutePath.toString, fieldIds)
      Added(dest.toAbsolutePath.toString, Files.size(dest), records,
        hivePartValues(rel, partitionBy), bounds)
    }
  }

  /** The spec-field JSON shared by `partition-spec`,
    * `partition-specs[0].fields` and the manifest's `partition-spec`
    * avro metadata.
    */
  private def specFieldsJson(pfs: Seq[PartField]): String =
    pfs.map(pf =>
      s"""{"name":"${pf.name}","transform":"${pf.transform}",""" +
        s""""source-id":${pf.sourceId},"field-id":${pf.fieldId}}""")
      .mkString("[", ",", "]")

  /** Write one ADDED-entries manifest for `snapId`; returns its
    * (absolute path, byte length, file count).
    */
  private def writeManifest(
      table: String, snapId: Long, schemaJson: String,
      files: Seq[Added], pfs: Seq[PartField],
      entryContent: Int = 0, specId: Int = 0,
      equalityIds: Seq[Int] = Nil, fv: Int = 1,
      lineageMaterialized: Boolean = false): (String, Long, Int) = {
    val entrySchema = manifestEntrySchema(pfs)
    val path = metaDir(table)
      .resolve(s"${java.util.UUID.randomUUID()}-m0.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](entrySchema))
    // the avro key-value metadata real manifests carry (readers like
    // ours use the embedded record schema; these are for engines that
    // check them). The format-version must match the TABLE's — a v2
    // manifest stamped "1" makes a real reader pick the v1 projection
    // and ignore sequence numbers / reject delete manifests
    w.setMeta("schema", schemaJson)
    w.setMeta("partition-spec", specFieldsJson(pfs))
    w.setMeta("partition-spec-id", specId.toString)
    w.setMeta("format-version", math.max(1, fv).toString)
    if (fv >= 2)
      w.setMeta("content", if (entryContent == 0) "data" else "deletes")
    // writer-recorded fact (r15, the Delta add.tags twin): entries in
    // this manifest with NULL first_row_id carry MATERIALIZED lineage
    // columns — readers of self-written tables then skip the per-file
    // footer probe entirely (foreign manifests, lacking the key,
    // still probe)
    if (lineageMaterialized)
      w.setMeta("graft.lineage-materialized", "true")
    w.create(entrySchema, path.toFile)
    // the spec's int-keyed maps encode in avro as arrays of
    // key/value records (logicalType map)
    def kvArray(
        dfSchema: Schema, field: String,
        entries: Seq[(Int, AnyRef)]): AnyRef = {
      val arr = dfSchema.getField(field).schema().getTypes.asScala
        .find(_.getType == Schema.Type.ARRAY).get
      val a = new GenericData.Array[GenericRecord](entries.size, arr)
      entries.sortBy(_._1).foreach { case (k, v) =>
        val r = new GenericData.Record(arr.getElementType)
        r.put("key", k)
        r.put("value", v)
        a.add(r)
      }
      a
    }
    try files.foreach { f =>
      val dfSchema = entrySchema.getField("data_file").schema()
      val dfRec = new GenericData.Record(dfSchema)
      dfRec.put("content", entryContent) // 0=data, 1=position, 2=equality deletes
      if (equalityIds.nonEmpty) {
        val arrSchema = dfSchema.getField("equality_ids").schema()
          .getTypes.asScala.find(_.getType == Schema.Type.ARRAY).get
        val a = new GenericData.Array[AnyRef](equalityIds.size, arrSchema)
        equalityIds.foreach(id => a.add(Int.box(id)))
        dfRec.put("equality_ids", a)
      }
      dfRec.put("file_path", f.absPath)
      dfRec.put("file_format", f.format)
      f.firstRowId.foreach(v => dfRec.put("first_row_id", Long.box(v)))
      f.referencedDataFile.foreach(v => dfRec.put("referenced_data_file", v))
      f.contentOffset.foreach(v => dfRec.put("content_offset", Long.box(v)))
      f.contentSizeInBytes.foreach(v =>
        dfRec.put("content_size_in_bytes", Long.box(v)))
      val part = new GenericData.Record(
        dfSchema.getField("partition").schema())
      pfs.foreach(pf =>
        part.put(pf.name, partAvroValue(pf.dt, f.pv.getOrElse(pf.name, None))))
      dfRec.put("partition", part)
      dfRec.put("record_count", f.records)
      dfRec.put("file_size_in_bytes", f.sizeBytes)
      dfRec.put("block_size_in_bytes", DefaultBlockSize)
      f.bounds match {
        case Some(b) =>
          dfRec.put("null_value_counts", kvArray(dfSchema,
            "null_value_counts",
            b.nullCounts.toSeq.map { case (k, v) => k -> Long.box(v) }))
          dfRec.put("lower_bounds", kvArray(dfSchema, "lower_bounds",
            b.lower.toSeq.map { case (k, v) =>
              k -> java.nio.ByteBuffer.wrap(v)
            }))
          dfRec.put("upper_bounds", kvArray(dfSchema, "upper_bounds",
            b.upper.toSeq.map { case (k, v) =>
              k -> java.nio.ByteBuffer.wrap(v)
            }))
        case None =>
          dfRec.put("null_value_counts", null)
          dfRec.put("lower_bounds", null)
          dfRec.put("upper_bounds", null)
      }
      val e = new GenericData.Record(entrySchema)
      e.put("status", f.status)
      e.put("snapshot_id", snapId)
      e.put("sequence_number", f.seq.map(Long.box).orNull)
      e.put("data_file", dfRec)
      w.append(e)
    } finally w.close()
    (path.toAbsolutePath.toString, Files.size(path), files.size)
  }

  /** Carried-forward manifest-list rows of the previous snapshot —
    * re-read generically so real tables' extra optional fields don't
    * break the carry.
    */
  private[sources] case class ManifestRef(
      path: String, length: Long, added: Int, snapId: Option[Long],
      content: Int = 0, specId: Int = 0, seq: Option[Long] = None,
      minSeq: Option[Long] = None)

  private def priorManifests(
      prevManifestList: Option[String]): Seq[ManifestRef] =
    prevManifestList.toSeq.flatMap { ml =>
      val r = new DataFileReader[GenericRecord](
        new File(ml.replaceFirst("^file:/*", "/")),
        new GenericDatumReader[GenericRecord]())
      try r.iterator().asScala.map { rec =>
        def opt(f: String): Option[AnyRef] =
          Option(rec.getSchema.getField(f)).flatMap(x => Option(rec.get(x.pos())))
        ManifestRef(
          rec.get("manifest_path").toString,
          rec.get("manifest_length").toString.toLong,
          opt("added_data_files_count").map(_.toString.toInt).getOrElse(0),
          opt("added_snapshot_id").map(_.toString.toLong),
          // carried DELETE manifests must keep their content flag — a
          // dropped flag silently UNDELETES rows
          opt("content").map(_.toString.toInt).getOrElse(0),
          // carried manifests keep their spec-id and SEQUENCE NUMBER —
          // a dropped sequence would re-scope equality deletes to
          // nothing (every data file would look newer than the delete)
          opt("partition_spec_id").map(_.toString.toInt).getOrElse(0),
          opt("sequence_number").map(_.toString.toLong),
          opt("min_sequence_number").map(_.toString.toLong))
      }.toVector
      finally r.close()
    }

  /** Write the snapshot's manifest list (`snap-<id>-<uuid>.avro`).
    * A carried manifest missing `added_snapshot_id` (legal in foreign
    * v1 manifests, the field is non-null in OUR schema) falls back to
    * the committing snapshot's id.
    */
  private def writeManifestList(
      table: String, snapId: Long,
      manifests: Seq[ManifestRef], fv: Int = 1): String = {
    val path = metaDir(table)
      .resolve(s"snap-$snapId-${java.util.UUID.randomUUID()}.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](ManifestFileSchema))
    w.setMeta("format-version", math.max(1, fv).toString)
    w.create(ManifestFileSchema, path.toFile)
    try manifests.foreach { mr =>
      val m = new GenericData.Record(ManifestFileSchema)
      m.put("manifest_path", mr.path)
      m.put("manifest_length", mr.length)
      m.put("partition_spec_id", mr.specId)
      m.put("content", mr.content)
      // all-ADDED manifests inherit this sequence number at the entry
      // level (spec inheritance); min defaults to the manifest's own
      // seq, except compaction manifests carrying EXISTING entries
      // with older explicit seqs (a too-high min would let foreign
      // planners skip equality deletes that still apply)
      m.put("sequence_number", mr.seq.map(Long.box).orNull)
      m.put("min_sequence_number",
        mr.minSeq.orElse(mr.seq).map(Long.box).orNull)
      m.put("added_snapshot_id", mr.snapId.getOrElse(snapId))
      m.put("added_data_files_count", mr.added)
      m.put("existing_data_files_count", 0)
      m.put("deleted_data_files_count", 0)
      w.append(m)
    } finally w.close()
    path.toAbsolutePath.toString
  }

  /** Atomically claim metadata version `v` (hardlink; exactly one
    * contender wins), then refresh `version-hint.text`.
    */
  private def claim(table: String, v: Int, json: String): Boolean = {
    val dir = metaDir(table)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    val won =
      try { Files.createLink(dir.resolve(s"v$v.metadata.json"), tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally Files.deleteIfExists(tmp)
    if (won) {
      val hintTmp = dir.resolve(s".hint-${java.util.UUID.randomUUID()}")
      Files.write(hintTmp, v.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(hintTmp, dir.resolve("version-hint.text"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    won
  }

  private def buildMetadata(
      table: String, tableUuid: String, schemaNode: ObjectNode,
      lastColumnId: Int, snapshots: Seq[ObjectNode],
      currentSnapshotId: Long,
      snapshotLog: Seq[(Long, Long)],
      pfs: Seq[PartField],
      schemaHistory: Seq[ObjectNode] = Nil,
      formatVersion: Int = 1,
      lastSequenceNumber: Long = 0L,
      extraSpecs: Seq[ObjectNode] = Nil,
      properties: Map[String, String] = Map.empty,
      refs: Map[String, Ref] = Map.empty,
      nextRowId: Option[Long] = None,
      defaultSpecId: Int = 0): String = {
    val root = mapper.createObjectNode()
    root.put("format-version", formatVersion)
    // v2 requires the sequence-number watermark (deletes bumped the
    // table to v2; sequence numbers are written but not needed by our
    // reader — position deletes target files by unique PATH)
    if (formatVersion >= 2)
      root.put("last-sequence-number", lastSequenceNumber)
    // v3 ROW LINEAGE: the next unassigned row id — every commit that
    // adds data advances it by the rows added
    if (formatVersion >= 3)
      root.put("next-row-id", nextRowId.getOrElse(0L))
    root.put("table-uuid", tableUuid)
    root.put("location", Paths.get(table).toAbsolutePath.toString)
    root.put("last-updated-ms", System.currentTimeMillis())
    root.put("last-column-id", lastColumnId)
    root.set[ObjectNode]("schema", schemaNode)
    // v2-style schema HISTORY alongside the v1 field: evolution commits
    // append to it; the reader resolves per-manifest by field-id
    val history =
      if (schemaHistory.nonEmpty) schemaHistory else Seq(schemaNode)
    root.put("current-schema-id",
      if (schemaNode.has("schema-id")) schemaNode.get("schema-id").asInt()
      else 0)
    val schemasArr = root.putArray("schemas")
    history.foreach(s => schemasArr.add(s.deepCopy[ObjectNode]()))
    val specFields = mapper.readTree(specFieldsJson(pfs))
    root.set[ObjectNode]("partition-spec", specFields) // v1 legacy field
    root.put("default-spec-id", defaultSpecId)
    val specs = root.putArray("partition-specs")
    val spec0 = mapper.createObjectNode()
    spec0.put("spec-id", defaultSpecId)
    spec0.set[ObjectNode]("fields", specFields.deepCopy())
    specs.add(spec0)
    // carried specs: every NON-default spec rides along — the
    // dedicated unpartitioned spec delete manifests declare, and
    // under PARTITION EVOLUTION every older spec whose manifests are
    // still referenced (their manifest-list rows name these ids)
    extraSpecs.filter(_.get("spec-id").asInt() != defaultSpecId)
      .foreach(s => specs.add(s.deepCopy[ObjectNode]()))
    val carriedFieldIds = extraSpecs.flatMap(sp =>
      sp.get("fields").elements().asScala.toSeq
        .flatMap(f => Option(f.get("field-id")).map(_.asInt())))
    root.put("last-partition-id",
      ((999 +: pfs.map(_.fieldId)) ++ carriedFieldIds).max)
    val propsNode = root.putObject("properties")
    properties.toSeq.sortBy(_._1).foreach { case (k, v) =>
      propsNode.put(k, v)
    }
    root.put("current-snapshot-id", currentSnapshotId)
    // named SNAPSHOT REFS (branches/tags — the spec's `refs` map);
    // "main" stays implicit in current-snapshot-id
    putRefs(root, refs)
    val snapsArr = root.putArray("snapshots")
    snapshots.foreach(snapsArr.add)
    val logArr = root.putArray("snapshot-log")
    snapshotLog.foreach { case (ts, id) =>
      val e = mapper.createObjectNode()
      e.put("timestamp-ms", ts)
      e.put("snapshot-id", id)
      logArr.add(e)
    }
    root.putArray("metadata-log")
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private def snapshotNode(
      snapId: Long, parentId: Option[Long], tsMs: Long,
      manifestList: String, addedFiles: Int, addedRecords: Long,
      sequenceNumber: Option[Long] = None,
      operation: String = "append",
      firstRowId: Option[Long] = None,
      schemaId: Option[Int] = None): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("snapshot-id", snapId)
    parentId.foreach(p => n.put("parent-snapshot-id", p))
    sequenceNumber.foreach(q => n.put("sequence-number", q))
    firstRowId.foreach(r => n.put("first-row-id", r))
    // the spec's snapshot schema-id: REPLACE stamps it so time travel
    // to either side of the swap resolves the right era's schema
    schemaId.foreach(i => n.put("schema-id", i))
    n.put("timestamp-ms", tsMs)
    val s = n.putObject("summary")
    s.put("operation", operation)
    s.put("added-data-files", addedFiles.toString)
    s.put("added-records", addedRecords.toString)
    n.put("manifest-list", manifestList)
    n
  }

  /** (format-version, last-sequence-number) of existing metadata —
    * preserved by every commit after a delete upgraded the table.
    */
  private def fvOf(
      meta: com.fasterxml.jackson.databind.JsonNode): (Int, Long) =
    (meta.get("format-version").asInt(),
      Option(meta.get("last-sequence-number"))
        .map(_.asLong()).getOrElse(0L))

  /** The v3 row-lineage watermark (`next-row-id`); None on v1/v2. */
  private def nextRowIdOf(
      meta: com.fasterxml.jackson.databind.JsonNode): Option[Long] =
    Option(meta.get("next-row-id")).map(_.asLong())

  /** Assign explicit `first_row_id`s from `start` in staged-file
    * order (the spec permits explicit assignment; inheritance is for
    * writers that leave them null). Returns the files and the new
    * next-row-id.
    */
  private def assignRowIds(
      added: Seq[Added], start: Long): (Seq[Added], Long) = {
    var next = start
    val out = added.map { a =>
      val withId = a.copy(firstRowId = Some(next))
      next += math.max(0L, a.records)
      withId
    }
    (out, next)
  }

  /** Create an Iceberg table at `table` from `df` (v1 metadata,
    * snapshot 1 = the written files), identity-partitioned by
    * `partitionBy`. Fails if a metadata version already exists.
    */
  def create(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Long =
    createWithSpec(df, table, partitionBy.map(c => ("identity", c)))

  /** CREATE an EMPTY table (r17 — SQL `CREATE TABLE` through
    * [[graft.sources.dsv2.GraftCatalog]]): legal v1 metadata with the
    * declared schema and partition spec, NO snapshots and
    * `current-snapshot-id: -1` — the spec's freshly-created state.
    * The engine's readers serve it as zero rows; the first
    * [[append]] commits snapshot 1 on top (appendTxn already treats a
    * -1 current snapshot as "no parent, no prior manifests").
    */
  def createEmpty(
      table: String, schema: org.apache.spark.sql.types.StructType,
      spec: Seq[(String, String)] = Nil,
      properties: Map[String, String] = Map.empty): Unit = {
    require(!Files.isDirectory(metaDir(table)) || {
      val s = Files.list(metaDir(table))
      try !s.iterator().asScala
        .exists(_.getFileName.toString.matches("v\\d+\\.metadata\\.json"))
      finally s.close()
    }, s"$table already has Iceberg metadata; use append")
    val (schemaNode, lastId) = icebergSchemaNode(schema)
    schemaNode.put("schema-id", 0)
    val ids = topFieldIds(schemaNode)
    val pfs = spec.zipWithIndex.map { case ((transform, src), i) =>
      require(ids.contains(src),
        s"partition source $src is not a top-level schema column")
      val vt = transformValueType(transform, schema(src).dataType)
      avroPartType(vt)
      PartField(transformFieldName(transform, src), ids(src), 1000 + i,
        vt, transform, src)
    }
    Files.createDirectories(metaDir(table))
    val json = buildMetadata(
      table, java.util.UUID.randomUUID().toString, schemaNode, lastId,
      Nil, -1L, Nil, pfs, properties = properties)
    if (!claim(table, 1, json))
      throw new IllegalStateException(
        s"lost the race for $table metadata v1 — another writer created it")
  }

  /** The spec's partition-field name for a (transform, source). */
  private def transformFieldName(transform: String, src: String): String =
    transform match {
      case "identity" => src
      case t if t.startsWith("bucket[") => s"${src}_bucket"
      case t if t.startsWith("truncate[") => s"${src}_trunc"
      case t => s"${src}_$t" // day/year/month/hour
    }

  /** CREATE with a full PARTITION SPEC — `spec` items are
    * (transform, source column) with the spec grammar's transforms:
    * `identity`, `day`, `year`, `month`, `hour`, `bucket[N]`,
    * `truncate[W]`. Non-identity transforms keep their SOURCE COLUMNS
    * in the data files (the spec's contract — only identity sources
    * reconstruct from partition metadata), stage in hive layout on
    * the DERIVED value (day = date, bucket = the spec's 32-bit
    * murmur3 bucket, truncate = prefix/floored value), and the
    * manifests carry the typed transform partition structs real
    * planners prune on. The production table shape at 100 TB is
    * day(event_time) + bucket(user_id) — both write correctly here.
    */
  def createWithSpec(
      df: DataFrame, table: String, spec: Seq[(String, String)],
      formatVersion: Int = 1): Long = {
    require(formatVersion == 1 || formatVersion == 3,
      s"createWithSpec writes v1 (v2 arrives with the first delete) " +
        s"or v3 (row lineage + deletion vectors): not $formatVersion")
    require(!Files.isDirectory(metaDir(table)) || {
      val s = Files.list(metaDir(table))
      try !s.iterator().asScala
        .exists(_.getFileName.toString.matches("v\\d+\\.metadata\\.json"))
      finally s.close()
    }, s"$table already has Iceberg metadata; use append")
    val (schemaNode, lastId) = icebergSchemaNode(df.schema)
    schemaNode.put("schema-id", 0)
    val ids = topFieldIds(schemaNode)
    val pfs = spec.zipWithIndex.map { case ((transform, src), i) =>
      require(ids.contains(src),
        s"partition source $src is not a top-level schema column")
      val vt = transformValueType(transform, df.schema(src).dataType)
      avroPartType(vt) // validates the value type, throws with the list
      PartField(transformFieldName(transform, src), ids(src), 1000 + i,
        vt, transform, src)
    }
    val staged = stageIn(
      deriveCols(df, pfs), table, pfs.map(_.name), topFieldIds(schemaNode))
    // v3: explicit row-lineage assignment from 0
    val (added, nextRowId) =
      if (formatVersion >= 3) assignRowIds(staged, 0L)
      else (staged, 0L)
    val snapId = newSnapshotId()
    Files.createDirectories(metaDir(table))
    val fv = formatVersion
    val seq1 = if (fv >= 2) Some(1L) else None
    val (mPath, mLen, mCount) =
      writeManifest(table, snapId, schemaNode.toString, added, pfs, fv = fv)
    val ml = writeManifestList(
      table, snapId,
      Seq(ManifestRef(mPath, mLen, mCount, Some(snapId), seq = seq1)),
      fv = fv)
    val ts = System.currentTimeMillis()
    val snap = snapshotNode(
      snapId, None, ts, ml, added.size, added.map(_.records).sum,
      seq1, firstRowId = if (fv >= 3) Some(0L) else None)
    val json = buildMetadata(
      table, java.util.UUID.randomUUID().toString, schemaNode, lastId,
      Seq(snap), snapId, Seq((ts, snapId)), pfs,
      formatVersion = fv,
      lastSequenceNumber = seq1.getOrElse(0L),
      nextRowId = if (fv >= 3) Some(nextRowId) else None)
    if (!claim(table, 1, json))
      throw new IllegalStateException(
        s"lost the race for $table metadata v1 — another writer created it")
    snapId
  }

  /** REPLACE TABLE — Iceberg's `CREATE OR REPLACE ... AS SELECT`
    * (r15, the Delta twin of [[DeltaExport.replaceTable]]): one
    * metadata commit that swaps the table's CONTENT and DEFINITION —
    * a NEW schema whose field ids continue past `last-column-id`
    * (the spec forbids reusing dropped columns' ids; a re-created
    * name is a NEW field and never resurrects old values), a NEW
    * default partition spec with fresh field-ids past
    * `last-partition-id`, and a `replace`-operation snapshot whose
    * manifest list holds ONLY the new data manifests (old data AND
    * old delete manifests drop — replaced content). Old snapshots
    * stay time-travelable under their own schemas/specs (schema
    * history + carried specs), refs keep pinning them, and the
    * table-uuid is UNCHANGED (Iceberg's replace keeps table identity
    * — unlike Delta, whose metaData id resets; each format's own
    * semantics). v3 tables assign the replacement rows fresh row ids
    * continuing from `next-row-id`.
    *
    * Concurrency: the loser of a racing data commit aborts with
    * `ConcurrentModificationException` — the staged layout and id
    * assignments derive from the snapshot this replace read.
    */
  def replaceTable(
      df: DataFrame, table: String,
      spec: Seq[(String, String)] = Nil): Long =
    replaceTable(df, table, spec, () => ())

  /** [[replaceTable]] with the read→commit seam the concurrency spec
    * injects a competing writer into; production uses the no-op
    * overload.
    */
  private[sources] def replaceTable(
      df: DataFrame, table: String, spec: Seq[(String, String)],
      beforeCommit: () => Unit): Long = {
    val meta0 = IcebergTable.metadataJson(table)
    val version0 = IcebergTable.currentMetadataVersion(table)
    val (fv, lastSeq0) = fvOf(meta0)
    val lastColId0 = meta0.get("last-column-id").asInt()
    val (schemaNode, lastId) = icebergSchemaNode(df.schema, lastColId0)
    val schemaId = (0 +: schemaHistoryOf(meta0).map(n =>
      Option(n.get("schema-id")).map(_.asInt()).getOrElse(0))).max + 1
    schemaNode.put("schema-id", schemaId)
    val ids = topFieldIds(schemaNode)
    val allSpecs: Seq[ObjectNode] =
      if (meta0.has("partition-specs"))
        meta0.get("partition-specs").elements().asScala
          .map(_.deepCopy[ObjectNode]()).toSeq
      else Nil
    val newSpecId =
      (0 +: allSpecs.map(_.get("spec-id").asInt())).max + 1
    val lastPartId0 =
      if (meta0.has("last-partition-id"))
        meta0.get("last-partition-id").asInt()
      else 999
    val pfs = spec.zipWithIndex.map { case ((transform, src), i) =>
      require(ids.contains(src),
        s"partition source $src is not a top-level schema column")
      val vt = transformValueType(transform, df.schema(src).dataType)
      avroPartType(vt)
      PartField(transformFieldName(transform, src), ids(src),
        lastPartId0 + 1 + i, vt, transform, src)
    }
    val staged = stageIn(
      deriveCols(df, pfs), table, pfs.map(_.name), topFieldIds(schemaNode))
    var committed = false
    var snapId = 0L
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      if (curVersion != version0)
        throw new java.util.ConcurrentModificationException(
          s"REPLACE TABLE conflict on $table: a concurrent writer " +
            s"committed metadata v$curVersion since this replace read " +
            s"v$version0 — aborted without committing (the staged " +
            "files are orphans); re-run against the new state")
      val rowBase = if (fv >= 3) nextRowIdOf(meta).getOrElse(0L) else 0L
      val (added, rowNext) =
        if (fv >= 3) assignRowIds(staged, rowBase) else (staged, 0L)
      snapId = newSnapshotId()
      val nextSeq = if (fv >= 2) lastSeq0 + 1 else 0L
      val (mPath, mLen, mCount) = writeManifest(
        table, snapId, schemaNode.toString, added, pfs,
        specId = newSpecId, fv = fv)
      val ml = writeManifestList(
        table, snapId,
        Seq(ManifestRef(mPath, mLen, mCount, Some(snapId),
          specId = newSpecId,
          seq = if (fv >= 2) Some(nextSeq) else None)), fv = fv)
      val ts = System.currentTimeMillis()
      val cur = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L)
      val newSnap = snapshotNode(
        snapId, cur, ts, ml, added.size, added.map(_.records).sum,
        if (fv >= 2) Some(nextSeq) else None, operation = "replace",
        firstRowId = if (fv >= 3) Some(rowBase) else None,
        schemaId = Some(schemaId))
      // carried snapshots RETRO-STAMP their era's schema-id (the
      // pre-replace current schema read them all, evolution keeping
      // field-id compat) — without it, time travel across the swap
      // would project them under the replacement's unrelated schema
      val oldSchemaId =
        if (meta.has("current-schema-id"))
          meta.get("current-schema-id").asInt()
        else 0
      val snaps = meta.get("snapshots").elements().asScala
        .map(_.deepCopy[ObjectNode]()).toSeq
        .map { sn =>
          if (!sn.has("schema-id")) sn.put("schema-id", oldSchemaId)
          sn
        } :+ newSnap
      val log0 = (if (meta.has("snapshot-log"))
        meta.get("snapshot-log").elements().asScala.map(e =>
          (e.get("timestamp-ms").asLong(),
            e.get("snapshot-id").asLong())).toSeq
      else Nil) :+ ((ts, snapId))
      beforeCommit()
      val json = buildMetadata(
        table, meta.get("table-uuid").asText(), schemaNode, lastId,
        snaps, snapId, log0, pfs,
        schemaHistory = schemaHistoryOf(meta) :+ schemaNode,
        formatVersion = fv, lastSequenceNumber = nextSeq,
        extraSpecs = allSpecs, properties = propsOf(meta),
        refs = refsOf(meta),
        nextRowId = if (fv >= 3) Some(rowNext) else None,
        defaultSpecId = newSpecId)
      committed = claim(table, curVersion + 1, json)
      if (!committed)
        throw new java.util.ConcurrentModificationException(
          s"REPLACE TABLE conflict on $table: lost the metadata claim " +
            "to a concurrent writer — aborted; re-run against the new " +
            "state")
    }
    snapId
  }

  /** Create a FORMAT-VERSION 3 table (row lineage on from the first
    * commit; row-level deletes go through [[deleteWhereDv]] puffin
    * deletion vectors). Identity partitioning only, like [[create]].
    */
  def createV3(
      df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Long =
    createWithSpec(df, table, partitionBy.map(c => ("identity", c)),
      formatVersion = 3)

  /** df.schema must MATCH the table schema (names + types, order
    * included) before a single byte is staged: real Iceberg validates
    * appends against the table schema, and a renamed/retyped column
    * committed here would later read as silent nulls — the exact
    * wrong-rows failure this module's contract refuses.
    */
  private def requireSchemaMatch(df: DataFrame, table: String): Unit = {
    val tbl = IcebergTable.schemaOf(IcebergTable.metadataJson(table))
    val got = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val want = tbl.fields.map(f => (f.name, f.dataType)).toSeq
    require(got == want,
      s"append schema mismatch for $table:\n  table:  $want\n  append: $got\n" +
        "(names and types must match exactly; Iceberg schema evolution " +
        "is not in this writer's scope)")
  }

  /** Append `df` as a new snapshot: previous manifests carried
    * forward + one new ADDED manifest, the HadoopTableOperations
    * optimistic commit (re-read state and retry on a lost claim —
    * appends add disjoint files, so the retry is always safe).
    * Partitioned tables stage with the table's own identity spec.
    * Returns the new snapshot id.
    */
  def append(df: DataFrame, table: String): Long =
    appendTxn(df, table, None).get

  /** The last batch id `appId` committed to this table, from the
    * `graft.txn.<appId>` TABLE PROPERTY — carried by every commit and
    * immune to [[expireSnapshots]] (a summary-only watermark dies with
    * its snapshot, which is exactly when a restarted job would
    * double-commit). The reader half of the exactly-once handshake.
    */
  def lastBatchId(table: String, appId: String): Option[Long] =
    propsOf(IcebergTable.metadataJson(table))
      .get(s"graft.txn.$appId").map(_.toLong)

  /** Exactly-once STREAMING SINK append — the
    * [[DeltaExport.appendBatch]] twin in the other format (use from
    * `foreachBatch((b, id) => IcebergExport.appendBatch(b, table,
    * appId, id))`): a replayed `batchId` at or below the committed
    * watermark is a NO-OP (its staged files are removed), otherwise
    * the data commit and the watermark update land in ONE metadata
    * claim — atomic, so a crash between them cannot split. The
    * watermark re-checks inside the claim-retry loop: two attempts of
    * the same batch racing after a driver failover resolve to one
    * commit. Returns the new snapshot id, or None for a replay.
    */
  def appendBatch(
      df: DataFrame, table: String, appId: String,
      batchId: Long): Option[Long] = {
    if (lastBatchId(table, appId).exists(_ >= batchId)) return None
    appendTxn(df, table, Some((appId, batchId)))
  }

  private def appendTxn(
      df: DataFrame, table: String,
      txn: Option[(String, Long)],
      branch: Option[String] = None): Option[Long] = {
    requireSchemaMatch(df, table)
    val meta0 = IcebergTable.metadataJson(table)
    val pfs0 = partFieldsFromMeta(meta0)
    val added = stageIn(
      deriveCols(df, pfs0), table, pfs0.map(_.name),
      topFieldIds(IcebergTable.schemaNodeOf(meta0)))
    var committed = false
    var snapId = 0L
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      txn.foreach { case (appId, batchId) =>
        if (propsOf(meta).get(s"graft.txn.$appId").map(_.toLong)
          .exists(_ >= batchId)) {
          // a contender committed THIS batch meanwhile — clean the
          // staged files and report the no-op
          added.foreach(a => Files.deleteIfExists(Paths.get(a.absPath)))
          return None
        }
      }
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val refs = refsOf(meta)
      val mainSnapId = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L)
      // the append's BASE: the branch head when targeting a branch
      // (write-audit-publish staging), else the main current snapshot
      val curSnapId = branch match {
        case Some(b) =>
          val r = refs.getOrElse(b,
            throw new IllegalArgumentException(
              s"no branch $b on $table (createBranch first)"))
          require(r.tpe == "branch",
            s"ref $b is a ${r.tpe} — appends target branches, never tags")
          Some(r.snapshotId)
        case None => mainSnapId
      }
      val curSnap = curSnapId.flatMap { id =>
        meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong() == id)
      }
      val prevList = curSnap.flatMap(s =>
        Option(s.get("manifest-list")).map(_.asText()))
      snapId = newSnapshotId()
      val schemaNode =
        IcebergTable.schemaNodeOf(meta).deepCopy[ObjectNode]()
      val history = schemaHistoryOf(meta)
      val pfs = partFieldsFromMeta(meta)
      val (fv, lastSeq) = fvOf(meta)
      // v3 row lineage: this commit's files take explicit row ids
      // from the CURRENT next-row-id (re-derived per claim attempt —
      // a lost race means the winner advanced the watermark)
      val rowBase = if (fv >= 3) nextRowIdOf(meta).getOrElse(0L) else 0L
      val (addedIds, rowNext) =
        if (fv >= 3) assignRowIds(added, rowBase) else (added, 0L)
      val defSpec = defaultSpecIdOf(meta)
      // the staged files' hive layout followed the spec read BEFORE
      // staging — a concurrent updateSpec would silently mislabel
      // their partition values under the new spec's names
      require(defSpec == defaultSpecIdOf(meta0),
        s"the partition spec of $table changed (spec " +
          s"${defaultSpecIdOf(meta0)} → $defSpec) while this append " +
          "was staging: re-run against the new spec")
      val (mPath, mLen, mCount) =
        writeManifest(table, snapId, schemaNode.toString, addedIds, pfs,
          specId = defSpec, fv = fv)
      val ts = System.currentTimeMillis()
      val nextSeq = if (fv >= 2) lastSeq + 1 else 0L
      // v2: the new manifest carries the commit's sequence number so
      // its ADDED entries inherit it — equality deletes scope against
      // exactly this number (deleteSeq > dataSeq)
      val ml = writeManifestList(
        table, snapId,
        ManifestRef(mPath, mLen, mCount, Some(snapId), specId = defSpec,
          seq = if (fv >= 2) Some(nextSeq) else None) +:
          priorManifests(prevList), fv = fv)
      val newSnap = snapshotNode(
        snapId, curSnapId, ts, ml, added.size, added.map(_.records).sum,
        if (fv >= 2) Some(nextSeq) else None,
        firstRowId = if (fv >= 3) Some(rowBase) else None)
      val snaps = meta.get("snapshots").elements().asScala
        .map(_.deepCopy[ObjectNode]()).toSeq :+ newSnap
      val log0 = (if (meta.has("snapshot-log"))
        meta.get("snapshot-log").elements().asScala.map(e =>
          (e.get("timestamp-ms").asLong(), e.get("snapshot-id").asLong())).toSeq
      else Nil)
      val props = propsOf(meta) ++ txn.map { case (appId, batchId) =>
        s"graft.txn.$appId" -> batchId.toString
      }
      // a branch append moves ONLY the branch ref; main's current
      // snapshot and log are untouched (readers of the table see
      // nothing until fastForward publishes)
      val (curAfter, logAfter, refsAfter) = branch match {
        case Some(b) =>
          (mainSnapId.getOrElse(-1L), log0,
            // the branch head moves; its retention policy rides along
            refs + (b -> refs(b).copy(snapshotId = snapId)))
        case None => (snapId, log0 :+ ((ts, snapId)), refs)
      }
      val json = buildMetadata(
        table, meta.get("table-uuid").asText(), schemaNode,
        meta.get("last-column-id").asInt(), snaps, curAfter, logAfter,
        pfs, history, fv, nextSeq, extraSpecsOf(meta), props,
        refsAfter,
        nextRowId = if (fv >= 3) Some(rowNext) else None,
        defaultSpecId = defSpec)
      committed = claim(table, curVersion + 1, json)
    }
    Some(snapId)
  }

  /** Append `df` to a NAMED BRANCH (write-audit-publish staging): the
    * new snapshot's parent is the branch head and only the branch ref
    * moves — `main` readers see nothing until [[fastForward]]
    * publishes. Returns the new snapshot id.
    */
  def appendToBranch(df: DataFrame, table: String, branch: String): Long =
    appendTxn(df, table, None, Some(branch)).get

  /** The table's full schema history (v2 `schemas` array, or the v1
    * single schema) as mutable copies.
    */
  private def schemaHistoryOf(
      meta: com.fasterxml.jackson.databind.JsonNode): Seq[ObjectNode] =
    if (meta.has("schemas"))
      meta.get("schemas").elements().asScala
        .map(_.deepCopy[ObjectNode]()).toSeq
    else Seq(meta.get("schema").deepCopy[ObjectNode]())

  /** The table's `properties` map — carried through every commit
    * (losing it would drop the streaming-sink txn watermarks below).
    */
  private def propsOf(
      meta: com.fasterxml.jackson.databind.JsonNode): Map[String, String] =
    if (meta.has("properties")) {
      val o = meta.get("properties")
      o.fieldNames().asScala.map(k => k -> o.get(k).asText()).toMap
    } else Map.empty

  /** A named snapshot ref (the spec's `refs` map value): branch or
    * tag, with its OPTIONAL per-ref retention policy
    * (`min-snapshots-to-keep` / `max-snapshot-age-ms` apply to a
    * branch's ancestor line, `max-ref-age-ms` retires the ref itself)
    * — [[expireSnapshots]] honors all three (r15; previously every
    * ref pinned unconditionally and tags accumulated forever).
    */
  private[sources] case class Ref(
      snapshotId: Long, tpe: String,
      minSnapshotsToKeep: Option[Int] = None,
      maxSnapshotAgeMs: Option[Long] = None,
      maxRefAgeMs: Option[Long] = None)

  /** The table's named snapshot refs (branches/tags) — carried
    * through every commit like properties; losing them would orphan
    * staged write-audit-publish branches.
    */
  private[sources] def refsOf(
      meta: com.fasterxml.jackson.databind.JsonNode)
      : Map[String, Ref] =
    if (meta.has("refs")) {
      val o = meta.get("refs")
      o.fieldNames().asScala.map { k =>
        val r = o.get(k)
        k -> Ref(
          r.get("snapshot-id").asLong(),
          Option(r.get("type")).map(_.asText()).getOrElse("branch"),
          Option(r.get("min-snapshots-to-keep")).map(_.asInt()),
          Option(r.get("max-snapshot-age-ms")).map(_.asLong()),
          Option(r.get("max-ref-age-ms")).map(_.asLong()))
      }.toMap
    } else Map.empty

  /** Serialize `refs` into `root`'s `refs` object node (shared by
    * [[buildMetadata]] and [[updateRefs]] — retention fields must
    * survive EVERY commit path or a policy silently vanishes).
    */
  private def putRefs(root: ObjectNode, refs: Map[String, Ref]): Unit =
    if (refs.nonEmpty) {
      val refsNode = root.putObject("refs")
      refs.toSeq.sortBy(_._1).foreach { case (n, r) =>
        val rn = refsNode.putObject(n)
        rn.put("snapshot-id", r.snapshotId)
        rn.put("type", r.tpe)
        r.minSnapshotsToKeep.foreach(v => rn.put("min-snapshots-to-keep", v))
        r.maxSnapshotAgeMs.foreach(v => rn.put("max-snapshot-age-ms", v))
        r.maxRefAgeMs.foreach(v => rn.put("max-ref-age-ms", v))
      }
    }

  /** Partition specs beyond the default spec 0 (e.g. the unpartitioned
    * delete spec) — every commit must carry them forward: carried
    * delete manifests still declare their spec-id.
    */
  /** The metadata's default-spec-id (0 when absent — v1 tables). */
  private def defaultSpecIdOf(
      meta: com.fasterxml.jackson.databind.JsonNode): Int =
    if (meta.has("default-spec-id")) meta.get("default-spec-id").asInt()
    else 0

  private def extraSpecsOf(
      meta: com.fasterxml.jackson.databind.JsonNode): Seq[ObjectNode] = {
    val defId = defaultSpecIdOf(meta)
    if (meta.has("partition-specs"))
      meta.get("partition-specs").elements().asScala
        .filter(_.get("spec-id").asInt() != defId)
        .map(_.deepCopy[ObjectNode]()).toSeq
    else Nil
  }

  /** The spec-id delete manifests declare: 0 on an unpartitioned table
    * (spec 0 is already the empty struct); on a partitioned table a
    * DEDICATED unpartitioned spec (id = max existing + 1 on first use)
    * — the delete files are table-global, and a manifest-list row
    * declaring spec 0 with an empty partition struct would make a
    * spec-compliant reader project spec 0's partition type and reject
    * or misread the delete manifest.
    */
  private def deleteSpec(
      meta: com.fasterxml.jackson.databind.JsonNode,
      pfs: Seq[PartField]): (Int, Seq[ObjectNode]) = {
    val carried = extraSpecsOf(meta)
    if (pfs.isEmpty) (0, carried)
    else carried.find(_.get("fields").isEmpty) match {
      case Some(s) => (s.get("spec-id").asInt(), carried)
      case None =>
        val id = (0 +: carried.map(_.get("spec-id").asInt())).max + 1
        val s = mapper.createObjectNode()
        s.put("spec-id", id)
        s.putArray("fields")
        (id, carried :+ s)
    }
  }

  /** Commit a SCHEMA-EVOLUTION metadata version: `mutate` receives a
    * copy of the current schema node (plus the current last-column-id)
    * and returns the new node + new last-column-id; the new schema
    * gets the next schema-id and joins the `schemas` history, data and
    * snapshots untouched. The reader resolves old data files through
    * their manifests' embedded write-time schemas by field-id, so
    * evolution never rewrites a byte of data.
    */
  private def evolveSchema(
      table: String)(
      mutate: (ObjectNode, Int) => (ObjectNode, Int)): Unit = {
    var committed = false
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val history = schemaHistoryOf(meta)
      val cur = IcebergTable.schemaNodeOf(meta).deepCopy[ObjectNode]()
      val (next, lastId) = mutate(cur, meta.get("last-column-id").asInt())
      val nextId = history
        .map(s => if (s.has("schema-id")) s.get("schema-id").asInt() else 0)
        .max + 1
      next.put("schema-id", nextId)
      val curSnapId = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L).getOrElse(-1L)
      val snaps = Option(meta.get("snapshots")).toSeq
        .flatMap(_.elements().asScala.map(_.deepCopy[ObjectNode]()).toSeq)
      val log = (if (meta.has("snapshot-log"))
        meta.get("snapshot-log").elements().asScala.map(e =>
          (e.get("timestamp-ms").asLong(), e.get("snapshot-id").asLong())).toSeq
      else Nil)
      // partition spec source-ids survive renames; every spec field's
      // source must still exist in the NEW schema, and IDENTITY
      // fields' names track their source's rename (Iceberg's identity
      // naming); transform fields keep their own names
      val pfs = partFieldsFromMeta(meta).map { pf =>
        val newField = next.get("fields").elements().asScala
          .find(_.get("id").asInt() == pf.sourceId)
          .getOrElse(throw new IllegalArgumentException(
            s"cannot drop/lose partition source column ${pf.sourceName} " +
              s"(field-id ${pf.sourceId}): the partition spec references it"))
        val newSrc = newField.get("name").asText()
        if (pf.transform == "identity") pf.copy(name = newSrc, srcName = newSrc)
        else pf.copy(srcName = newSrc)
      }
      val (fv, lastSeq) = fvOf(meta)
      val json = buildMetadata(
        table, meta.get("table-uuid").asText(), next, lastId,
        snaps, curSnapId, log, pfs, history :+ next, fv, lastSeq,
        extraSpecsOf(meta), propsOf(meta), refsOf(meta),
        nextRowIdOf(meta), defaultSpecId = defaultSpecIdOf(meta))
      committed = claim(table, curVersion + 1, json)
    }
  }

  /** RENAME a top-level column — metadata-only (the field-id is the
    * identity; no data file is touched; old files resolve through
    * their manifests' embedded schemas).
    */
  def renameColumn(table: String, from: String, to: String): Unit =
    evolveSchema(table) { (s, lastId) =>
      val f = s.get("fields").elements().asScala
        .find(_.get("name").asText() == from)
        .getOrElse(throw new IllegalArgumentException(
          s"no column $from to rename"))
      require(!s.get("fields").elements().asScala
        .exists(_.get("name").asText() == to),
        s"column $to already exists")
      f.asInstanceOf[ObjectNode].put("name", to)
      (s, lastId)
    }

  /** ADD a nullable top-level column (new field-id = last-column-id+1;
    * files written before it read null — the spec's answer).
    */
  def addColumn(
      table: String, name: String, dt: DataType): Unit =
    addColumnWithDefault(table, name, dt, None)

  /** [[addColumn]] with a v3 COLUMN DEFAULT: `initial-default` is
    * what rows written BEFORE the column existed read back (the
    * spec's answer instead of null) and `write-default` what writers
    * that omit the column fill — both stamped on the new field.
    * Defaults are a FORMAT-VERSION 3 feature per the spec; v1/v2
    * tables refuse. This engine's own appends still present the full
    * schema explicitly ([[requireSchemaMatch]]); the write-default is
    * for spec-compliant foreign writers.
    */
  def addColumn(
      table: String, name: String, dt: DataType, default: Any): Unit =
    addColumnWithDefault(table, name, dt, Some(default))

  private def addColumnWithDefault(
      table: String, name: String, dt: DataType,
      default: Option[Any]): Unit = {
    if (default.isDefined) {
      val fv = IcebergTable.metadataJson(table)
        .get("format-version").asInt()
      require(fv >= 3,
        s"column defaults are a format-version 3 feature " +
          s"($table is v$fv): refused")
    }
    evolveSchema(table) { (s, lastId) =>
      require(!s.get("fields").elements().asScala
        .exists(_.get("name").asText() == name),
        s"column $name already exists")
      var last = lastId
      val nextId = () => { last += 1; last }
      val fn = mapper.createObjectNode()
      fn.put("id", nextId())
      fn.put("name", name)
      fn.put("required", false)
      fn.set[ObjectNode]("type", icebergType(dt, nextId))
      default.foreach { d =>
        def put(key: String): Unit = d match {
          case v: Long => fn.put(key, v)
          case v: Int => fn.put(key, v)
          case v: Double => fn.put(key, v)
          case v: Float => fn.put(key, v)
          case v: String => fn.put(key, v)
          case v: Boolean => fn.put(key, v)
          case other => throw new IllegalArgumentException(
            s"unsupported default literal type " +
              s"${other.getClass.getSimpleName}")
        }
        put("initial-default")
        put("write-default")
      }
      s.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("fields")
        .add(fn)
      (s, last)
    }
  }

  /** PROMOTE a top-level column's type — metadata-only (r14),
    * restricted to the spec's LOSSLESS promotions (int → long,
    * float → double, decimal precision widening at the same scale):
    * no data file is rewritten; old files keep their narrower bytes
    * and the reader widens them through its promotable() cast (the
    * same field-id era resolution every other evolution uses), new
    * appends must present the promoted type
    * ([[requireSchemaMatch]]). Anything else — narrowing, scale
    * changes, cross-kind casts — is refused loudly rather than
    * committed as a schema real readers would miscast under.
    */
  def evolveType(table: String, name: String, to: DataType): Unit =
    evolveSchema(table) { (s, lastId) =>
      val f = s.get("fields").elements().asScala
        .find(_.get("name").asText() == name)
        .getOrElse(throw new IllegalArgumentException(
          s"no column $name to promote"))
      val fromNode = f.get("type")
      require(fromNode.isTextual,
        s"type promotion of nested column $name is out of scope")
      val fromDt = IcebergTable.toSparkType(fromNode)
      val lossless = (fromDt, to) match {
        case (IntegerType, LongType) => true
        case (FloatType, DoubleType) => true
        case (a: DecimalType, b: DecimalType) =>
          b.scale == a.scale && b.precision > a.precision
        case _ => false
      }
      require(lossless,
        s"cannot promote $name: $fromDt -> $to is not one of the " +
          "spec's lossless promotions (int->long, float->double, " +
          "decimal precision widening at the same scale) — refused " +
          "rather than committing a schema that would miscast")
      f.asInstanceOf[ObjectNode]
        .set[ObjectNode]("type", icebergType(to, () => lastId))
      (s, lastId)
    }

  /** DROP a top-level column — metadata-only; the column simply stops
    * being projected (old files keep their bytes; a re-ADD gets a NEW
    * field-id and reads null from them, never the dropped values —
    * the spec's id-identity rule). Partition source columns are
    * refused (the spec still references them).
    */
  def dropColumn(table: String, name: String): Unit =
    evolveSchema(table) { (s, lastId) =>
      val fields = s.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("fields")
      val idx = (0 until fields.size())
        .find(i => fields.get(i).get("name").asText() == name)
        .getOrElse(throw new IllegalArgumentException(
          s"no column $name to drop"))
      fields.remove(idx)
      (s, lastId)
    }

  /** Commit a REFS-ONLY metadata version: `f` maps the current refs
    * map to the next one (validated against the current snapshots);
    * everything else carries forward verbatim (deep copy, like
    * [[expireSnapshots]]).
    */
  private def updateRefs(table: String)(
      f: (Map[String, Ref],
        com.fasterxml.jackson.databind.JsonNode)
        => Map[String, Ref]): Unit = {
    var committed = false
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val next = f(refsOf(meta), meta)
      val root = meta.deepCopy[ObjectNode]()
      root.remove("refs")
      putRefs(root, next)
      root.put("last-updated-ms", System.currentTimeMillis())
      committed = claim(table, curVersion + 1,
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    }
  }

  private def requireSnapshotExists(
      meta: com.fasterxml.jackson.databind.JsonNode, id: Long): Unit =
    require(Option(meta.get("snapshots")).exists(_.elements().asScala
      .exists(_.get("snapshot-id").asLong() == id)),
      s"snapshot $id does not exist (expired or never committed)")

  /** Create a BRANCH ref at `from` (default: the current snapshot) —
    * the write-audit-publish staging target. Metadata-only.
    */
  def createBranch(
      table: String, name: String, from: Option[Long] = None): Unit =
    updateRefs(table) { (refs, meta) =>
      require(!refs.contains(name), s"ref $name already exists")
      val base = from.orElse(
        Option(meta.get("current-snapshot-id")).map(_.asLong())
          .filter(_ != -1L))
        .getOrElse(throw new IllegalStateException(
          "cannot branch an empty table (no current snapshot)"))
      requireSnapshotExists(meta, base)
      refs + (name -> Ref(base, "branch"))
    }

  /** Create a TAG ref — an immutable named snapshot pin
    * ([[expireSnapshots]] keeps every ref'd snapshot alive).
    */
  def createTag(table: String, name: String, snapshotId: Long): Unit =
    updateRefs(table) { (refs, meta) =>
      require(!refs.contains(name), s"ref $name already exists")
      requireSnapshotExists(meta, snapshotId)
      refs + (name -> Ref(snapshotId, "tag"))
    }

  /** ALTER TABLE SET TBLPROPERTIES — merge `props` into the table's
    * `properties` map as a metadata-only commit (the Delta twin is
    * [[DeltaExport.setProperties]]). Everything else carries forward
    * verbatim. `history.expire.*` keys here become the table-level
    * retention defaults [[expireSnapshots]] applies to branches
    * without their own policy.
    */
  def setProperties(table: String, props: Map[String, String]): Unit = {
    var committed = false
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val root = meta.deepCopy[ObjectNode]()
      val merged = propsOf(meta) ++ props
      val pn = root.putObject("properties")
      merged.toSeq.sortBy(_._1).foreach { case (k, v) => pn.put(k, v) }
      root.put("last-updated-ms", System.currentTimeMillis())
      committed = claim(table, curVersion + 1,
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    }
  }

  /** Set a ref's RETENTION POLICY (the spec's optional per-ref
    * fields): `maxRefAgeMs` retires the whole ref once the snapshot
    * it points at is older, `minSnapshotsToKeep`/`maxSnapshotAgeMs`
    * bound a branch's kept ancestor line (count overrides age).
    * `None` leaves a field unset (table `history.expire.*` properties
    * apply as defaults, else the ref pins forever/whole-line —
    * [[expireSnapshots]] documents the full rule). Metadata-only.
    */
  def setRefRetention(
      table: String, name: String,
      minSnapshotsToKeep: Option[Int] = None,
      maxSnapshotAgeMs: Option[Long] = None,
      maxRefAgeMs: Option[Long] = None): Unit =
    updateRefs(table) { (refs, _) =>
      val r = refs.getOrElse(name,
        throw new IllegalArgumentException(s"no ref $name"))
      refs + (name -> r.copy(
        minSnapshotsToKeep = minSnapshotsToKeep,
        maxSnapshotAgeMs = maxSnapshotAgeMs,
        maxRefAgeMs = maxRefAgeMs))
    }

  /** Drop a branch or tag ref; its snapshots become expirable. */
  def dropRef(table: String, name: String): Unit =
    updateRefs(table) { (refs, _) =>
      require(refs.contains(name), s"no ref $name to drop")
      refs - name
    }

  /** PUBLISH a branch: fast-forward `main` (current-snapshot-id) to
    * the branch head — the write-audit-publish commit. Requires main
    * to be an ANCESTOR of the head (a true fast-forward; anything
    * else would need a merge, out of scope like every engine's
    * fast_forward). The branch ref survives (Iceberg's behavior);
    * drop it separately. The walked branch-line snapshots join the
    * snapshot-log in commit order.
    */
  def fastForward(table: String, branch: String): Unit = {
    var committed = false
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val refs = refsOf(meta)
      val bref = refs.getOrElse(branch,
        throw new IllegalArgumentException(s"no ref $branch"))
      val head = bref.snapshotId
      require(bref.tpe == "branch",
        s"ref $branch is a ${bref.tpe}, not a branch")
      val cur = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L)
      val byId = Option(meta.get("snapshots")).toSeq
        .flatMap(_.elements().asScala)
        .map(s => s.get("snapshot-id").asLong() -> s).toMap
      // walk head → parents until main's current snapshot: the
      // branch-line path, newest first
      var path = List.empty[com.fasterxml.jackson.databind.JsonNode]
      var at: Option[Long] = Some(head)
      while (at.isDefined && at != cur) {
        val node = byId.getOrElse(at.get,
          throw new IllegalStateException(
            s"branch lineage references expired snapshot ${at.get}"))
        path = node :: path
        at = Option(node.get("parent-snapshot-id")).map(_.asLong())
      }
      require(at == cur || cur.isEmpty,
        s"main is not an ancestor of $branch's head — not a " +
          "fast-forward (cherryPick merges a diverged append-only " +
          "branch)")
      val root = meta.deepCopy[ObjectNode]()
      root.put("current-snapshot-id", head)
      val logArr = root.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("snapshot-log")
      path.foreach { s =>
        val e = mapper.createObjectNode()
        e.put("timestamp-ms", s.get("timestamp-ms").asLong())
        e.put("snapshot-id", s.get("snapshot-id").asLong())
        logArr.add(e)
      }
      root.put("last-updated-ms", System.currentTimeMillis())
      committed = claim(table, curVersion + 1,
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    }
  }

  /** MERGE a DIVERGED branch into main by CHERRY-PICK (r15 — the
    * [[fastForward]] refusal's other half, the shape every engine
    * ships as `cherrypick_snapshot`): the branch's net-new APPEND
    * work lands on main as ONE new append snapshot whose manifest
    * list is main's current manifests plus the manifests the branch
    * line added since it forked — zero data bytes move, and the
    * cherry-picked manifests are RE-SEQUENCED to this commit's
    * sequence number at the list-row level (append entries carry
    * null seqs by inheritance, so the re-scope is complete: main's
    * older equality deletes do not apply to the picked data, exactly
    * as if it were appended now).
    *
    * The conflict posture mirrors the compaction victim check —
    * refuse loudly on anything that is NOT pure append divergence:
    * a branch-line snapshot whose operation isn't `append` (a
    * rewrite/delete on the branch can overlap main's files), a
    * branch line that DROPPED one of the fork point's manifests, or
    * a picked manifest that isn't data content. v3 row-lineage
    * tables pick correctly (r15): the picked manifests REWRITE with
    * fresh `first_row_id`s continuing from main's `next-row-id`
    * (branch-time ids could collide with ids main assigned since
    * the fork), so the picked rows are NEW rows to lineage
    * consumers.
    *
    * The branch ref survives (Iceberg's cherrypick behavior); drop
    * it separately. Returns the new main snapshot id, or None when
    * the branch has nothing new.
    */
  def cherryPick(table: String, branch: String): Option[Long] = {
    var committed = false
    var newId = 0L
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val refs = refsOf(meta)
      val bref = refs.getOrElse(branch,
        throw new IllegalArgumentException(s"no ref $branch"))
      require(bref.tpe == "branch",
        s"ref $branch is a ${bref.tpe}, not a branch")
      val (fv, lastSeq) = fvOf(meta)
      val cur = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L)
        .getOrElse(throw new IllegalStateException(
          s"main of $table has no current snapshot — publish the " +
            "branch with fastForward instead"))
      val byId = Option(meta.get("snapshots")).toSeq
        .flatMap(_.elements().asScala)
        .map(s => s.get("snapshot-id").asLong() -> s).toMap
      // main's ancestor line
      var mainLine = Set.empty[Long]
      var m = Option(cur)
      while (m.isDefined) {
        mainLine += m.get
        m = byId.get(m.get).flatMap(n =>
          Option(n.get("parent-snapshot-id")).map(_.asLong()))
      }
      if (mainLine(bref.snapshotId)) return None // nothing new on branch
      // branch line head → fork (first main ancestor)
      var line = List.empty[com.fasterxml.jackson.databind.JsonNode]
      var at: Option[Long] = Some(bref.snapshotId)
      while (at.isDefined && !mainLine(at.get)) {
        val node = byId.getOrElse(at.get,
          throw new IllegalStateException(
            s"branch lineage references expired snapshot ${at.get}"))
        line = node :: line // oldest-first
        at = Option(node.get("parent-snapshot-id")).map(_.asLong())
      }
      val fork = at.getOrElse(throw new IllegalArgumentException(
        s"$branch shares no ancestor with main — unrelated histories " +
          "cannot cherry-pick"))
      line.foreach { s =>
        val op = Option(s.get("summary")).flatMap(n =>
          Option(n.get("operation")).map(_.asText())).getOrElse("append")
        require(op == "append",
          s"cherryPick refused: branch snapshot " +
            s"${s.get("snapshot-id").asLong()} is a `$op`, not an " +
            "append — its rewrite may overlap files main also touched " +
            "(the compaction victim-check posture); merge by hand")
      }
      def listOf(id: Long): Option[String] = byId.get(id)
        .flatMap(s => Option(s.get("manifest-list")).map(_.asText()))
      val headManifests = priorManifests(listOf(bref.snapshotId))
      val forkManifests = priorManifests(listOf(fork))
      val headPaths = headManifests.map(_.path).toSet
      forkManifests.foreach(fm => require(headPaths(fm.path),
        s"cherryPick refused: branch dropped fork manifest ${fm.path} " +
          "— not pure append divergence"))
      val lineIds = line.map(_.get("snapshot-id").asLong()).toSet
      // skip manifests ALREADY on main — a re-run of the same pick
      // (the branch head never becomes a main ancestor) must be a
      // no-op, not a duplication. Two provenance checks: path
      // identity (v1/v2 picks carry manifests verbatim) AND
      // added-snapshot-id (a v3 pick REWRITES the manifests for
      // lineage, changing their paths but keeping the branch
      // snapshot's id — path identity alone would re-pick them)
      val mainManifests = priorManifests(listOf(cur))
      val mainPaths = mainManifests.map(_.path).toSet
      val mainPickedIds =
        mainManifests.flatMap(_.snapId).toSet.intersect(lineIds)
      val picked = headManifests.filter(_.snapId.exists(lineIds))
        .filterNot(p =>
          mainPaths(p.path) || p.snapId.exists(mainPickedIds))
      picked.foreach(p => require(p.content == 0,
        s"cherryPick refused: branch manifest ${p.path} carries " +
          "deletes — append-only branches only"))
      if (picked.isEmpty) return None
      newId = newSnapshotId()
      val ts = System.currentTimeMillis()
      val nextSeq = if (fv >= 2) lastSeq + 1 else 0L
      // v3 ROW LINEAGE (r15, the refusal lifted): branch appends
      // assigned explicit first_row_ids from the BRANCH-time
      // watermark, which can collide with ids main assigned since
      // the fork — so the picked manifests are REWRITTEN (metadata
      // only, zero data bytes) with fresh first_row_ids continuing
      // from MAIN's next-row-id, exactly as if the files were
      // appended now. Entries without an explicit first_row_id
      // cannot appear here (materialized-lineage files only come
      // from rewrites, which the append-only walk refused).
      val rowBase = if (fv >= 3) nextRowIdOf(meta).getOrElse(0L) else 0L
      val (pickedFinal, rowNext) =
        if (fv < 3) (picked, 0L)
        else {
          var next = rowBase
          val patched = picked.map { p =>
            val (np, nlen, nn) =
              rewriteManifestRowIds(table, p.path, next)
            next = nn
            p.copy(path = np, length = nlen)
          }
          (patched, next)
        }
      // re-sequence the picked manifests to THIS commit; keep their
      // spec-ids and added counts (informational) verbatim
      val reSeqed = pickedFinal.map(p =>
        p.copy(seq = if (fv >= 2) Some(nextSeq) else None,
          minSeq = if (fv >= 2) Some(nextSeq) else None))
      val ml = writeManifestList(
        table, newId, reSeqed ++ priorManifests(listOf(cur)), fv = fv)
      val addedFiles = picked.map(_.added).sum
      val addedRecords = line.map(s =>
        Option(s.get("summary")).flatMap(n =>
          Option(n.get("added-records")).map(_.asText().toLong))
          .getOrElse(0L)).sum
      val newSnap = snapshotNode(
        newId, Some(cur), ts, ml, addedFiles, addedRecords,
        if (fv >= 2) Some(nextSeq) else None,
        firstRowId = if (fv >= 3) Some(rowBase) else None)
      val snaps = meta.get("snapshots").elements().asScala
        .map(_.deepCopy[ObjectNode]()).toSeq :+ newSnap
      val log0 = (if (meta.has("snapshot-log"))
        meta.get("snapshot-log").elements().asScala.map(e =>
          (e.get("timestamp-ms").asLong(),
            e.get("snapshot-id").asLong())).toSeq
      else Nil) :+ ((ts, newId))
      val json = buildMetadata(
        table, meta.get("table-uuid").asText(),
        IcebergTable.schemaNodeOf(meta).deepCopy[ObjectNode](),
        meta.get("last-column-id").asInt(), snaps, newId, log0,
        partFieldsFromMeta(meta), schemaHistoryOf(meta), fv, nextSeq,
        extraSpecsOf(meta), propsOf(meta), refs,
        nextRowId =
          if (fv >= 3) Some(math.max(rowNext, nextRowIdOf(meta)
            .getOrElse(0L))) else None,
        defaultSpecId = defaultSpecIdOf(meta))
      committed = claim(table, curVersion + 1, json)
    }
    Some(newId)
  }

  /** Copy one manifest with its ADDED data entries' `first_row_id`
    * re-assigned from `base` (each entry advances by its
    * record_count) — the v3 cherry-pick's lineage re-scope. Generic
    * avro copy: the source's embedded writer schema and key-value
    * metadata carry verbatim, only the id field changes. Entries
    * without an explicit first_row_id refuse (this writer cannot
    * know their id source). Returns (new path, length, next base).
    */
  private def rewriteManifestRowIds(
      table: String, srcPath: String, base: Long): (String, Long, Long) = {
    val src = new File(srcPath.replaceFirst("^file:/*", "/"))
    val r = new DataFileReader[GenericRecord](
      src, new GenericDatumReader[GenericRecord]())
    try {
      val schema = r.getSchema
      val out = metaDir(table)
        .resolve(s"${java.util.UUID.randomUUID()}-m0.avro")
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      r.getMetaKeys.asScala.foreach { k =>
        if (!k.startsWith("avro.")) w.setMeta(k, r.getMeta(k))
      }
      w.create(schema, out.toFile)
      var next = base
      try {
        r.iterator().asScala.foreach { e =>
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val status = e.get("status").toString.toInt
          if (status != 2) {
            val fld = df.getSchema.getField("first_row_id")
            require(fld != null && df.get(fld.pos()) != null,
              s"cherryPick: manifest $srcPath entry without an " +
                "explicit first_row_id — cannot re-scope its lineage")
            df.put(fld.pos(), Long.box(next))
            next += df.get("record_count").toString.toLong
          }
          w.append(e)
        }
      } finally w.close()
      (out.toAbsolutePath.toString, Files.size(out), next)
    } finally r.close()
  }

  /** PARTITION EVOLUTION — replace the table's DEFAULT partition
    * spec (Iceberg's flagship feature: re-partition WITHOUT
    * rewriting a byte). Metadata-only commit: the new spec joins
    * `partition-specs` with a fresh spec-id and becomes
    * `default-spec-id`; every existing manifest keeps the spec its
    * files were written under (its own embedded `partition-spec`
    * metadata), and FUTURE appends stage under the new layout. The
    * reader reconstructs identity columns PER FILE ERA — a column
    * identity-partitioned in one era reads from partition metadata
    * there and from the data files everywhere else. New partition
    * field-ids continue past `last-partition-id` (unique across
    * specs, the spec's rule). `spec` uses [[createWithSpec]]'s
    * (transform, source column) grammar; empty = evolve to
    * UNPARTITIONED. Returns the new spec-id.
    */
  def updateSpec(table: String, spec: Seq[(String, String)]): Int = {
    var committed = false
    var newId = -1
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val schemaNode =
        IcebergTable.schemaNodeOf(meta).deepCopy[ObjectNode]()
      val schema = IcebergTable.schemaOf(meta)
      val ids = topFieldIds(schemaNode)
      val allSpecs: Seq[ObjectNode] =
        if (meta.has("partition-specs"))
          meta.get("partition-specs").elements().asScala
            .map(_.deepCopy[ObjectNode]()).toSeq
        else { // foreign v1 legacy form: lift partition-spec to spec 0
          val sp = mapper.createObjectNode()
          sp.put("spec-id", 0)
          sp.set[ObjectNode]("fields",
            Option(meta.get("partition-spec"))
              .map(_.deepCopy[com.fasterxml.jackson.databind.JsonNode]())
              .getOrElse(mapper.createArrayNode())
              .asInstanceOf[com.fasterxml.jackson.databind.JsonNode])
          Seq(sp)
        }
      newId = allSpecs.map(_.get("spec-id").asInt()).max + 1
      val lastPid = Option(meta.get("last-partition-id"))
        .map(_.asInt()).getOrElse(999)
      val pfs = spec.zipWithIndex.map { case ((transform, src), i) =>
        require(ids.contains(src),
          s"partition source $src is not a top-level schema column")
        val vt = transformValueType(transform, schema(src).dataType)
        avroPartType(vt) // validates the value type, throws with the list
        PartField(transformFieldName(transform, src), ids(src),
          lastPid + 1 + i, vt, transform, src)
      }
      val curSnapId = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L).getOrElse(-1L)
      val snaps = Option(meta.get("snapshots")).toSeq
        .flatMap(_.elements().asScala.map(_.deepCopy[ObjectNode]()).toSeq)
      val log = (if (meta.has("snapshot-log"))
        meta.get("snapshot-log").elements().asScala.map(e =>
          (e.get("timestamp-ms").asLong(),
            e.get("snapshot-id").asLong())).toSeq
      else Nil)
      val (fv, lastSeq) = fvOf(meta)
      val json = buildMetadata(
        table, meta.get("table-uuid").asText(), schemaNode,
        meta.get("last-column-id").asInt(), snaps, curSnapId, log,
        pfs, schemaHistoryOf(meta), fv, lastSeq,
        extraSpecs = allSpecs,
        properties = propsOf(meta),
        refs = refsOf(meta),
        nextRowId = nextRowIdOf(meta),
        defaultSpecId = newId)
      committed = claim(table, curVersion + 1, json)
    }
    newId
  }

  /** ROLLBACK — set the current snapshot back to an ANCESTOR of the
    * current one ([[DeltaExport.restore]]'s analog; Iceberg's
    * `rollback_to_snapshot` procedure). METADATA-ONLY: no file moves,
    * no rewrites — the rolled-back-over snapshots stay readable by id
    * (and expirable) and the snapshot-log gains a new entry for the
    * target, so history records when it became current AGAIN. A
    * non-ancestor target refuses (that is `set_current_snapshot`'s
    * cherry-pick territory, out of scope like a branch merge).
    */
  def rollbackTo(table: String, snapshotId: Long): Unit = {
    var committed = false
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val cur = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L)
        .getOrElse(throw new IllegalStateException(
          s"cannot roll back $table: no current snapshot"))
      require(cur != snapshotId,
        s"$table is already at snapshot $snapshotId")
      val byId = Option(meta.get("snapshots")).toSeq
        .flatMap(_.elements().asScala)
        .map(s => s.get("snapshot-id").asLong() -> s).toMap
      require(byId.contains(snapshotId),
        s"snapshot $snapshotId not found (expired or never existed)")
      // ancestry walk: current → parents must reach the target
      var at: Option[Long] = Some(cur)
      var found = false
      while (at.isDefined && !found) {
        if (at.contains(snapshotId)) found = true
        else at = byId.get(at.get)
          .flatMap(n => Option(n.get("parent-snapshot-id")).map(_.asLong()))
      }
      require(found,
        s"snapshot $snapshotId is not an ancestor of the current " +
          s"snapshot $cur: rollback only rewinds the main line " +
          "(cherry-picking a side line is out of scope)")
      val root = meta.deepCopy[ObjectNode]()
      root.put("current-snapshot-id", snapshotId)
      val logArr = root.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("snapshot-log")
      val e = mapper.createObjectNode()
      e.put("timestamp-ms", System.currentTimeMillis())
      e.put("snapshot-id", snapshotId)
      logArr.add(e)
      root.put("last-updated-ms", System.currentTimeMillis())
      committed = claim(table, curVersion + 1,
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    }
  }

  /** EXPIRE SNAPSHOTS — the Iceberg tier's retention op
    * ([[DeltaExport.vacuum]]'s analog): commit a metadata version
    * keeping only the newest `keepLast` snapshots (the current one
    * always survives), then delete the files ONLY the expired
    * snapshots referenced — the exact set expired-refs MINUS
    * kept-refs, so an in-flight append's fresh files (referenced by
    * nothing we expired) are never candidates. Data-file deletion is
    * further restricted to the writer's own `data/` directory:
    * UniForm-converted tables share their files WITH the Delta log,
    * whose own vacuum owns their lifecycle. Forfeits time travel to
    * the expired snapshots (their ids now throw), like every engine's
    * expire. Returns the deleted paths.
    */
  /** METADATA-FILE cleanup (r15) — Iceberg's
    * `write.metadata.previous-versions-max` maintenance, the
    * [[DeltaExport.cleanupLogs]] twin: delete `v<N>.metadata.json`
    * files older than the newest `keepLast`. Safe by construction —
    * each metadata version is a COMPLETE snapshot-of-state (unlike
    * Delta's incremental commits), so readers only ever need the
    * current one; snapshot time travel resolves through the CURRENT
    * metadata's `snapshots` array, never old metadata files. The
    * version hint refreshes to the discovered current first, so a
    * stale hint can never point at a deleted version (and the
    * discovery's max-scan fallback covers even that). Returns the
    * deleted file names.
    */
  def cleanupMetadata(table: String, keepLast: Int = 1): Seq[String] = {
    require(keepLast >= 1, "must keep the current metadata version")
    val cur = IcebergTable.currentMetadataVersion(table)
    val dir = metaDir(table)
    val hintTmp = dir.resolve(s".hint-${java.util.UUID.randomUUID()}")
    Files.write(hintTmp, cur.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(hintTmp, dir.resolve("version-hint.text"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val bound = cur - keepLast + 1
    val re = "^v(\\d+)\\.metadata\\.json$".r
    val victims = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .flatMap(n => re.findFirstMatchIn(n).map(m => (m.group(1).toInt, n)))
        .filter(_._1 < bound).map(_._2).toVector.sorted
      finally s.close()
    }
    victims.foreach(n => Files.deleteIfExists(dir.resolve(n)))
    victims
  }

  def expireSnapshots(table: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    var committed = false
    var deleted: Seq[String] = Nil
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val snaps = meta.get("snapshots").elements().asScala
        .map(_.deepCopy[ObjectNode]()).toVector
      val order: Vector[Long] =
        if (meta.has("snapshot-log"))
          meta.get("snapshot-log").elements().asScala
            .map(_.get("snapshot-id").asLong()).toVector
        else snaps.map(_.get("snapshot-id").asLong())
      val curId = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L)
      // ref'd snapshots are PINNED — expiring a tagged release or a
      // staged WAP branch would orphan the ref (Iceberg's expire
      // keeps them too) — UNLESS the ref's own retention policy says
      // otherwise (r15): a ref older than its `max-ref-age-ms` (age =
      // age of the snapshot it points at; main never retires) is
      // dropped and releases its snapshots, and a branch with
      // `min-snapshots-to-keep` / `max-snapshot-age-ms` (per-ref
      // first, `history.expire.*` table properties as defaults) keeps
      // only its `minKeep` newest ancestors plus everything younger
      // than the age bound — count overrides age, Iceberg's own
      // RemoveSnapshots rule. A branch with NO policy anywhere keeps
      // its whole UNPUBLISHED lineage (head → first already-kept
      // ancestor): fastForward must be able to walk it at publish.
      val byId = snaps
        .map(s => s.get("snapshot-id").asLong() -> s).toMap
      val now = System.currentTimeMillis()
      val props = propsOf(meta)
      val tableMaxSnapAge =
        props.get("history.expire.max-snapshot-age-ms").map(_.toLong)
      val tableMinKeep =
        props.get("history.expire.min-snapshots-to-keep").map(_.toInt)
      def ageOf(id: Long): Option[Long] =
        byId.get(id).map(sn => now - sn.get("timestamp-ms").asLong())
      // ref age falls back to the table-level default exactly like
      // the snapshot-age and min-keep bounds below (r16 — previously
      // only the per-ref value was honored, so `history.expire
      // .max-ref-age-ms` silently never retired anything); main is
      // EXCLUDED from retirement (RemoveSnapshots' own rule: the
      // current branch never ages out, whatever the default says)
      val tableMaxRefAge =
        props.get("history.expire.max-ref-age-ms").map(_.toLong)
      val refsAll = refsOf(meta)
      val (agedOut, liveRefs) = refsAll.partition { case (name, r) =>
        name != "main" &&
          r.maxRefAgeMs.orElse(tableMaxRefAge)
            .exists(maxAge => ageOf(r.snapshotId).forall(_ > maxAge))
      }
      var keptIds = order.takeRight(keepLast).toSet ++ curId ++
        liveRefs.values.filter(_.tpe == "tag").map(_.snapshotId)
      liveRefs.values.filter(_.tpe == "branch").foreach { r =>
        val minKeepOpt = r.minSnapshotsToKeep.orElse(tableMinKeep)
        val maxAgeOpt = r.maxSnapshotAgeMs.orElse(tableMaxSnapAge)
        val bounded = minKeepOpt.isDefined || maxAgeOpt.isDefined
        val minKeep = minKeepOpt.getOrElse(1)
        var at = Option(r.snapshotId)
        var count = 0
        var continue = true
        while (continue && at.isDefined && !keptIds(at.get)) {
          val young = maxAgeOpt.forall(maxAge =>
            ageOf(at.get).forall(_ <= maxAge))
          if (!bounded || count < minKeep || young) {
            keptIds += at.get
            count += 1
            at = byId.get(at.get).flatMap(n =>
              Option(n.get("parent-snapshot-id")).map(_.asLong()))
          } else continue = false
        }
      }
      if (agedOut.isEmpty &&
        snaps.forall(s => keptIds(s.get("snapshot-id").asLong())))
        return Nil // nothing to expire and no ref to retire
      val (kept, expired) =
        snaps.partition(s => keptIds(s.get("snapshot-id").asLong()))
      // file references per snapshot set (driver metadata work)
      def refs(ss: Seq[ObjectNode]): (Set[String], Set[String]) = {
        val lists = ss.flatMap(s =>
          Option(s.get("manifest-list")).map(_.asText())).toSet
        val manifests = ss.flatMap { s =>
          IcebergTable.manifestPathsOf(s)
        }.toSet
        (lists, manifests)
      }
      val (keptLists, keptManifests) = refs(kept)
      val (expLists, expManifests) = refs(expired)
      val dataPrefix = Paths.get(table, "data").toAbsolutePath.toString + "/"
      // delete files (position AND equality) are table content too:
      // expired-only ones reclaim, kept-referenced ones survive
      val keptData = kept.flatMap(s =>
        IcebergTable.dataFilesOf(table, meta, s) ++
          IcebergTable.deleteFilesOf(table, meta, s).map(_.path)).toSet
      val expData = expired.flatMap(s =>
        IcebergTable.dataFilesOf(table, meta, s) ++
          IcebergTable.deleteFilesOf(table, meta, s).map(_.path)).toSet
      val victims =
        (expLists -- keptLists).toSeq ++
          (expManifests -- keptManifests).toSeq ++
          (expData -- keptData).filter(_.startsWith(dataPrefix)).toSeq
      val root = meta.deepCopy[ObjectNode]()
      // retired refs leave the metadata with this commit
      root.remove("refs")
      putRefs(root, liveRefs)
      val snapsArr = root.putArray("snapshots")
      kept.foreach(snapsArr.add)
      if (meta.has("snapshot-log")) {
        val logArr = root.putArray("snapshot-log")
        meta.get("snapshot-log").elements().asScala
          .filter(e => keptIds(e.get("snapshot-id").asLong()))
          .foreach(e => logArr.add(e.deepCopy[ObjectNode]()))
      }
      root.put("last-updated-ms", System.currentTimeMillis())
      committed = claim(table, curVersion + 1,
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
      if (committed) {
        victims.foreach(p => Files.deleteIfExists(
          Paths.get(p.replaceFirst("^file:/*", "/"))))
        deleted = victims.sorted
      }
    }
    deleted
  }

  /** COMPACTION — the `rewrite_data_files` analog, matching the Delta
    * tier's OPTIMIZE ([[DeltaExport.compact]]): per partition, data
    * files under `targetBytes` are re-read (merge-on-read deletes
    * APPLIED — position deletes on rewritten paths and equality
    * deletes older than the new sequence number then naturally stop
    * matching the new files) and rewritten into ~`targetBytes`
    * outputs. One `replace` snapshot commits a fresh data manifest:
    * surviving files carry over as EXISTING entries with their
    * ORIGINAL data sequence numbers (so older equality deletes keep
    * applying to them — the manifest's min_sequence_number reflects
    * the oldest), new files are ADDED at the commit's sequence number;
    * delete manifests carry forward unchanged. Snapshot lineage stays
    * intact (time travel to pre-compaction snapshots reads the old
    * small files; [[expireSnapshots]] reclaims them later). The
    * small-file fix every streaming-fed table needs: per-file open/
    * seek/scheduler overhead at 100 TB is paid per FILE, not per byte.
    * Schema-EVOLVED tables compact too (r13): survivors group into
    * per-ERA manifests, each embedding its own era's write-time
    * schema, so field-id resolution through old eras keeps working —
    * a single current-schema manifest would re-brand old files and
    * null their renamed columns. Returns (files before, files after).
    */
  /** Read `victims` MoR-resolved (row-level deletes applied, old-era
    * identity columns reconstructed) and stage their rows under `pfs`
    * — shared by [[rewriteDataFiles]] and [[rewriteToCurrentSpec]].
    * v3 ROW LINEAGE survives by MATERIALIZATION (the spec's
    * lineage-preserving rewrite): victims read WITH their `_row_id` /
    * `_last_updated_sequence_number`, which land as physical columns
    * in the new files under the spec's reserved field-ids
    * (2147483540 / 2147483539); the new manifest entries keep
    * `first_row_id` NULL so readers take the materialized values
    * instead of inheriting fresh ones.
    */
  private def stageRewrittenRows(
      spark: org.apache.spark.sql.SparkSession, table: String,
      victims: Set[String], fv0: Int, pfs: Seq[PartField],
      schemaNode: com.fasterxml.jackson.databind.JsonNode,
      bins: Int): Seq[Added] = {
    val rows =
      (if (fv0 >= 3)
        IcebergTable.readCore(spark, table, None, Some(victims),
          withLineage = true)
      else IcebergTable.readKeep(spark, table, victims)).coalesce(bins)
    val lineageFieldIds = Map(
      "_row_id" -> 2147483540L,
      "_last_updated_sequence_number" -> 2147483539L)
    val staged =
      if (fv0 < 3) deriveCols(rows, pfs)
      else {
        import org.apache.spark.sql.functions.col
        val d = deriveCols(rows, pfs)
        d.select(d.columns.toSeq.map { c =>
          lineageFieldIds.get(c) match {
            case Some(id) => col(c).as(c, new MetadataBuilder()
              .putLong("parquet.field.id", id).build())
            case None => col(c)
          }
        }: _*)
      }
    stageIn(staged, table, pfs.map(_.name), topFieldIds(schemaNode))
  }

  def rewriteDataFiles(
      spark: org.apache.spark.sql.SparkSession, table: String,
      targetBytes: Long): (Int, Int) =
    rewriteDataFiles(spark, table, targetBytes, () => ())

  /** [[rewriteDataFiles]] with a commit-window seam: `beforeCommit`
    * runs once after the victims were read and rewritten but before
    * the claim loop — the window a concurrent row-level delete races
    * into. Production calls the no-op overload; the concurrency spec
    * injects a real deleteWhere here to pin the abort deterministically.
    */
  private[sources] def rewriteDataFiles(
      spark: org.apache.spark.sql.SparkSession, table: String,
      targetBytes: Long, beforeCommit: () => Unit): (Int, Int) = {
    val meta0 = IcebergTable.metadataJson(table)
    val fv0 = fvOf(meta0)._1
    val schemaNode0 = IcebergTable.schemaNodeOf(meta0)
    val pfs0 = partFieldsFromMeta(meta0)
    val snap0 = IcebergTable.currentSnapshotNode(meta0)
    // PARTITION EVOLUTION guard: a snapshot holding data manifests
    // under OLDER specs would need a cross-era relayout (rewriting
    // old-spec files re-partitions them into the default spec — a
    // content-preserving but layout-CHANGING operation Iceberg ships
    // as its own rewrite mode); refused rather than silently mixing
    // partition eras in the bin-packing groups
    IcebergTable.manifestSpecIds(snap0).filter(_._2 == 0).foreach {
      case (path, _, specId) =>
        require(specId == defaultSpecIdOf(meta0),
          s"rewriteDataFiles on a partition-evolved table: data " +
            s"manifest $path was written under spec $specId (default " +
            s"is ${defaultSpecIdOf(meta0)}) — cross-era compaction " +
            "is a relayout, out of scope")
    }
    // pv over the FULL spec (transforms included) so bin-packing
    // never mixes files across any partition boundary
    val entries0 = IcebergTable.dataFilesWithPartitions(
      table, meta0, snap0)
    // the delete files the victim rows were MoR-resolved against —
    // the claim loop validates no newer delete landed meanwhile
    // (Iceberg RewriteFiles' validateNoNewDeletes): a position/
    // equality delete committed after this read could no longer
    // match the rewritten files (new files get seq = nextSeq >
    // deleteSeq; position deletes reference the replaced paths) and
    // would silently RESURRECT the concurrently-deleted rows
    val deletes0 = IcebergTable.deleteFilesOf(table, meta0, snap0)
      .map(_.path).toSet
    val before = entries0.size
    // candidates: partitions with ≥2 under-target files
    val victims = entries0.groupBy(_.pv).values.flatMap { fs =>
      val small = fs.filter(f =>
        Files.size(Paths.get(f.path)) < targetBytes)
      if (small.size >= 2) small else Nil
    }.map(_.path).toSet
    if (victims.isEmpty) return (before, before)
    // MoR-resolved rows of exactly the victim files, bin-packed into
    // ~targetBytes write tasks (partitionBy then splits per dir) and
    // rewritten in the table's own partition layout — one distributed
    // job
    val victimBytes = entries0.filter(e => victims(e.path))
      .map(e => Files.size(Paths.get(e.path))).sum
    val bins = math.max(1L,
      (victimBytes + targetBytes - 1) / targetBytes).toInt
    val added = stageRewrittenRows(
      spark, table, victims, fv0, pfs0, schemaNode0, bins)
    beforeCommit()
    var committed = false
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val curSnapId = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L)
      val curSnap = curSnapId.flatMap { id =>
        meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong() == id)
      }
      val prevList = curSnap.flatMap(s =>
        Option(s.get("manifest-list")).map(_.asText()))
      // survivors recomputed from the FRESH state so a concurrent
      // append's files are never dropped by the full-manifest rewrite
      val snapNow = IcebergTable.currentSnapshotNode(meta)
      // ABORT on a delete committed since the victims were read: the
      // rewritten rows no longer reflect it, and carrying the new
      // delete metadata forward would not re-apply it to the new
      // files. Loud failure, never resurrected rows; the caller
      // re-runs against the post-delete state.
      val deletesNow = IcebergTable.deleteFilesOf(table, meta, snapNow)
        .map(_.path).toSet
      if ((deletesNow -- deletes0).nonEmpty) {
        added.foreach(a => Files.deleteIfExists(Paths.get(a.absPath)))
        throw new IllegalStateException(
          s"concurrent row-level delete committed to $table during " +
            "rewriteDataFiles (validateNoNewDeletes): compaction " +
            "aborted without committing — re-run it against the " +
            "post-delete snapshot")
      }
      val pfsNow = partFieldsFromMeta(meta)
      val entriesNow = IcebergTable.dataFilesWithPartitions(
        table, meta, snapNow)
      // Iceberg RewriteFiles' "files to replace must exist": a victim
      // gone from the fresh snapshot means a CONCURRENT rewrite (or
      // overwrite) already replaced it — committing our copy of its
      // rows on top would DUPLICATE them. Abort loudly instead.
      val liveNow = entriesNow.map(_.path).toSet
      val vanished = victims -- liveNow
      if (vanished.nonEmpty) {
        added.foreach(a => Files.deleteIfExists(Paths.get(a.absPath)))
        throw new java.util.ConcurrentModificationException(
          s"rewriteDataFiles conflict on $table: victim " +
            s"${vanished.head} was replaced by a concurrent writer — " +
            "compaction aborted without committing; re-run against " +
            "the new snapshot")
      }
      val survivorEntries = entriesNow.filterNot(e => victims(e.path))
      def toAdded(e: IcebergTable.FileEntry): Added =
        Added(e.path, Files.size(Paths.get(e.path)), e.records,
          e.pv,
          if (e.lower.isEmpty && e.upper.isEmpty && e.nullCounts.isEmpty) None
          else Some(FileBounds(e.lower, e.upper, e.nullCounts)),
          // survivors KEEP their first_row_id — dropping it would
          // silently null every surviving row's lineage
          seq = Some(e.seq), status = 0, firstRowId = e.firstRowId)
      val snapId2 = newSnapshotId()
      val schemaNode = IcebergTable.schemaNodeOf(meta).deepCopy[ObjectNode]()
      val history = schemaHistoryOf(meta)
      val pfs = pfsNow
      val (fv, lastSeq) = fvOf(meta)
      val nextSeq = if (fv >= 2) lastSeq + 1 else 0L
      // per-ERA survivor manifests: each embeds ITS OWN era's write-
      // time schema, so field-id resolution through old eras keeps
      // working after compaction (a single current-schema manifest
      // would re-brand old files and null their renamed columns);
      // NEW files were read under the current schema and go in a
      // current-schema manifest
      val survivorGroups = survivorEntries.groupBy(_.writerSchemaJson)
        .toSeq.sortBy(_._1.getOrElse(""))
      val eraRefs = survivorGroups.map { case (ws, files) =>
        val (sPath, sLen, sCount) = writeManifest(
          table, snapId2, ws.getOrElse(schemaNode.toString),
          files.map(toAdded), pfs, fv = fv,
          lineageMaterialized = fv >= 3)
        val eraMin = files.map(_.seq).min
        ManifestRef(sPath, sLen, sCount, Some(snapId2),
          seq = if (fv >= 2) Some(nextSeq) else None,
          minSeq = if (fv >= 2) Some(math.min(eraMin, nextSeq)) else None)
      }
      val (mPath, mLen, mCount) = writeManifest(
        table, snapId2, schemaNode.toString, added, pfs, fv = fv,
        lineageMaterialized = fv >= 3)
      val ml = writeManifestList(
        table, snapId2,
        (ManifestRef(mPath, mLen, mCount, Some(snapId2),
          seq = if (fv >= 2) Some(nextSeq) else None,
          minSeq = if (fv >= 2) Some(nextSeq) else None) +: eraRefs) ++
          priorManifests(prevList).filter(_.content == 1), fv = fv)
      val ts = System.currentTimeMillis()
      // a lineage-preserving replace assigns ZERO new row ids: the
      // snapshot's first-row-id is the untouched watermark
      val rowIdMark = if (fv >= 3) nextRowIdOf(meta) else None
      val newSnap = snapshotNode(
        snapId2, curSnapId, ts, ml, added.size, added.map(_.records).sum,
        if (fv >= 2) Some(nextSeq) else None, operation = "replace",
        firstRowId = rowIdMark)
      val snaps = meta.get("snapshots").elements().asScala
        .map(_.deepCopy[ObjectNode]()).toSeq :+ newSnap
      val log = (if (meta.has("snapshot-log"))
        meta.get("snapshot-log").elements().asScala.map(e =>
          (e.get("timestamp-ms").asLong(),
            e.get("snapshot-id").asLong())).toSeq
      else Nil) :+ ((ts, snapId2))
      val json = buildMetadata(
        table, meta.get("table-uuid").asText(), schemaNode,
        meta.get("last-column-id").asInt(), snaps, snapId2, log, pfs,
        history, fv, nextSeq, extraSpecsOf(meta), propsOf(meta),
        refsOf(meta), nextRowId = rowIdMark,
        defaultSpecId = defaultSpecIdOf(meta))
      committed = claim(table, curVersion + 1, json)
    }
    (before, before - victims.size + added.size)
  }

  /** Compact a PARTITION-EVOLVED table's old-era files INTO the
    * current default spec — the format's OTHER rewrite mode, the one
    * [[rewriteDataFiles]] refuses (a content-preserving but
    * layout-CHANGING relayout; Iceberg ships it as
    * `rewrite_data_files` against the current spec). Every data file
    * living in a manifest written under a non-default spec is read
    * MoR-resolved (row-level deletes applied; old-era identity
    * columns reconstructed from partition metadata) and rewritten in
    * the CURRENT spec's hive layout; current-era files and their
    * manifests are untouched, carried by reference. v3 row lineage
    * survives by materialization exactly as in [[rewriteDataFiles]].
    * After the commit every data manifest declares the default spec,
    * so manifest-level pruning stops keeping unprovable old-era files
    * and the per-era reconstruction branches collapse to one. Aborts
    * loudly on a concurrent row-level delete (validateNoNewDeletes)
    * or a concurrent updateSpec. Returns (data files before, after).
    */
  def rewriteToCurrentSpec(
      spark: org.apache.spark.sql.SparkSession, table: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val meta0 = IcebergTable.metadataJson(table)
    val fv0 = fvOf(meta0)._1
    val schemaNode0 = IcebergTable.schemaNodeOf(meta0)
    val pfs0 = partFieldsFromMeta(meta0)
    val defSpec0 = defaultSpecIdOf(meta0)
    val snap0 = IcebergTable.currentSnapshotNode(meta0)
    val entries0 = IcebergTable.dataFilesWithPartitions(
      table, meta0, snap0)
    val before = entries0.size
    val victims = IcebergTable.oldSpecDataFiles(snap0, defSpec0)
    if (victims.isEmpty) return (before, before)
    // same race as rewriteDataFiles: a row-level delete committed
    // after the victims were read could no longer match the rewritten
    // files — validated inside the claim loop
    val deletes0 = IcebergTable.deleteFilesOf(table, meta0, snap0)
      .map(_.path).toSet
    val victimBytes = entries0.filter(e => victims(e.path))
      .map(e => Files.size(Paths.get(e.path))).sum
    val bins = math.max(1L,
      (victimBytes + targetBytes - 1) / targetBytes).toInt
    val added = stageRewrittenRows(
      spark, table, victims, fv0, pfs0, schemaNode0, bins)
    var committed = false
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      // the staged hive layout followed the spec read BEFORE staging
      require(defaultSpecIdOf(meta) == defSpec0,
        s"the partition spec of $table changed while this relayout " +
          "was staging: re-run against the new spec")
      val curSnapId = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L)
      val curSnap = curSnapId.flatMap { id =>
        meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong() == id)
      }
      val prevList = curSnap.flatMap(s =>
        Option(s.get("manifest-list")).map(_.asText()))
      val snapNow = IcebergTable.currentSnapshotNode(meta)
      val deletesNow = IcebergTable.deleteFilesOf(table, meta, snapNow)
        .map(_.path).toSet
      if ((deletesNow -- deletes0).nonEmpty) {
        added.foreach(a => Files.deleteIfExists(Paths.get(a.absPath)))
        throw new IllegalStateException(
          s"concurrent row-level delete committed to $table during " +
            "rewriteToCurrentSpec (validateNoNewDeletes): relayout " +
            "aborted without committing — re-run it against the " +
            "post-delete snapshot")
      }
      // "files to replace must exist" (mirrors rewriteDataFiles): a
      // victim gone from the fresh snapshot means a concurrent
      // rewrite already replaced it — our staged copy of its rows
      // would DUPLICATE them
      val liveNow = IcebergTable.dataFilesWithPartitions(
        table, meta, snapNow).map(_.path).toSet
      val vanished = victims -- liveNow
      if (vanished.nonEmpty) {
        added.foreach(a => Files.deleteIfExists(Paths.get(a.absPath)))
        throw new java.util.ConcurrentModificationException(
          s"rewriteToCurrentSpec conflict on $table: victim " +
            s"${vanished.head} was replaced by a concurrent writer — " +
            "relayout aborted without committing; re-run against the " +
            "new snapshot")
      }
      val snapId2 = newSnapshotId()
      val schemaNode =
        IcebergTable.schemaNodeOf(meta).deepCopy[ObjectNode]()
      val history = schemaHistoryOf(meta)
      val pfs = partFieldsFromMeta(meta)
      val (fv, lastSeq) = fvOf(meta)
      val nextSeq = if (fv >= 2) lastSeq + 1 else 0L
      // carried by REFERENCE: every delete manifest plus the
      // current-spec data manifests (a concurrent append's manifest
      // is current-spec by the guard above, so it carries too); the
      // old-spec data manifests drop — their content is `added`
      val carried = priorManifests(prevList).filter(m =>
        m.content == 1 || m.specId == defSpec0)
      val (mPath, mLen, mCount) = writeManifest(
        table, snapId2, schemaNode.toString, added, pfs,
        specId = defSpec0, fv = fv, lineageMaterialized = fv >= 3)
      val ml = writeManifestList(
        table, snapId2,
        ManifestRef(mPath, mLen, mCount, Some(snapId2), specId = defSpec0,
          seq = if (fv >= 2) Some(nextSeq) else None,
          minSeq = if (fv >= 2) Some(nextSeq) else None) +: carried,
        fv = fv)
      val ts = System.currentTimeMillis()
      val rowIdMark = if (fv >= 3) nextRowIdOf(meta) else None
      val newSnap = snapshotNode(
        snapId2, curSnapId, ts, ml, added.size, added.map(_.records).sum,
        if (fv >= 2) Some(nextSeq) else None, operation = "replace",
        firstRowId = rowIdMark)
      val snaps = meta.get("snapshots").elements().asScala
        .map(_.deepCopy[ObjectNode]()).toSeq :+ newSnap
      val log = (if (meta.has("snapshot-log"))
        meta.get("snapshot-log").elements().asScala.map(e =>
          (e.get("timestamp-ms").asLong(),
            e.get("snapshot-id").asLong())).toSeq
      else Nil) :+ ((ts, snapId2))
      val json = buildMetadata(
        table, meta.get("table-uuid").asText(), schemaNode,
        meta.get("last-column-id").asInt(), snaps, snapId2, log, pfs,
        history, fv, nextSeq, extraSpecsOf(meta), propsOf(meta),
        refsOf(meta), nextRowId = rowIdMark,
        defaultSpecId = defSpec0)
      committed = claim(table, curVersion + 1, json)
    }
    (before, before - victims.size + added.size)
  }

  /** UniForm-style Delta→Iceberg METADATA conversion: author Iceberg
    * metadata over a Delta table's CURRENT active file set — the SAME
    * parquet files, zero data copied or moved (`metadata/` lands next
    * to `_delta_log/`; both formats then describe one physical
    * table). Re-running after Delta commits emits a NEW snapshot with
    * one full manifest of the current active set, so the Iceberg view
    * tracks the Delta table at each sync point (and earlier sync
    * points stay time-travelable). SINGLE-WRITER CONTRACT: Delta must
    * stay the only writer of a converted table — a file appended
    * through [[append]] directly is not in the Delta log, and the next
    * re-sync drops it (pinned by `IcebergReplayPropsSpec`).
    *
    * Partitioned Delta tables (r12): the log's per-file
    * `partitionValues` — the data the old refusal said was missing
    * is IN the Delta log — become the spec's typed identity partition
    * structs, and [[IcebergTable]] materializes the source columns
    * from them exactly as it does for this writer's own partitioned
    * tables (Delta data files do not contain partition columns).
    *
    * Returns the new Iceberg snapshot id.
    */
  def fromDelta(spark: org.apache.spark.sql.SparkSession, table: String): Long = {
    val st = DeltaLog.stateAt(spark, table, None)
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(st.schemaJson.get)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val conf = spark.sparkContext.hadoopConfiguration
    import org.apache.spark.sql.functions.col
    val (schemaNode, lastId) = icebergSchemaNode(schema)
    schemaNode.put("schema-id", 0)
    val pfs = partFieldsOf(schemaNode, schema, st.partitionCols)
    val pvFrame = DeltaLog.activeFiles(spark, table)
      .select(col("file") +: st.partitionCols.map(col): _*)
      .collect()
    val fieldIds = topFieldIds(schemaNode)
    val added = pvFrame.map { r =>
      val f = r.getString(0)
      val pv = st.partitionCols.zipWithIndex.map { case (c, i) =>
        c -> Option(r.getString(i + 1))
      }.toMap
      val (records, bounds) = footerInfo(conf, f, fieldIds)
      Added(f, Files.size(Paths.get(f)), records, pv, bounds)
    }.toSeq.sortBy(_.absPath)
    // Delta DELETION VECTORS convert to Iceberg POSITION DELETES
    // (UniForm's own rule — exposing the raw files would RESURRECT
    // deleted rows in the Iceberg view): each DV'd file's deleted
    // indexes (driver-held, bounded by deleted rows) become
    // (file_path, pos) rows in one delete file + a content=1
    // manifest, and the table converts as format-version 2.
    val dvPairs: Seq[(String, Long)] = st.active.values.toSeq
      .sortBy(_.path).flatMap { a =>
        a.dv.toSeq.flatMap(d =>
          DeltaDv.indexesOf(table, d)
            .map(i => (DeltaLog.absPath(table, a.path), i)))
      }
    val delAdded: Option[Added] =
      if (dvPairs.isEmpty) None
      else Some(writeDeleteFile(
        spark, table,
        dvPairs.sorted.map { case (f, i) => org.apache.spark.sql.Row(f, i) },
        posDeleteSchema))
    Files.createDirectories(metaDir(table))
    var committed = false
    var snapId = 0L
    while (!committed) {
      val existing = {
        val s = Files.list(metaDir(table))
        try s.iterator().asScala
          .exists(_.getFileName.toString.matches("v\\d+\\.metadata\\.json"))
        finally s.close()
      }
      snapId = newSnapshotId()
      val fvWanted = if (delAdded.isDefined) 2 else 1
      val ts = System.currentTimeMillis()
      if (!existing) {
        val (mPath, mLen, mCount) = writeManifest(
          table, snapId, schemaNode.toString, added, pfs, fv = fvWanted)
        val nextSeq = if (fvWanted >= 2) 1L else 0L
        val (delSpecId, extraSpecs) =
          if (pfs.isEmpty || delAdded.isEmpty) (0, Nil)
          else {
            val sp = mapper.createObjectNode()
            sp.put("spec-id", 1)
            sp.putArray("fields")
            (1, Seq(sp))
          }
        val refs = ManifestRef(mPath, mLen, mCount, Some(snapId),
          seq = if (fvWanted >= 2) Some(nextSeq) else None) +:
          delAdded.toSeq.map { da =>
            val (dPath, dLen, dCount) = writeManifest(
              table, snapId, schemaNode.toString, Seq(da), Nil,
              entryContent = 1, specId = delSpecId, fv = fvWanted)
            ManifestRef(dPath, dLen, dCount, Some(snapId), content = 1,
              specId = delSpecId, seq = Some(nextSeq))
          }
        val ml = writeManifestList(table, snapId, refs, fv = fvWanted)
        val snap = snapshotNode(
          snapId, None, ts, ml, added.size, added.map(_.records).sum,
          if (fvWanted >= 2) Some(nextSeq) else None)
        val json = buildMetadata(
          table, java.util.UUID.randomUUID().toString, schemaNode, lastId,
          Seq(snap), snapId, Seq((ts, snapId)), pfs,
          formatVersion = fvWanted,
          lastSequenceNumber = nextSeq,
          extraSpecs = extraSpecs)
        committed = claim(table, 1, json)
      } else {
        val meta = IcebergTable.metadataJson(table)
        val curVersion = IcebergTable.currentMetadataVersion(table)
        val prevId = Option(meta.get("current-snapshot-id"))
          .map(_.asLong()).filter(_ != -1L)
        val (fv0, lastSeq) = fvOf(meta)
        val fv = math.max(fv0, fvWanted)
        val (mPath, mLen, mCount) = writeManifest(
          table, snapId, schemaNode.toString, added, pfs, fv = fv)
        val nextSeq = if (fv >= 2) lastSeq + 1 else 0L
        val (delSpecId, extraSpecs) =
          if (delAdded.isEmpty) (0, extraSpecsOf(meta))
          else deleteSpec(meta, pfs)
        val refs = ManifestRef(mPath, mLen, mCount, Some(snapId),
          seq = if (fv >= 2) Some(nextSeq) else None) +:
          delAdded.toSeq.map { da =>
            val (dPath, dLen, dCount) = writeManifest(
              table, snapId, schemaNode.toString, Seq(da), Nil,
              entryContent = 1, specId = delSpecId, fv = fv)
            ManifestRef(dPath, dLen, dCount, Some(snapId), content = 1,
              specId = delSpecId, seq = Some(nextSeq))
          }
        val ml = writeManifestList(table, snapId, refs, fv = fv)
        val snap = snapshotNode(
          snapId, prevId, ts, ml, added.size, added.map(_.records).sum,
          if (fv >= 2) Some(nextSeq) else None)
        val snaps = meta.get("snapshots").elements().asScala
          .map(_.deepCopy[ObjectNode]()).toSeq :+ snap
        val log = (if (meta.has("snapshot-log"))
          meta.get("snapshot-log").elements().asScala.map(e =>
            (e.get("timestamp-ms").asLong(),
              e.get("snapshot-id").asLong())).toSeq
        else Nil) :+ ((ts, snapId))
        val json = buildMetadata(
          table, meta.get("table-uuid").asText(), schemaNode, lastId,
          snaps, snapId, log, pfs,
          formatVersion = fv,
          lastSequenceNumber = nextSeq,
          extraSpecs = extraSpecs,
          properties = propsOf(meta),
          refs = refsOf(meta))
        committed = claim(table, curVersion + 1, json)
      }
    }
    snapId
  }

  /** Row-level DELETE via v2 POSITION DELETES — the
    * [[DeltaExport.deleteWhere]] analog in the other format: the rows
    * matching `condition` are named (data file path, in-file row
    * index) in a position-delete parquet file; a new snapshot carries
    * the prior manifests forward PLUS one content=1 delete manifest,
    * upgrading the table to format-version 2 on first use. No data
    * file is rewritten; time travel to pre-delete snapshots sees the
    * rows; deletes are CUMULATIVE across snapshots (re-deleting an
    * already-deleted position is harmless — the reader's anti-join
    * dedups). Position deletes target files by UNIQUE path, so the
    * application needs no sequence-number bookkeeping (the numbers
    * are still written for spec shape). Scope: tables whose manifests
    * all carry the CURRENT schema (delete-after-evolution would need
    * per-era scan plumbing) and equality deletes never. Returns the
    * new snapshot id, or None when nothing matched.
    */
  def deleteWhere(
      spark: org.apache.spark.sql.SparkSession, table: String,
      condition: org.apache.spark.sql.Column): Option[Long] = {
    import org.apache.spark.sql.functions.col
    val meta0 = IcebergTable.metadataJson(table)
    require(fvOf(meta0)._1 <= 2,
      "format-version 3 forbids parquet position-delete files — " +
        "row-level deletes on v3 tables go through deleteWhereDv " +
        "(puffin deletion vectors)")
    val snap0 = IcebergTable.currentSnapshotNode(meta0)
    if (IcebergTable.dataFilesOf(table, meta0, snap0).isEmpty) return None
    // per-era position-preserving scan (r13 — the schema-evolution
    // refusal lifted): evolution resolves by field-id exactly as a
    // read does, identity partition sources attach so the condition
    // may reference them, and each row carries its (file, row index).
    // Rows already dead under existing deletes may re-match — a
    // duplicate position entry is harmless by the reader's anti-join.
    val matched = IcebergTable.readWithPos(spark, table)
      .filter(condition)
      .select(col("__pos_file"), col("__pos_index")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    if (matched.isEmpty) return None
    // ONE sorted position-delete parquet file under data/, with the
    // spec's RESERVED field-ids in the parquet schema (file_path =
    // 2147483546, pos = 2147483545) so spec-compliant readers resolve
    // the delete columns by id
    val delAdded = writeDeleteFile(
      spark, table,
      matched.toSeq.sorted.map { case (f, i) =>
        org.apache.spark.sql.Row(f, i)
      },
      posDeleteSchema)
    var committed = false
    var snapId = 0L
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val curSnapId = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L)
      val curSnap = curSnapId.flatMap { id =>
        meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong() == id)
      }
      val prevList = curSnap.flatMap(s =>
        Option(s.get("manifest-list")).map(_.asText()))
      snapId = newSnapshotId()
      val schemaNode =
        IcebergTable.schemaNodeOf(meta).deepCopy[ObjectNode]()
      val history = schemaHistoryOf(meta)
      val pfsNow = partFieldsFromMeta(meta)
      val (delSpecId, specs) = deleteSpec(meta, pfsNow)
      val (dPath, dLen, dCount) = writeManifest(
        table, snapId, schemaNode.toString, Seq(delAdded), Nil,
        entryContent = 1, specId = delSpecId, fv = 2)
      val ts = System.currentTimeMillis()
      val (_, lastSeq) = fvOf(meta)
      val nextSeq = lastSeq + 1
      val ml = writeManifestList(
        table, snapId,
        priorManifests(prevList) :+
          ManifestRef(dPath, dLen, dCount, Some(snapId), content = 1,
            specId = delSpecId, seq = Some(nextSeq)), fv = 2)
      val newSnap = snapshotNode(
        snapId, curSnapId, ts, ml, 1, matched.length.toLong,
        Some(nextSeq), operation = "delete")
      val snaps = meta.get("snapshots").elements().asScala
        .map(_.deepCopy[ObjectNode]()).toSeq :+ newSnap
      val log = (if (meta.has("snapshot-log"))
        meta.get("snapshot-log").elements().asScala.map(e =>
          (e.get("timestamp-ms").asLong(),
            e.get("snapshot-id").asLong())).toSeq
      else Nil) :+ ((ts, snapId))
      val json = buildMetadata(
        table, meta.get("table-uuid").asText(), schemaNode,
        meta.get("last-column-id").asInt(), snaps, snapId, log,
        pfsNow,
        history,
        formatVersion = 2, // position deletes are a v2 feature
        lastSequenceNumber = nextSeq,
        extraSpecs = specs,
        properties = propsOf(meta),
        refs = refsOf(meta),
        defaultSpecId = defaultSpecIdOf(meta))
      committed = claim(table, curVersion + 1, json)
    }
    Some(snapId)
  }

  /** The position-delete file schema with the spec's RESERVED
    * parquet field-ids (file_path = 2147483546, pos = 2147483545).
    */
  private def posDeleteSchema: StructType = StructType(Seq(
    StructField("file_path", org.apache.spark.sql.types.StringType,
      nullable = false,
      new MetadataBuilder().putLong("parquet.field.id", 2147483546L)
        .build()),
    StructField("pos", org.apache.spark.sql.types.LongType,
      nullable = false,
      new MetadataBuilder().putLong("parquet.field.id", 2147483545L)
        .build())))

  /** Write `rows` as ONE parquet delete file under `data/` with the
    * given schema (field-ids carried via `parquet.field.id` metadata —
    * Spark's parquet writer emits them when
    * `spark.sql.parquet.fieldId.write.enabled` is on, its default).
    */
  private def writeDeleteFile(
      spark: org.apache.spark.sql.SparkSession, table: String,
      rows: Seq[org.apache.spark.sql.Row], schema: StructType): Added = {
    val stage = Files.createTempDirectory("iceberg_del")
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = {
      val s = Files.list(stage)
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    val dataDir = Paths.get(table, "data")
    Files.createDirectories(dataDir)
    val delDest = dataDir.resolve(
      s"delete-${java.util.UUID.randomUUID()}.parquet")
    Files.move(part, delDest)
    Added(delDest.toAbsolutePath.toString, Files.size(delDest),
      rows.length.toLong)
  }

  /** Row-level DELETE via v2 EQUALITY DELETES — the CDC writer shape
    * (what Flink upserts and Hudi migrations emit): `keys` is a SMALL
    * frame whose columns name top-level table columns; every table row
    * whose values null-safe-equal ANY key row is deleted, but only in
    * data files with sequence number STRICTLY BELOW this commit's (the
    * spec's scope rule — rows appended after the delete are untouched,
    * which is exactly what makes blind CDC deletes safe). No table
    * data is read or rewritten: the commit is the key file + one
    * content=2 manifest entry carrying `equality_ids`. Upgrades the
    * table to format-version 2 on first use. Returns the snapshot id,
    * or None for an empty key frame.
    *
    * The key file carries the equality columns under their table
    * FIELD-IDS (parquet field-id metadata), per the spec's
    * "equality delete files store values by their field ids".
    */
  def deleteWhereEquality(
      spark: org.apache.spark.sql.SparkSession, table: String,
      keys: DataFrame): Option[Long] = {
    val meta0 = IcebergTable.metadataJson(table)
    val schemaNode0 = IcebergTable.schemaNodeOf(meta0)
    val schema = IcebergTable.schemaOf(meta0)
    val ids = topFieldIds(schemaNode0)
    val eqIds = keys.schema.fieldNames.toSeq.map { c =>
      ids.getOrElse(c, throw new IllegalArgumentException(
        s"equality-delete column $c is not a top-level table column"))
    }
    val keySchema = StructType(keys.schema.fieldNames.toSeq.map { c =>
      val want = schema(c).dataType
      val got = keys.schema(c).dataType
      require(got == want,
        s"equality-delete column $c has type $got but the table " +
          s"declares $want: refused rather than matched via coercion")
      StructField(c, want, nullable = true,
        new MetadataBuilder()
          .putLong("parquet.field.id", ids(c).toLong).build())
    })
    val keyRows = keys.distinct().collect().toSeq
    if (keyRows.isEmpty) return None
    val delAdded = writeDeleteFile(spark, table, keyRows, keySchema)
    var committed = false
    var snapId = 0L
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val curSnapId = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L)
      val curSnap = curSnapId.flatMap { id =>
        meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong() == id)
      }
      val prevList = curSnap.flatMap(s =>
        Option(s.get("manifest-list")).map(_.asText()))
      snapId = newSnapshotId()
      val schemaNode =
        IcebergTable.schemaNodeOf(meta).deepCopy[ObjectNode]()
      val history = schemaHistoryOf(meta)
      val pfsNow = partFieldsFromMeta(meta)
      val (delSpecId, specs) = deleteSpec(meta, pfsNow)
      // equality deletes are legal in v2 AND v3: an existing v3
      // table must NOT be downgraded to 2 by this commit
      val fvNow = math.max(fvOf(meta)._1, 2)
      val (dPath, dLen, dCount) = writeManifest(
        table, snapId, schemaNode.toString, Seq(delAdded), Nil,
        entryContent = 2, specId = delSpecId, equalityIds = eqIds,
        fv = fvNow)
      val ts = System.currentTimeMillis()
      val (_, lastSeq) = fvOf(meta)
      val nextSeq = lastSeq + 1
      val ml = writeManifestList(
        table, snapId,
        priorManifests(prevList) :+
          ManifestRef(dPath, dLen, dCount, Some(snapId), content = 1,
            specId = delSpecId, seq = Some(nextSeq)), fv = fvNow)
      val newSnap = snapshotNode(
        snapId, curSnapId, ts, ml, 1, keyRows.length.toLong,
        Some(nextSeq), operation = "delete")
      val snaps = meta.get("snapshots").elements().asScala
        .map(_.deepCopy[ObjectNode]()).toSeq :+ newSnap
      val log = (if (meta.has("snapshot-log"))
        meta.get("snapshot-log").elements().asScala.map(e =>
          (e.get("timestamp-ms").asLong(),
            e.get("snapshot-id").asLong())).toSeq
      else Nil) :+ ((ts, snapId))
      val json = buildMetadata(
        table, meta.get("table-uuid").asText(), schemaNode,
        meta.get("last-column-id").asInt(), snaps, snapId, log,
        pfsNow,
        history,
        formatVersion = fvNow, // equality deletes: v2 feature, v3 legal
        lastSequenceNumber = nextSeq,
        extraSpecs = specs,
        properties = propsOf(meta),
        refs = refsOf(meta),
        nextRowId = nextRowIdOf(meta),
        defaultSpecId = defaultSpecIdOf(meta))
      committed = claim(table, curVersion + 1, json)
    }
    Some(snapId)
  }

  /** BLIND UPSERT MERGE — the Iceberg-native MERGE shape (what Flink
    * CDC upsert sinks and Hudi-style ingestion emit): ONE snapshot
    * carrying an equality-delete file for the source keys AND the
    * source rows as new data files. No table read, no rewrite — the
    * spec's sequence-number scope does the matching at READ time:
    * the equality delete (sequence N) kills matching rows only in
    * data files with sequence < N, and the new data files land AT
    * sequence N, so they survive their own keys. Upsert semantics
    * without touching a single existing file — the reason the scope
    * rule exists, and the contrast to [[DeltaMerge]]'s copy-on-write
    * (write cost ∝ batch size here vs ∝ touched files there; read
    * cost grows with accumulated deletes until [[rewriteDataFiles]]
    * folds them in).
    *
    * `keys` names top-level columns; the key frame (distinct source
    * keys) is batch-sized driver data like every equality delete.
    * Rows deleted-only (no re-insert) are expressed by a plain
    * [[deleteWhereEquality]]; this is the upsert half. Upgrades v1
    * tables to format-version 2; v3 tables keep lineage (new files
    * take explicit row ids). Returns the snapshot id, or None for an
    * empty source.
    */
  def mergeUpsert(
      spark: org.apache.spark.sql.SparkSession, table: String,
      source: DataFrame, keys: Seq[String]): Option[Long] = {
    requireSchemaMatch(source, table)
    val meta0 = IcebergTable.metadataJson(table)
    val schemaNode0 = IcebergTable.schemaNodeOf(meta0)
    val schema = IcebergTable.schemaOf(meta0)
    val ids = topFieldIds(schemaNode0)
    val eqIds = keys.map { c =>
      ids.getOrElse(c, throw new IllegalArgumentException(
        s"merge key $c is not a top-level table column"))
    }
    val keySchema = StructType(keys.map { c =>
      StructField(c, schema(c).dataType, nullable = true,
        new MetadataBuilder()
          .putLong("parquet.field.id", ids(c).toLong).build())
    })
    val keyRows = source
      .select(keys.map(org.apache.spark.sql.functions.col): _*)
      .distinct().collect().toSeq
    if (keyRows.isEmpty) return None
    val pfs0 = partFieldsFromMeta(meta0)
    val added = stageIn(
      deriveCols(source, pfs0), table, pfs0.map(_.name),
      topFieldIds(schemaNode0))
    val delAdded = writeDeleteFile(spark, table, keyRows, keySchema)
    var committed = false
    var snapId = 0L
    while (!committed) {
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val curSnapId = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L)
      val curSnap = curSnapId.flatMap { id =>
        meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong() == id)
      }
      val prevList = curSnap.flatMap(s =>
        Option(s.get("manifest-list")).map(_.asText()))
      snapId = newSnapshotId()
      val schemaNode =
        IcebergTable.schemaNodeOf(meta).deepCopy[ObjectNode]()
      val history = schemaHistoryOf(meta)
      val pfs = partFieldsFromMeta(meta)
      val (delSpecId, specs) = deleteSpec(meta, pfs)
      val fvNow = math.max(fvOf(meta)._1, 2)
      val (_, lastSeq) = fvOf(meta)
      val nextSeq = lastSeq + 1
      // v3 row lineage: the upsert's data files take explicit row ids
      val rowBase = if (fvNow >= 3) nextRowIdOf(meta).getOrElse(0L) else 0L
      val (addedIds, rowNext) =
        if (fvNow >= 3) assignRowIds(added, rowBase) else (added, 0L)
      val defSpec = defaultSpecIdOf(meta)
      val (mPath, mLen, mCount) = writeManifest(
        table, snapId, schemaNode.toString, addedIds, pfs,
        specId = defSpec, fv = fvNow)
      val (dPath, dLen, dCount) = writeManifest(
        table, snapId, schemaNode.toString, Seq(delAdded), Nil,
        entryContent = 2, specId = delSpecId, equalityIds = eqIds,
        fv = fvNow)
      val ts = System.currentTimeMillis()
      val ml = writeManifestList(
        table, snapId,
        ManifestRef(mPath, mLen, mCount, Some(snapId), specId = defSpec,
          seq = Some(nextSeq)) +:
          priorManifests(prevList) :+
          ManifestRef(dPath, dLen, dCount, Some(snapId), content = 1,
            specId = delSpecId, seq = Some(nextSeq)), fv = fvNow)
      val newSnap = snapshotNode(
        snapId, curSnapId, ts, ml, added.size,
        added.map(_.records).sum, Some(nextSeq),
        operation = "overwrite",
        firstRowId = if (fvNow >= 3) Some(rowBase) else None)
      val snaps = meta.get("snapshots").elements().asScala
        .map(_.deepCopy[ObjectNode]()).toSeq :+ newSnap
      val log = (if (meta.has("snapshot-log"))
        meta.get("snapshot-log").elements().asScala.map(e =>
          (e.get("timestamp-ms").asLong(),
            e.get("snapshot-id").asLong())).toSeq
      else Nil) :+ ((ts, snapId))
      val json = buildMetadata(
        table, meta.get("table-uuid").asText(), schemaNode,
        meta.get("last-column-id").asInt(), snaps, snapId, log,
        pfs, history,
        formatVersion = fvNow,
        lastSequenceNumber = nextSeq,
        extraSpecs = specs,
        properties = propsOf(meta),
        refs = refsOf(meta),
        nextRowId =
          if (fvNow >= 3) Some(rowNext) else nextRowIdOf(meta),
        defaultSpecId = defSpec)
      committed = claim(table, curVersion + 1, json)
    }
    Some(snapId)
  }

  /** The live entries' file_format values of one delete manifest —
    * classifies carried manifests during a DV rewrite (puffin DV
    * manifests are REPLACED, equality-delete manifests carry).
    */
  private def deleteManifestKinds(mp: String): Set[String] = {
    val r = new DataFileReader[GenericRecord](
      new File(mp.replaceFirst("^file:/*", "/")),
      new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala
      .filter(_.get("status").toString.toInt != 2)
      .map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        df.get("file_format").toString.toUpperCase
      }.toSet
    finally r.close()
  }

  /** Row-level DELETE via v3 DELETION VECTORS (format-version 3's
    * replacement for parquet position-delete files): the rows
    * matching `condition` merge into ONE roaring bitmap per affected
    * data file, stored as `deletion-vector-v1` blobs in a single
    * PUFFIN file; the commit writes one content=1 delete manifest
    * whose entries carry the spec's `referenced_data_file` /
    * `content_offset` / `content_size_in_bytes` fields. The spec's
    * at-most-one-DV-per-file invariant holds because every commit
    * REWRITES the complete DV set (merged with the existing vectors,
    * driver-held and bounded by rows deleted) and drops the prior DV
    * manifests — equality-delete manifests carry forward untouched
    * with their sequence scoping intact. Time travel to pre-delete
    * snapshots sees the rows (old snapshots keep the old puffin
    * files; [[expireSnapshots]] reclaims them). Returns the snapshot
    * id, or None when nothing matched.
    */
  def deleteWhereDv(
      spark: org.apache.spark.sql.SparkSession, table: String,
      condition: org.apache.spark.sql.Column): Option[Long] = {
    import org.apache.spark.sql.functions.col
    val meta0 = IcebergTable.metadataJson(table)
    require(fvOf(meta0)._1 >= 3,
      "deleteWhereDv needs a format-version 3 table " +
        "(v1/v2 row deletes go through deleteWhere)")
    val snap0 = IcebergTable.currentSnapshotNode(meta0)
    if (IcebergTable.dataFilesOf(table, meta0, snap0).isEmpty) return None
    // per-era position-preserving scan; rows already dead under
    // existing vectors may re-match — the merge below dedups
    val matched = IcebergTable.readWithPos(spark, table)
      .filter(condition)
      .select(col("__pos_file"), col("__pos_index")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    if (matched.isEmpty) return None
    val newByFile: Map[String, Array[Long]] =
      matched.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var committed = false
    var snapId = 0L
    var stale: Option[Path] = None
    while (!committed) {
      // a lost claim leaves the attempt's puffin file orphaned —
      // clean it before rewriting against the fresh state
      stale.foreach(Files.deleteIfExists)
      stale = None
      val meta = IcebergTable.metadataJson(table)
      val curVersion = IcebergTable.currentMetadataVersion(table)
      val curSnapId = Option(meta.get("current-snapshot-id"))
        .map(_.asLong()).filter(_ != -1L)
      val curSnap = curSnapId.flatMap { id =>
        meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong() == id)
      }
      val prevList = curSnap.flatMap(s =>
        Option(s.get("manifest-list")).map(_.asText()))
      val snapNow = IcebergTable.currentSnapshotNode(meta)
      val deletes = IcebergTable.deleteFilesOf(table, meta, snapNow)
      require(deletes.forall(d => d.content != 1 || d.format == "PUFFIN"),
        s"v3 table $table carries parquet position-delete files " +
          "(out of spec): refused rather than merged wrongly")
      // existing vectors, decoded driver-side (bounded by deleted rows)
      val existing: Map[String, Array[Long]] = deletes
        .filter(_.format == "PUFFIN")
        .groupBy(_.referencedDataFile.get)
        .view.mapValues(_.flatMap(d =>
          Puffin.dvBlobIndexes(Puffin.readBlob(
            d.path, d.contentOffset.getOrElse(
              throw new IllegalStateException(
                s"DV entry without content_offset in $table")),
            d.contentSize.get)).toSeq).toArray)
        .toMap
      val merged: Seq[(String, Array[Long])] =
        (existing.keySet ++ newByFile.keySet).toSeq.sorted.map { f =>
          f -> (existing.getOrElse(f, Array.empty[Long]) ++
            newByFile.getOrElse(f, Array.empty[Long])).distinct.sorted
        }
      snapId = newSnapshotId()
      val (_, lastSeq) = fvOf(meta)
      val nextSeq = lastSeq + 1
      val dataDir = Paths.get(table, "data")
      Files.createDirectories(dataDir)
      val puffinPath = dataDir.resolve(
        s"dv-${java.util.UUID.randomUUID()}.puffin")
      val blobs = merged.map { case (f, idxs) =>
        Puffin.Blob("deletion-vector-v1", Nil, snapId, nextSeq,
          Map("referenced-data-file" -> f,
            "cardinality" -> idxs.length.toString),
          Puffin.dvBlobBytes(idxs))
      }
      val blobMetas = Puffin.write(puffinPath, blobs)
      stale = Some(puffinPath)
      val pAbs = puffinPath.toAbsolutePath.toString
      val pSize = Files.size(puffinPath)
      val dvAdds = merged.zip(blobMetas).map { case ((f, idxs), m) =>
        Added(pAbs, pSize, idxs.length.toLong,
          format = "PUFFIN", referencedDataFile = Some(f),
          contentOffset = Some(m.offset),
          contentSizeInBytes = Some(m.length))
      }
      val schemaNode =
        IcebergTable.schemaNodeOf(meta).deepCopy[ObjectNode]()
      val history = schemaHistoryOf(meta)
      val pfsNow = partFieldsFromMeta(meta)
      val (delSpecId, specs) = deleteSpec(meta, pfsNow)
      val (dPath, dLen, dCount) = writeManifest(
        table, snapId, schemaNode.toString, dvAdds, Nil,
        entryContent = 1, specId = delSpecId, fv = 3)
      // carried: every data manifest; delete manifests WITHOUT puffin
      // entries (equality deletes keep their sequence scope). Prior
      // DV manifests are replaced by the rewritten one — the
      // at-most-one-DV-per-file rule.
      val carried = priorManifests(prevList).filter { mr =>
        if (mr.content == 0) true
        else {
          val kinds = deleteManifestKinds(mr.path)
          require(!kinds.contains("PUFFIN") || kinds == Set("PUFFIN"),
            s"delete manifest ${mr.path} mixes puffin DVs with other " +
              "delete files: refused rather than partially replaced")
          !kinds.contains("PUFFIN")
        }
      }
      val ml = writeManifestList(
        table, snapId,
        carried :+ ManifestRef(dPath, dLen, dCount, Some(snapId),
          content = 1, specId = delSpecId, seq = Some(nextSeq)),
        fv = 3)
      val ts = System.currentTimeMillis()
      val newSnap = snapshotNode(
        snapId, curSnapId, ts, ml, merged.size, matched.length.toLong,
        Some(nextSeq), operation = "delete")
      val snaps = meta.get("snapshots").elements().asScala
        .map(_.deepCopy[ObjectNode]()).toSeq :+ newSnap
      val log = (if (meta.has("snapshot-log"))
        meta.get("snapshot-log").elements().asScala.map(e =>
          (e.get("timestamp-ms").asLong(),
            e.get("snapshot-id").asLong())).toSeq
      else Nil) :+ ((ts, snapId))
      val json = buildMetadata(
        table, meta.get("table-uuid").asText(), schemaNode,
        meta.get("last-column-id").asInt(), snaps, snapId, log,
        pfsNow, history,
        formatVersion = 3,
        lastSequenceNumber = nextSeq,
        extraSpecs = specs,
        properties = propsOf(meta),
        refs = refsOf(meta),
        nextRowId = nextRowIdOf(meta),
        defaultSpecId = defaultSpecIdOf(meta))
      committed = claim(table, curVersion + 1, json)
    }
    Some(snapId)
  }
}
