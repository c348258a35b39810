package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** Read-only Delta Lake table reader built from the OPEN Delta
  * transaction-log protocol (delta-io PROTOCOL.md: a `_delta_log/`
  * directory of zero-padded-version newline-delimited-JSON commits,
  * optionally compacted into parquet checkpoints referenced by
  * `_last_checkpoint`) — no delta-spark dependency, which this
  * offline environment cannot resolve. This closes the "real
  * pipelines read Delta tables" interop gap for the READ side; the
  * write side is [[graft.etl.SnapshotStore]]'s own (simpler) format.
  *
  * Supported: protocol v1 readers — add/remove file replay with
  * last-action-wins per path, partition columns reconstructed from
  * `add.partitionValues` (Delta does not store them in the data
  * files) and cast to the table schema's types, URL-decoded relative
  * or absolute file paths, multi-part checkpoints, time travel via
  * `versionAsOf`, and COLUMN MAPPING in both modes: NAME mode (r12)
  * reads with the stable physical parquet names each field's metadata
  * stores and remaps physical → logical (nested levels included, and
  * `add.partitionValues`' physical keys); ID mode (r13) resolves by
  * parquet FOOTER FIELD-IDS — the read schema keeps logical names and
  * carries `parquet.field.id` = `delta.columnMapping.id`, Spark's
  * field-id read path does the per-file resolution, so renames and
  * early-adopter id-mode tables read correctly with zero remap.
  * Implemented reader features: deletionVectors, columnMapping
  * (both modes), timestampNtz (native TimestampNTZType), and
  * v2Checkpoint (UUID-named checkpoints incl. sidecar file actions).
  * Genuinely unknown reader features fail LOUDLY rather than
  * returning wrong rows.
  *
  * Scale shape: the log replay is metadata work — the same
  * driver-side snapshot state delta-spark itself keeps — bounded by
  * files-in-table, not rows; the DATA read is one
  * `spark.read.parquet` over the active file set (distributed scan,
  * schema pushed down), and partition values attach via ONE broadcast
  * equi-join on the canonical file path (metadata-sized build side),
  * never a per-partition union whose plan would grow with partition
  * count.
  */
object DeltaLog {

  private val mapper = new ObjectMapper()

  private def logDir(table: String): Path = Paths.get(table, "_delta_log")

  /** Zero-padded 20-digit version of a commit/checkpoint file name. */
  private def versionOf(name: String): Long = name.take(20).toLong

  private[sources] case class AddFile(
      path: String, partitionValues: Map[String, String],
      stats: Option[String] = None,
      dv: Option[DeltaDv.Descriptor] = None,
      // ROW TRACKING (PROTOCOL.md): fresh row id = baseRowId +
      // position; the row's commit version defaults to this until a
      // rewrite materializes it
      baseRowId: Option[Long] = None,
      defaultRowCommitVersion: Option[Long] = None,
      // add.tags (PROTOCOL.md: opaque writer metadata) — this writer
      // records whether the file physically carries the materialized
      // row-id columns, so readers never footer-probe self-written
      // files (foreign tables, lacking the tag, still probe)
      tags: Map[String, String] = Map.empty,
      // add.size (bytes) — the DSv2 planner sizes its PartitionedFile
      // slices from the log instead of a per-file filesystem stat
      size: Option[Long] = None)
  private[sources] case class State(
      schemaJson: Option[String],
      partitionCols: Seq[String],
      minReader: Int,
      active: Map[String, AddFile],
      txns: Map[String, Long],
      configuration: Map[String, String] = Map.empty,
      readerFeatures: Set[String] = Set.empty,
      minWriter: Int = 2,
      writerFeatures: Set[String] = Set.empty,
      // the metaData id — a STABLE table identity (delta-spark
      // streaming readers key their offsets on it), so metadata-only
      // re-emits (setProperties) must carry it forward unchanged
      tableId: Option[String] = None,
      // live domainMetadata actions: domain → configuration string
      // (PROTOCOL.md "Domain Metadata"; row tracking rides the
      // `delta.rowTracking` domain's rowIdHighWaterMark)
      domains: Map[String, String] = Map.empty)

  private val empty = State(None, Nil, 1, Map.empty, Map.empty)

  private def applyAction(s: State, a: JsonNode): State = {
    if (a.has("metaData")) {
      val m = a.get("metaData")
      val pcs =
        if (m.has("partitionColumns"))
          m.get("partitionColumns").elements().asScala.map(_.asText()).toSeq
        else Nil
      val conf =
        if (m.has("configuration") && !m.get("configuration").isNull) {
          val o = m.get("configuration")
          o.fieldNames().asScala.map(k => k -> o.get(k).asText()).toMap
        } else Map.empty[String, String]
      s.copy(
        schemaJson = Some(m.get("schemaString").asText()),
        partitionCols = pcs,
        configuration = conf,
        tableId =
          if (m.has("id") && !m.get("id").isNull) Some(m.get("id").asText())
          else s.tableId)
    } else if (a.has("protocol")) {
      val p = a.get("protocol")
      val feats =
        if (p.has("readerFeatures") && !p.get("readerFeatures").isNull)
          p.get("readerFeatures").elements().asScala.map(_.asText()).toSet
        else Set.empty[String]
      val wFeats =
        if (p.has("writerFeatures") && !p.get("writerFeatures").isNull)
          p.get("writerFeatures").elements().asScala.map(_.asText()).toSet
        else Set.empty[String]
      s.copy(
        minReader = p.get("minReaderVersion").asInt(),
        readerFeatures = feats,
        minWriter = Option(p.get("minWriterVersion"))
          .map(_.asInt()).getOrElse(s.minWriter),
        writerFeatures = wFeats)
    } else if (a.has("add")) {
      val ad = a.get("add")
      val path = ad.get("path").asText()
      val pv =
        if (ad.has("partitionValues") && !ad.get("partitionValues").isNull) {
          val o = ad.get("partitionValues")
          o.fieldNames().asScala.map(k => k -> o.get(k).asText()).toMap
        } else Map.empty[String, String]
      val stats =
        if (ad.has("stats") && !ad.get("stats").isNull)
          Some(ad.get("stats").asText())
        else None
      val dv =
        if (ad.has("deletionVector") && !ad.get("deletionVector").isNull) {
          val d = ad.get("deletionVector")
          Some(DeltaDv.Descriptor(
            d.get("storageType").asText(),
            d.get("pathOrInlineDv").asText(),
            Option(d.get("offset")).map(_.asInt()).getOrElse(0),
            d.get("sizeInBytes").asInt(),
            d.get("cardinality").asLong()))
        } else None
      val baseRowId =
        if (ad.has("baseRowId") && !ad.get("baseRowId").isNull)
          Some(ad.get("baseRowId").asLong())
        else None
      val defRcv =
        if (ad.has("defaultRowCommitVersion")
          && !ad.get("defaultRowCommitVersion").isNull)
          Some(ad.get("defaultRowCommitVersion").asLong())
        else None
      val tags =
        if (ad.has("tags") && !ad.get("tags").isNull) {
          val o = ad.get("tags")
          o.fieldNames().asScala.map(k => k -> o.get(k).asText()).toMap
        } else Map.empty[String, String]
      val size =
        if (ad.has("size") && !ad.get("size").isNull)
          Some(ad.get("size").asLong())
        else None
      s.copy(active =
        s.active + (path -> AddFile(path, pv, stats, dv, baseRowId, defRcv,
          tags, size)))
    } else if (a.has("remove")) {
      s.copy(active = s.active - a.get("remove").get("path").asText())
    } else if (a.has("txn")) {
      // streaming-sink idempotence state: last committed version per
      // application id (Delta's exactly-once handshake)
      val t = a.get("txn")
      s.copy(txns =
        s.txns + (t.get("appId").asText() -> t.get("version").asLong()))
    } else if (a.has("domainMetadata")) {
      val d = a.get("domainMetadata")
      val dom = d.get("domain").asText()
      if (d.has("removed") && d.get("removed").asBoolean())
        s.copy(domains = s.domains - dom)
      else s.copy(domains = s.domains + (dom ->
        Option(d.get("configuration")).filterNot(_.isNull)
          .map(c => if (c.isTextual) c.asText() else c.toString)
          .getOrElse("")))
    } else s // commitInfo, cdc — no reader state
  }

  /** Replay one newline-delimited-JSON commit file. */
  private def applyCommit(s: State, file: Path): State =
    Files.readAllLines(file, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty)
      .foldLeft(s)((st, line) => applyAction(st, mapper.readTree(line)))

  /** Load a (possibly multi-part v1, or UUID-named V2) parquet
    * checkpoint into a State — a checkpoint row has exactly one
    * non-null action column, same action vocabulary as the JSON form.
    * V2 checkpoints (PROTOCOL.md "V2 Spec Checkpoints") may move
    * their file actions into SIDECAR parquet files under
    * `_delta_log/_sidecars/`, referenced by `sidecar` action rows in
    * the main file — those load through this same function
    * (recursion depth 1: sidecars cannot reference sidecars). The
    * `checkpointMetadata` action is structural and carries no reader
    * state.
    */
  private def applyCheckpoint(
      spark: SparkSession, s: State, parts: Seq[Path]): State = {
    val df = spark.read.parquet(parts.map(_.toString): _*)
    val cols = df.columns.toSet
    var st = s
    if (cols.contains("sidecar")) {
      val sidecarDir = parts.head.getParent.resolve("_sidecars")
      val sidecars = df.select(col("sidecar.path"))
        .filter(col("path").isNotNull).collect().map(_.getString(0))
        .map { p =>
          // a bare file name resolves under _sidecars/; URIs strip
          // their scheme (local-path module contract)
          val clean = p.replaceFirst("^file:/*", "/")
          if (clean.startsWith("/")) Paths.get(clean)
          else sidecarDir.resolve(clean)
        }.toSeq
      if (sidecars.nonEmpty) st = applyCheckpoint(spark, st, sidecars)
    }
    if (cols.contains("protocol")) {
      val protoFields = df.schema("protocol").dataType
        .asInstanceOf[StructType].fieldNames.toSet
      def featCol(name: String) =
        if (protoFields.contains(name)) col(s"protocol.$name")
        else lit(null).cast("array<string>").as(name)
      val p = df.select(
        col("protocol.minReaderVersion"),
        featCol("readerFeatures"),
        if (protoFields.contains("minWriterVersion"))
          col("protocol.minWriterVersion")
        else lit(null).cast("int").as("minWriterVersion"),
        featCol("writerFeatures"))
        .filter(col("minReaderVersion").isNotNull).collect()
      p.headOption.foreach(r => st = st.copy(
        minReader = r.getInt(0),
        readerFeatures = Option(r.getSeq[String](1))
          .map(_.toSet).getOrElse(Set.empty),
        minWriter = if (r.isNullAt(2)) st.minWriter else r.getInt(2),
        writerFeatures = Option(r.getSeq[String](3))
          .map(_.toSet).getOrElse(Set.empty)))
    }
    if (cols.contains("metaData")) {
      val mdFields = df.schema("metaData").dataType
        .asInstanceOf[StructType].fieldNames.toSet
      val hasConf = mdFields.contains("configuration")
      val hasId = mdFields.contains("id")
      val m = df
        .select(
          col("metaData.schemaString"),
          col("metaData.partitionColumns"),
          if (hasConf) col("metaData.configuration")
          else lit(null).cast("map<string,string>").as("configuration"),
          if (hasId) col("metaData.id")
          else lit(null).cast("string").as("id"))
        .filter(col("schemaString").isNotNull).collect()
      m.headOption.foreach(r =>
        st = st.copy(
          schemaJson = Some(r.getString(0)),
          partitionCols = r.getSeq[String](1),
          configuration = Option(r.getMap[String, String](2))
            .map(_.toMap).getOrElse(Map.empty),
          tableId = Option(r.getString(3)).orElse(st.tableId)))
    }
    if (cols.contains("txn")) {
      val ts = df.select(col("txn.appId"), col("txn.version"))
        .filter(col("appId").isNotNull).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      st = st.copy(txns = st.txns ++ ts)
    }
    if (cols.contains("add")) {
      // the checkpoint's add set IS the active set at its version —
      // bounded by files-in-table (the state delta-spark also holds)
      val addFields = df.schema("add").dataType
        .asInstanceOf[StructType].fieldNames.toSet
      val dvCol =
        if (addFields.contains("deletionVector")) col("add.deletionVector")
        else lit(null).cast(
          "struct<storageType:string,pathOrInlineDv:string," +
            "offset:int,sizeInBytes:int,cardinality:bigint>")
          .as("deletionVector")
      def optLong(name: String) =
        if (addFields.contains(name)) col(s"add.$name")
        else lit(null).cast("bigint").as(name)
      val tagsCol =
        if (addFields.contains("tags")) col("add.tags")
        else lit(null).cast("map<string,string>").as("tags")
      val adds = df
        .select(col("add.path"), col("add.partitionValues"),
          if (addFields.contains("stats")) col("add.stats")
          else lit(null).cast("string").as("stats"),
          dvCol, optLong("baseRowId"), optLong("defaultRowCommitVersion"),
          tagsCol, optLong("size"))
        .filter(col("path").isNotNull).collect()
        .map { r =>
          val dv = Option(r.getStruct(3)).filter(!_.isNullAt(0)).map(s =>
            DeltaDv.Descriptor(s.getString(0), s.getString(1),
              s.getInt(2), s.getInt(3), s.getLong(4)))
          r.getString(0) -> AddFile(
            r.getString(0),
            Option(r.getMap[String, String](1))
              .map(_.toMap).getOrElse(Map.empty),
            Option(r.getString(2)),
            dv,
            if (r.isNullAt(4)) None else Some(r.getLong(4)),
            if (r.isNullAt(5)) None else Some(r.getLong(5)),
            Option(r.getMap[String, String](6))
              .map(_.toMap).getOrElse(Map.empty),
            if (r.isNullAt(7)) None else Some(r.getLong(7)))
        }
      st = st.copy(active = st.active ++ adds)
    }
    // ROW-TRACKING state must survive log cleanup: a checkpoint that
    // dropped the domainMetadata rows would silently reset the
    // rowIdHighWaterMark and the next append would REUSE row ids
    if (cols.contains("domainMetadata")) {
      // a FOREIGN checkpoint may retain removed=true tombstones until
      // their expiry (PROTOCOL.md) — replaying one as a live domain
      // would resurrect a stale delta.rowTracking watermark; the JSON
      // replay path already skips them, so must this one
      val dmFields = df.schema("domainMetadata").dataType
        .asInstanceOf[StructType].fieldNames.toSet
      val removedCol =
        if (dmFields.contains("removed")) col("domainMetadata.removed")
        else lit(null).cast("boolean").as("removed")
      val ds = df
        .select(col("domainMetadata.domain"),
          col("domainMetadata.configuration"), removedCol)
        .filter(col("domain").isNotNull).collect()
      val (tombs, live) =
        ds.partition(r => !r.isNullAt(2) && r.getBoolean(2))
      st = st.copy(domains = st.domains ++
        live.map(r => r.getString(0) ->
          Option(r.getString(1)).getOrElse("")) --
        tombs.map(_.getString(0)))
    }
    st
  }

  /** The snapshot state at `versionAsOf` (or latest): checkpoint ≤
    * version if one exists, then the JSON commits after it, replayed
    * in order.
    */
  private[sources] def stateAt(
      spark: SparkSession, table: String, versionAsOf: Option[Long]): State = {
    val dir = logDir(table)
    require(Files.isDirectory(dir), s"not a Delta table (no _delta_log): $table")
    val entries = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString).toVector
      finally s.close()
    }
    val commits = entries.filter(_.matches("\\d{20}\\.json"))
      .map(n => versionOf(n) -> n).sortBy(_._1)
    // classic (single or .N.M multi-part) checkpoints, plus the
    // UUID-named V2 form
    val checkpoints = entries
      .filter(n =>
        n.matches("\\d{20}\\.checkpoint(\\.\\d+\\.\\d+)?\\.parquet") ||
          n.matches("\\d{20}\\.checkpoint\\.[0-9a-fA-F][0-9a-fA-F-]{7,}\\.parquet"))
      .groupBy(versionOf).toSeq.sortBy(_._1)
    val latest = versionAsOf.getOrElse(
      (commits.map(_._1) ++ checkpoints.map(_._1)).maxOption.getOrElse(
        throw new IllegalStateException(s"empty _delta_log at $table")))
    require(
      commits.exists(_._1 == latest) || checkpoints.exists(_._1 == latest),
      s"version $latest does not exist in $table (time travel past the log)")
    val ckpt = checkpoints.filter(_._1 <= latest).lastOption
    val base = ckpt match {
      case Some((_, parts)) =>
        applyCheckpoint(spark, empty, parts.sorted.map(dir.resolve))
      case None => empty
    }
    val from = ckpt.map(_._1 + 1).getOrElse(0L)
    val st = commits
      .filter { case (v, _) => v >= from && v <= latest }
      .foldLeft(base) { case (s, (_, n)) => applyCommit(s, dir.resolve(n)) }
    // Protocol gate (narrowed again r13): v1 plain tables; v2 tables
    // with NAME- or ID-mode column mapping; and v3 feature-gated
    // tables whose readerFeatures this module actually implements —
    // deletionVectors (applied in the read below), columnMapping
    // (both modes: name resolves by stable physical name, id by
    // parquet footer field-ids), and timestampNtz (schemaString
    // parses to Spark's native TimestampNTZType; the parquet encoding
    // is INT64 isAdjustedToUTC=false, which the scan reads directly —
    // the feature flag exists because OLD readers would misread NTZ
    // as instants, which this reader does not), and v2Checkpoint
    // (UUID-named checkpoints with sidecar file actions — see
    // applyCheckpoint). Everything else — genuinely unknown reader
    // features — is refused loudly: wrong rows would be worse than
    // no rows.
    val mappingMode = st.configuration
      .getOrElse("delta.columnMapping.mode", "none")
    // typeWidening (r16): a widened table's schemaString carries the
    // WIDE type while files written pre-widen carry the narrow
    // physical type; Spark 4's parquet readers perform the spec's
    // lossless promotions (int32→long, int→double, float→double,
    // decimal growth) at scan time, so reading with the wide schema
    // IS the implementation — an unsupported promotion fails the scan
    // loudly, never returns wrong rows. Both the GA and preview
    // feature names are accepted (delta-spark wrote
    // `typeWidening-preview` through 3.x previews).
    // variantType (r16): schemaString's `variant` parses to Spark's
    // native VariantType and the parquet scan decodes the open
    // variant binary encoding (metadata dictionary + value) that
    // Spark itself writes.
    // variantShredding (r17): shredded files carry the Parquet
    // Variant Shredding layout (`typed_value` groups beside
    // metadata/value); Spark's parquet variant converter REBUILDS
    // shredded and unshredded columns alike
    // (spark.sql.variant.allowReadingShredded, default on), so
    // reading the null `value` of a shredded-away field as the value
    // — the wrong-rows hazard that kept this on the refusal list —
    // never happens: the scan goes through the rebuilding converter,
    // not the raw group fields.
    val implemented =
      Set("deletionVectors", "columnMapping", "timestampNtz", "v2Checkpoint",
        "typeWidening", "typeWidening-preview",
        "variantType", "variantType-preview",
        "variantShredding", "variantShredding-preview")
    val modes = Set("none", "name", "id")
    val ok = st.minReader match {
      case v if v <= 1 => true
      case 2 => mappingMode == "name" || mappingMode == "id"
      case 3 =>
        st.readerFeatures.nonEmpty &&
          st.readerFeatures.subsetOf(implemented) &&
          modes(mappingMode)
      case _ => false
    }
    require(ok,
      s"unsupported Delta protocol: table requires minReaderVersion=" +
        s"${st.minReader} (readerFeatures=${st.readerFeatures.toSeq.sorted
          .mkString(",")}) with columnMapping.mode=$mappingMode; this " +
        "reader implements protocol v1, name- and id-mode column " +
        "mapping and deletion vectors, and refuses the rest rather " +
        "than returning wrong rows")
    require(st.schemaJson.nonEmpty, s"no metaData action found in $table")
    st
  }

  /** `delta.columnMapping.physicalName` of a field (name-mode tables
    * store the stable physical parquet name in each field's metadata;
    * unmapped fields keep their logical name).
    */
  private[sources] def physName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  /** The schema as written in the parquet files of a name-mapped
    * table: every field (at every nesting level) renamed to its
    * physicalName.
    */
  private[sources] def toPhysical(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f =>
        f.copy(name = physName(f), dataType = toPhysical(f.dataType))))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = toPhysical(a.elementType))
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = toPhysical(m.keyType),
        valueType = toPhysical(m.valueType))
    case other => other
  }

  /** The ID-mode read schema: every field (at every nesting level)
    * KEEPS its logical name but carries `parquet.field.id` =
    * `delta.columnMapping.id`, so Spark's parquet reader (with
    * `spark.sql.parquet.fieldId.read.enabled`) resolves the column
    * from the footer's field-ids regardless of its physical name —
    * the protocol's id-mode resolution rule. No physical→logical
    * remap is needed afterwards: the scan's output names ARE logical.
    */
  private[sources] def withFieldIds(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map { f =>
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
        if (f.metadata.contains("delta.columnMapping.id"))
          mb.putLong("parquet.field.id",
            f.metadata.getLong("delta.columnMapping.id"))
        f.copy(metadata = mb.build(), dataType = withFieldIds(f.dataType))
      })
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = withFieldIds(a.elementType))
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = withFieldIds(m.keyType),
        valueType = withFieldIds(m.valueType))
    case other => other
  }

  /** `file:`-scheme- and URL-decoding-insensitive canonical path, so
    * `input_file_name()`'s URI spelling joins against the log's
    * (URL-encoded, usually relative) `add.path`.
    */
  private def canon(abs: String): String =
    java.net.URLDecoder
      .decode(abs.replaceFirst("^file:/*", "/"), "UTF-8")
      .replaceAll("/+", "/")

  /** Absolute data-file path for an add entry (add.path may be
    * URL-encoded and relative to the table root, or absolute).
    */
  private[sources] def absPath(table: String, rel: String): String = {
    val decoded = java.net.URLDecoder.decode(rel, "UTF-8")
    if (decoded.startsWith("/") || decoded.contains("://"))
      canon(decoded)
    else canon(Paths.get(table).toAbsolutePath.toString + "/" + decoded)
  }

  /** The active-file frame of the snapshot: (file, one column per
    * partition key as STRING). Exposed for audits; `read` is the
    * data-facing API.
    */
  def activeFiles(
      spark: SparkSession, table: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val st = stateAt(spark, table, versionAsOf)
    // name-mapped tables key add.partitionValues by PHYSICAL name;
    // the emitted columns stay logical (physName = the logical name
    // on unmapped tables, so this is one code path)
    val physKey: Map[String, String] = st.schemaJson.map { js =>
      val schema = DataType.fromJson(js).asInstanceOf[StructType]
      st.partitionCols.map(c =>
        c -> schema.fields.find(_.name == c).map(physName).getOrElse(c)).toMap
    }.getOrElse(Map.empty)
    val rows = st.active.values.toSeq
      .map(a => (absPath(table, a.path),
        st.partitionCols.map(c =>
          a.partitionValues.getOrElse(physKey.getOrElse(c, c), null))))
    rows.map { case (f, pv) => (f, pv) }.toDF("file", "pv")
      .select(
        col("file") +:
          st.partitionCols.zipWithIndex.map { case (c, i) =>
            col("pv").getItem(i).as(c)
          }: _*)
  }

  /** Read the table at `versionAsOf` (or latest). Columns appear in
    * table-schema order; partition columns are reconstructed from the
    * log and cast to their declared types.
    */
  def read(
      spark: SparkSession, table: String,
      versionAsOf: Option[Long] = None): DataFrame =
    readCore(spark, table, versionAsOf, _ => true)

  /** One add.stats JSON value ordered against a predicate bound in the
    * value domain: numbers numerically, booleans false < true, strings
    * and ISO dates lexicographically (ISO dates ARE lexicographic).
    * TEMPORAL bounds (Timestamp/Instant/Date/LocalDateTime) are parsed
    * into the time domain on BOTH sides — foreign delta-spark tables
    * write timestamp stats in ISO 'T' form while
    * `java.sql.Timestamp.toString` uses a space, and since 'T' > ' ' a
    * lexicographic comparison inverts same-day bounds and prunes files
    * that match. If the stat text does not parse temporally the file
    * is KEPT (skipping is an optimization, never a correctness call).
    */
  private def toInstant(s: String): Option[java.time.Instant] = {
    import java.time._
    val t = s.trim
    def tryP(f: => Instant): Option[Instant] =
      try Some(f) catch { case _: Exception => None }
    tryP(Instant.parse(t))
      .orElse(tryP(OffsetDateTime.parse(t).toInstant))
      .orElse(tryP(LocalDateTime.parse(t.replace(' ', 'T'))
        .toInstant(ZoneOffset.UTC)))
      .orElse(tryP(LocalDate.parse(t).atStartOfDay.toInstant(ZoneOffset.UTC)))
  }
  private def boundInstant(b: Any): Option[java.time.Instant] = b match {
    case t: java.sql.Timestamp => Some(t.toInstant)
    // Date via its ISO string (not getTime, which is JVM-TZ-local) so
    // both sides land in the same UTC frame
    case d: java.sql.Date => toInstant(d.toString)
    case i: java.time.Instant => Some(i)
    case d: java.time.LocalDate =>
      Some(d.atStartOfDay.toInstant(java.time.ZoneOffset.UTC))
    case d: java.time.LocalDateTime =>
      Some(d.toInstant(java.time.ZoneOffset.UTC))
    case _ => None
  }
  private def statLeq(a: JsonNode, b: Any): Boolean = (a, b) match {
    case (n, x: java.lang.Number) if n.isNumber =>
      BigDecimal(n.asText()) <= BigDecimal(x.toString)
    case (n, x) if n.isTextual => boundInstant(x) match {
      case Some(bi) => toInstant(n.asText()).forall(!_.isAfter(bi))
      case None => n.asText() <= x.toString
    }
    case (n, x: Boolean) if n.isBoolean => !n.asBoolean() || x
    case _ => true // incomparable → cannot prune on it
  }
  private def statGeq(a: JsonNode, b: Any): Boolean = (a, b) match {
    case (n, x: java.lang.Number) if n.isNumber =>
      BigDecimal(n.asText()) >= BigDecimal(x.toString)
    case (n, x) if n.isTextual => boundInstant(x) match {
      case Some(bi) => toInstant(n.asText()).forall(!_.isBefore(bi))
      case None => n.asText() >= x.toString
    }
    case (n, x: Boolean) if n.isBoolean => n.asBoolean() || !x
    case _ => true
  }

  /** The active files that COULD hold a row with `column` ∈ [lo, hi],
    * by their add.stats min/max — (kept, total). Files without stats
    * for the column are kept (skipping is an optimization, never a
    * correctness decision); a file whose column is entirely null is
    * dropped (a range predicate never matches null). Driver-side
    * metadata work bounded by files-in-table.
    */
  def prunedFiles(
      spark: SparkSession, table: String, column: String,
      lo: Any, hi: Any,
      versionAsOf: Option[Long] = None): (Seq[String], Int) = {
    val st = stateAt(spark, table, versionAsOf)
    // column-mapped tables key add.stats by PHYSICAL name — the
    // logical-name lookup would silently degrade to keep-all
    val statKey = st.schemaJson.flatMap { js =>
      DataType.fromJson(js).asInstanceOf[StructType]
        .fields.find(_.name == column).map(physName)
    }.getOrElse(column)
    val kept = st.active.values.toSeq.filter { a =>
      a.stats.forall { js =>
        try {
          val s = mapper.readTree(js)
          val mn = Option(s.get("minValues")).flatMap(m => Option(m.get(statKey)))
          val mx = Option(s.get("maxValues")).flatMap(m => Option(m.get(statKey)))
          val allNull = for {
            nc <- Option(s.get("nullCount")).flatMap(m => Option(m.get(statKey)))
            n <- Option(s.get("numRecords"))
          } yield nc.asLong() == n.asLong() && n.asLong() > 0L
          if (allNull.contains(true)) false
          else (mn, mx) match {
            // keep iff [min,max] ∩ [lo,hi] ≠ ∅
            case (Some(a2), Some(b2)) => statLeq(a2, hi) && statGeq(b2, lo)
            case _ => true
          }
        } catch { case _: Exception => true }
      }
    }.map(_.path).sorted
    (kept, st.active.size)
  }

  /** Log-level FILE SKIPPING read: `read(...)` restricted to the
    * [[prunedFiles]] of `column` ∈ [lo, hi], with the row-level filter
    * still applied — semantics identical to
    * `read(...).filter(col(column).between(lo, hi))`, cost proportional
    * to the files that can match. At 100 TB this is THE scan lever: a
    * z-ordered table answers a 2-D range probe from a handful of
    * files.
    */
  def readRange(
      spark: SparkSession, table: String, column: String,
      lo: Any, hi: Any,
      versionAsOf: Option[Long] = None): DataFrame = {
    val keep = prunedFiles(spark, table, column, lo, hi, versionAsOf)
      ._1.toSet
    readCore(spark, table, versionAsOf, a => keep.contains(a.path))
      .filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }

  private def readCore(
      spark: SparkSession, table: String,
      versionAsOf: Option[Long],
      fileFilter: AddFile => Boolean): DataFrame = {
    val st0 = stateAt(spark, table, versionAsOf)
    val st = st0.copy(active = st0.active.filter {
      case (_, a) => fileFilter(a)
    })
    val schema = DataType.fromJson(st.schemaJson.get).asInstanceOf[StructType]
    val mapMode = st.configuration
      .getOrElse("delta.columnMapping.mode", "none")
    val mapped = mapMode == "name"
    val idMapped = mapMode == "id"
    val dataFields = schema.fields.filterNot(f =>
      st.partitionCols.contains(f.name))
    // name-mapped tables store PHYSICAL column names in the parquet
    // files: read with the physical schema, then remap physical →
    // logical below (top level by alias, nested levels by a
    // structurally-identical cast, which renames positionally).
    // id-mapped tables resolve by parquet FOOTER FIELD-IDS instead —
    // the read schema keeps logical names and carries the ids.
    val dataSchema =
      if (mapped)
        StructType(dataFields.map(f =>
          f.copy(name = physName(f),
            dataType = toPhysical(f.dataType))))
      else if (idMapped)
        withFieldIds(StructType(dataFields)).asInstanceOf[StructType]
      else StructType(dataFields)
    val files = st.active.values.toSeq.map(a => absPath(table, a.path))
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .select(schema.fieldNames.map(col): _*)
    if (idMapped) {
      // runtime-settable; only changes behavior for read schemas that
      // carry parquet.field.id metadata (exactly this scan). A footer
      // WITHOUT ids then fails loudly instead of name-matching.
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    }
    // listing-free scan over the log's exact file set (see
    // graftext.KnownFiles — the replayed state IS the listing)
    val scanned = org.apache.spark.sql.graftext.KnownFiles
      .parquetFrame(spark, dataSchema, files)
    // DELETION VECTORS: a DV'd file's rows filter by their in-file
    // row index — the deleted (file, index) pairs build an anti-join
    // side (bounded by total deleted rows; the metadata-not-data
    // discipline every DV reader shares), resolved per row against
    // parquet's _metadata.row_index
    val dvPairs: Seq[(String, Long)] = st.active.values.toSeq.flatMap { a =>
      a.dv.toSeq.flatMap(d =>
        DeltaDv.indexesOf(table, d).map(idx => (absPath(table, a.path), idx)))
    }
    val data =
      if (dvPairs.isEmpty) scanned
      else {
        import spark.implicits._
        val deleted = dvPairs.toDF("__dv_file", "__dv_idx")
        scanned
          .withColumn("__dv_f", udfFreeCanon(col("_metadata.file_path")))
          .withColumn("__dv_i", col("_metadata.row_index"))
          .join(broadcast(deleted),
            col("__dv_f") === col("__dv_file") &&
              col("__dv_i") === col("__dv_idx"),
            "left_anti")
          .drop("__dv_f", "__dv_i")
      }
    val withParts =
      if (st.partitionCols.isEmpty) data
      else {
        val pvFrame = activeFiles(spark, table, versionAsOf)
        data
          .withColumn("__canon_file", udfFreeCanon(input_file_name()))
          .join(broadcast(pvFrame), col("__canon_file") === col("file"))
          .drop("__canon_file", "file")
      }
    withParts.select(schema.fields.map { f =>
      if (st.partitionCols.contains(f.name))
        col(f.name).cast(f.dataType).as(f.name)
      else if (mapped)
        col(physName(f)).cast(f.dataType).as(f.name)
      else col(f.name) // id-mapped scans already emit logical names
    }: _*)
  }

  /** [[canon]] as a codegen-friendly column expression (no Scala UDF):
    * strip the `file:` scheme, URL-decode, squeeze slashes.
    */
  private def udfFreeCanon(c: org.apache.spark.sql.Column) =
    regexp_replace(
      url_decode(regexp_replace(c, "^file:/*", "/")), "/+", "/")

  /** The last `txn` version committed for `appId`, or None — the
    * reader half of Delta's exactly-once streaming handshake: a
    * restarted sink asks this before re-committing a replayed batch.
    */
  def lastTxnVersion(
      spark: SparkSession, table: String, appId: String): Option[Long] =
    stateAt(spark, table, None).txns.get(appId)

  /** Latest snapshot version of the table. */
  def version(spark: SparkSession, table: String): Long = {
    val dir = logDir(table)
    val entries = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString).toVector
      finally s.close()
    }
    (entries.filter(_.matches("\\d{20}\\.json")) ++
      entries.filter(n =>
        n.matches("\\d{20}\\.checkpoint(\\.\\d+\\.\\d+)?\\.parquet") ||
          n.matches("\\d{20}\\.checkpoint\\.[0-9a-fA-F][0-9a-fA-F-]{7,}\\.parquet")))
      .map(versionOf).maxOption
      .getOrElse(throw new IllegalStateException(s"empty _delta_log at $table"))
  }

  /** (version, commit timestamp ms) per JSON commit, timestamps
    * MONOTONIC-ADJUSTED the way delta-spark resolves timestamp time
    * travel: each commit's declared IN-COMMIT TIMESTAMP
    * (`commitInfo.inCommitTimestamp`, PROTOCOL.md — authoritative
    * when present: a log copied between object stores gets its file
    * mtimes rewritten, and resolving those would pick the WRONG
    * version on any foreign ICT table) falling back to the commit
    * FILE's modification time for pre-enablement/legacy commits, each
    * entry raised to at least its predecessor's (clock skew between
    * writers must not make a later version resolve earlier; the raise
    * also bridges the mtime→ICT enablement boundary). Commits cleaned
    * past a checkpoint are absent — timestamp travel only reaches
    * what the log retains.
    */
  private def commitTimeline(table: String): Seq[(Long, Long)] = {
    val dir = logDir(table)
    require(Files.isDirectory(dir), s"not a Delta table (no _delta_log): $table")
    val entries = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString).toVector
      finally s.close()
    }
    def ictOf(n: String): Option[Long] =
      Files.readAllLines(dir.resolve(n), StandardCharsets.UTF_8).asScala
        .filter(_.startsWith("""{"commitInfo""""))
        .flatMap { l =>
          val node = mapper.readTree(l)
          Option(node.get("commitInfo"))
            .flatMap(ci => Option(ci.get("inCommitTimestamp")))
            .map(_.asLong())
        }.headOption
    val raw = entries.filter(_.matches("\\d{20}\\.json")).sorted
      .map(n => versionOf(n) -> ictOf(n).getOrElse(
        Files.getLastModifiedTime(dir.resolve(n)).toMillis))
    var prev = Long.MinValue
    raw.map { case (v, t) =>
      prev = math.max(prev, t)
      (v, prev)
    }
  }

  /** The monotonic timestamp of the LATEST retained commit (0 when
    * none) — the floor the ICT enablement commit must clear.
    */
  private[sources] def lastCommitTimestamp(table: String): Long =
    commitTimeline(table).lastOption.map(_._2).getOrElse(0L)

  /** Resolve a timestamp to a version — the latest commit at or
    * before `timestampMs` (delta-spark's `timestampAsOf`). Before the
    * first retained commit or after the last: refused loudly with the
    * usable bounds, exactly the errors delta-spark raises.
    */
  def versionAtTimestamp(table: String, timestampMs: Long): Long = {
    val tl = commitTimeline(table)
    require(tl.nonEmpty,
      s"no JSON commits retained at $table: timestamp travel needs the log")
    require(timestampMs >= tl.head._2,
      s"timestamp $timestampMs is before the earliest retained commit " +
        s"(${tl.head._2}, version ${tl.head._1})")
    require(timestampMs <= tl.last._2,
      s"timestamp $timestampMs is after the latest commit " +
        s"(${tl.last._2}, version ${tl.last._1}): cannot time travel " +
        "to the future")
    tl.takeWhile(_._2 <= timestampMs).last._1
  }

  /** [[read]] at the version in effect at `timestampMs`. */
  def readAsOfTimestamp(
      spark: SparkSession, table: String, timestampMs: Long): DataFrame =
    read(spark, table, Some(versionAtTimestamp(table, timestampMs)))

  /** DESCRIBE HISTORY — one row per retained JSON commit:
    * (version, timestamp ms, operation), newest first like
    * delta-spark's. Operations come from each commit's `commitInfo`
    * (absent → null); timestamps are the monotonic-adjusted commit
    * times [[versionAtTimestamp]] resolves against, so history and
    * timestamp travel can never disagree.
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    val dir = logDir(table)
    val ops = commitTimeline(table).map { case (v, t) =>
      val lines = Files.readAllLines(
        dir.resolve(f"$v%020d.json"), java.nio.charset.StandardCharsets.UTF_8)
      val op = lines.asScala.map(mapper.readTree)
        .find(_.has("commitInfo"))
        .flatMap(n => Option(n.get("commitInfo").get("operation")))
        .map(_.asText()).orNull
      (v, t, op)
    }.sortBy(-_._1)
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      ops.map { case (v, t, op) => Row(v, t, op) }.asJava,
      StructType(Seq(
        org.apache.spark.sql.types.StructField("version", LongType),
        org.apache.spark.sql.types.StructField("timestamp", LongType),
        org.apache.spark.sql.types.StructField("operation", StringType))))
  }
}
