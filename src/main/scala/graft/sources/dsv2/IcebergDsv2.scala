package graft.sources.dsv2

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.graftext.ParquetReadBridge
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._

import graft.sources.{IcebergBounds, IcebergTable, Puffin}

/** DataSourceV2 read path over the Iceberg metadata reader — the
  * [[DeltaTableProvider]] twin:
  *
  * {{{
  *   spark.read.format("graft-iceberg").load(path)      // current snapshot
  *     .option("snapshotId", 123L)                      // time travel
  *     .option("ref", "audit-branch")                   // branch / tag
  *     .option("timestampAsOf", "2026-08-01T00:00:00Z")
  * }}}
  *
  * `.filter(...)` prunes files against the manifests'
  * `lower_bounds`/`upper_bounds`/`null_value_counts` and exact
  * identity-partition values (the same state
  * [[IcebergTable.prunedDataFiles]] consults), then pushes into
  * parquet row-group skipping; `.select(...)` prunes columns to the
  * scan. Merge-on-read semantics apply per file inside the shared
  * [[GraftFileBatch]] readers: position deletes and puffin deletion
  * vectors as row-index drops, equality deletes as per-row key-set
  * checks SCOPED to delete files whose sequence number is strictly
  * above the data file's (the spec rule `readCore`'s anti-join
  * enforces — iceberg-spark's own readers apply the same sets per
  * task).
  *
  * Scope gate: single-era tables (no pending schema-evolution remap
  * across manifests) — a table whose older files need field-id
  * renames/promotions is REFUSED loudly, pointing at
  * [[IcebergTable.read]] which resolves every era. Identity-partition
  * columns absent from the data files attach through the
  * partition-values mechanism of Spark's own parquet reader.
  */
class IcebergTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  override def supportsExternalMetadata(): Boolean = false

  private def path(options: JMap[String, String]): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-iceberg requires a table path: .load(path)"))

  override def inferSchema(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : StructType =
    IcebergDsv2.plan(SparkSession.active, path(options),
      options.asScala.toMap).schema

  override def inferPartitioning(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : Array[Transform] = Array.empty

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new IcebergDsv2Table(path(properties), schema,
      properties.asScala.toMap.map { case (k, v) => (k.toLowerCase, v) })
}

private[dsv2] object IcebergDsv2 {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def opt(options: Map[String, String], key: String): Option[String] =
    options.get(key.toLowerCase)

  /** `file:`-scheme- and URL-decoding-insensitive canonical path (the
    * discipline position-delete `file_path` joins require).
    */
  def canon(abs: String): String =
    java.net.URLDecoder
      .decode(abs.replaceFirst("^file:/*", "/"), "UTF-8")
      .replaceAll("/+", "/")

  /** Everything the scan planner derives once per query. */
  case class Planned(
      schema: StructType,
      entries: Seq[IcebergTable.FileEntry],
      // identity-partition columns attached from metadata:
      // (logical column name, partition FIELD name — the key of each
      // entry's pv map), uniform across entries (gated)
      idCols: Seq[(String, String)],
      // per-file deleted positions (canonical path → sorted indexes)
      dropByFile: Map[String, Array[Long]],
      // equality-delete files: (key cols, external value tuples, seq)
      eqDeletes: Seq[(Seq[String], Seq[Seq[Any]], Long)],
      fieldIdOf: Map[String, Int])

  def plan(
      spark: SparkSession, table: String,
      options: Map[String, String]): Planned = {
    val meta = IcebergTable.metadataJson(table)
    val fv = meta.get("format-version").asInt()
    val snapId = opt(options, "snapshotId").map(_.toLong)
      .orElse(opt(options, "ref").map { r =>
        if (r == "main") IcebergTable.currentSnapshotNode(meta)
          .get("snapshot-id").asLong()
        else IcebergTable.refs(table).getOrElse(r,
          throw new IllegalArgumentException(
            s"no branch or tag named $r on $table"))._1
      })
      .orElse(opt(options, "timestampAsOf").map { ts =>
        val ms = scala.util.Try(ts.toLong).getOrElse(
          java.time.Instant.parse(ts).toEpochMilli)
        IcebergTable.snapshotAtTimestamp(table, ms)
      })
    val snap = IcebergTable.snapshotNode(meta, snapId)
    // the snapshot's own schema (spec `schema-id`), current otherwise
    val schemaNode = Option(snap.get("schema-id")).map(_.asInt())
      .filter(_ => meta.has("schemas"))
      .flatMap(sid => meta.get("schemas").elements().asScala
        .find(_.get("schema-id").asInt() == sid))
      .getOrElse(IcebergTable.schemaNodeOf(meta))
    val schema =
      IcebergTable.toSparkType(schemaNode).asInstanceOf[StructType]
    val fieldIdOf: Map[String, Int] = schemaNode.get("fields")
      .elements().asScala
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
    val idToName = fieldIdOf.map(_.swap)

    val entries = IcebergTable.dataFilesWithPartitions(table, meta, snap)

    // ---- single-era gate -------------------------------------------------
    def idColsOf(e: IcebergTable.FileEntry): Seq[(String, String)] =
      e.idFields.flatMap { case (pfName, sid) =>
        idToName.get(sid).filter(schema.fieldNames.contains)
          .map(src => (src, pfName))
      }
    val idColSets = entries.map(e => idColsOf(e)).distinct
    require(idColSets.size <= 1,
      s"$table mixes partition-spec eras (identity columns differ per " +
        "manifest): graft-iceberg (DSv2) reads single-era tables — use " +
        "graft.sources.IcebergTable.read, which resolves every era")
    val idCols = idColSets.headOption.getOrElse(Nil)
    val curById: Map[Int, (String, DataType)] = schemaNode.get("fields")
      .elements().asScala.map(f => f.get("id").asInt() ->
        (f.get("name").asText(), IcebergTable.toSparkType(f.get("type"))))
      .toMap
    entries.flatMap(_.writerSchemaJson).distinct.foreach { ws =>
      val writerById = mapper.readTree(ws).get("fields")
        .elements().asScala
        .map(f => f.get("id").asInt() ->
          (f.get("name").asText(), IcebergTable.toSparkType(f.get("type"))))
        .toMap
      curById.foreach { case (id, (name, dt)) =>
        if (!idCols.exists(_._1 == name)) {
          val w = writerById.get(id)
          require(w.contains((name, dt)),
            s"$table has schema-evolved files (field $name/id $id was " +
              s"${w.getOrElse("absent")} at write time): graft-iceberg " +
              "(DSv2) reads single-era tables — use " +
              "graft.sources.IcebergTable.read")
        }
      }
    }

    // ---- deletes ---------------------------------------------------------
    val deletes = IcebergTable.deleteFilesOf(table, meta, snap)
    val dvFiles = deletes.filter(d => d.content == 1 && d.format == "PUFFIN")
    val posDeletes = deletes
      .filter(d => d.content == 1 && d.format != "PUFFIN").map(_.path)
    require(fv < 3 || posDeletes.isEmpty,
      s"format-version 3 table $table carries parquet position-delete " +
        "files (the spec requires deletion vectors): refused")
    val posPairs: Seq[(String, Long)] =
      (if (posDeletes.isEmpty) Nil
      else spark.read
        .schema(StructType.fromDDL("file_path STRING, pos BIGINT"))
        .parquet(posDeletes: _*)
        .collect().toSeq
        .map(r => (canon(r.getString(0)), r.getLong(1)))) ++
        dvFiles.flatMap { d =>
          val blob = (d.contentOffset, d.contentSize) match {
            case (Some(off), Some(len)) => Puffin.readBlob(d.path, off, len)
            case _ =>
              val metaBlob = Puffin.readFooter(d.path)
                .find(b => b.tpe == "deletion-vector-v1" &&
                  b.properties.get("referenced-data-file")
                    .map(canon).contains(canon(d.referencedDataFile.get)))
                .getOrElse(throw new IllegalStateException(
                  s"no deletion-vector-v1 blob for " +
                    s"${d.referencedDataFile.get} in ${d.path}"))
              Puffin.readBlob(d.path, metaBlob.offset, metaBlob.length)
          }
          Puffin.dvBlobIndexes(blob)
            .map(i => (canon(d.referencedDataFile.get), i))
        }
    val dropByFile: Map[String, Array[Long]] =
      posPairs.groupBy(_._1).map { case (f, ps) =>
        f -> ps.map(_._2).distinct.sorted.toArray
      }

    val eqDeleteSpecs = deletes.filter(_.content == 2).map { d =>
      val keyCols = d.equalityIds.map { id =>
        val (n, dt) = curById.getOrElse(id,
          throw new IllegalStateException(
            s"equality delete references field-id $id which is not in " +
              "the current schema (dropped key column): refused rather " +
              "than returning undeleted rows"))
        (n, dt)
      }
      val values = spark.read.parquet(d.path)
        .select(keyCols.map { case (n, dt) =>
          org.apache.spark.sql.functions.col(n).cast(dt)
        }: _*)
        .collect().toSeq
        .map(r => keyCols.indices.map(i => r.get(i)))
      (keyCols.map(_._1), values, d.seq)
    }

    Planned(schema, entries, idCols, dropByFile, eqDeleteSpecs, fieldIdOf)
  }

  /** Manifest bounds as a [[FilterPrune.ColumnStats]] view. */
  def statsView(
      e: IcebergTable.FileEntry, p: Planned): FilterPrune.ColumnStats =
    new FilterPrune.ColumnStats {
      private def fid(column: String): Option[Int] = p.fieldIdOf.get(column)
      private def dt(column: String): Option[DataType] =
        p.schema.fields.find(_.name == column).map(_.dataType)
      override def exact(column: String): Option[Option[Any]] =
        p.idCols.find(_._1 == column).flatMap { case (_, pfName) =>
          e.pv.get(pfName).map(_.map { raw =>
            dt(column) match {
              case Some(DateType) => java.time.LocalDate.parse(raw)
              case Some(StringType) => raw
              case Some(BooleanType) => raw.toBoolean
              case Some(TimestampType) => raw
              case _ => scala.util.Try(BigDecimal(raw)).getOrElse(raw): Any
            }
          })
        }
      override def min(column: String): Option[Any] =
        for {
          id <- fid(column); t <- dt(column)
          b <- e.lower.get(id); v <- IcebergBounds.decode(t, b)
        } yield v
      override def max(column: String): Option[Any] =
        for {
          id <- fid(column); t <- dt(column)
          b <- e.upper.get(id); v <- IcebergBounds.decode(t, b)
        } yield v
      override def allNull(column: String): Option[Boolean] =
        fid(column).flatMap(id => e.nullCounts.get(id))
          .map(nc => e.records > 0L && nc == e.records)
      override def mayHaveNull(column: String): Boolean =
        fid(column).flatMap(id => e.nullCounts.get(id)).forall(_ > 0L)
    }
}

// case class for the same reason as the Scan below: BatchScanExec's
// equality covers its `table` field too
private[dsv2] case class IcebergDsv2Table(
    table: String, tableSchema: StructType, options: Map[String, String])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = s"graft-iceberg `$table`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    IcebergWriteBuilder(table, info)

  override def newScanBuilder(
      caseInsensitiveOptions: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : ScanBuilder =
    new IcebergScanBuilder(table, tableSchema,
      options ++ caseInsensitiveOptions.asScala.toMap
        .map { case (k, v) => (k.toLowerCase, v) })
}

private[dsv2] class IcebergScanBuilder(
    table: String, tableSchema: StructType, options: Map[String, String])
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tableSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required =
      if (requiredSchema.fields.nonEmpty) requiredSchema
      else StructType(Array(tableSchema.fields.minBy(_.name.length)))

  override def build(): Scan =
    IcebergDsv2Scan(table, tableSchema, required, pushed.toSeq, options)
}

// a CASE class: AQE broadcast reuse (which dynamic partition pruning
// depends on) compares BatchScanExec nodes by scan VALUE equality —
// a reference-equal scan silently degrades every DPP filter to `true`
private[dsv2] case class IcebergDsv2Scan(
    table: String, tableSchema: StructType, required: StructType,
    pushed: Seq[Filter], options: Map[String, String])
    extends Scan
    with SupportsReportStatistics
    with SupportsRuntimeFiltering
    with GraftFileBatch.LazyBatchSource {

  import GraftFileBatch._

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-iceberg $table, PushedFilters: [${pushed.mkString(", ")}]"

  @volatile private var runtimeFilters: Array[Filter] = Array.empty

  // only the scan's OUTPUT columns: Spark resolves these against the
  // pruned readSchema, and an unreadable reference fails analysis
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fieldNames.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit =
    runtimeFilters = filters

  private lazy val p = IcebergDsv2.plan(SparkSession.active, table, options)

  private def keptFiles(): Seq[IcebergTable.FileEntry] = {
    val all = pushed ++ runtimeFilters
    val kept = p.entries.sortBy(_.path).filter { e =>
      val view = IcebergDsv2.statsView(e, p)
      all.forall(f => FilterPrune.admits(view, f))
    }
    Dsv2Planning.record(table, kept.size, p.entries.size)
    kept
  }

  /** Post-pushdown statistics from the manifests: bytes of the
    * surviving files, rows from their `record_count` — what lets
    * Spark auto-broadcast a selectively-pruned probe at scale.
    */
  override def estimateStatistics(): Statistics = {
    val kept = keptFiles()
    val size = kept.map(e => Files.size(Paths.get(e.path))).sum
    val rows = kept.map(_.records)
    new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.of(size)
      override def numRows() =
        if (rows.forall(_ >= 0L)) java.util.OptionalLong.of(rows.sum)
        else java.util.OptionalLong.empty()
    }
  }

  override def toBatch: Batch = ValueEqualBatch(this)

  private lazy val idColNames = p.idCols.map(_._1)
  private lazy val partitionSchema = StructType(
    p.schema.fields.filter(f => idColNames.contains(f.name)))

  private lazy val icebergFactory: Factory = {
    val spark = SparkSession.active
    val dataSchema = StructType(
      p.schema.fields.filterNot(f => idColNames.contains(f.name)))
    val eqDeletes: Array[EqDelete] =
      p.eqDeletes.map(d => EqDelete(d._1, d._2)).toArray
    val eqCols = p.eqDeletes.flatMap(_._1).distinct
    // reader shape independent of runtime re-filters: row-index rides
    // whenever ANY entry has deleted positions
    val anyDrop = p.entries.exists(e =>
      p.dropByFile.contains(IcebergDsv2.canon(e.path)))
    val requiredData = StructType(required.fields.filterNot(f =>
      idColNames.contains(f.name)))
    val extraEq = eqCols
      .filterNot(c => requiredData.fieldNames.contains(c))
      .filterNot(idColNames.contains)
      .flatMap(c => dataSchema.fields.find(_.name == c))
    val readData = StructType(
      requiredData.fields ++ extraEq ++
        (if (anyDrop)
          Seq(StructField(ParquetReadBridge.RowIndexColumn, LongType))
        else Nil))
    val emitted = StructType(readData.fields ++ partitionSchema.fields)
    val dataFilters = pushed.filter(
      _.references.forall(c => dataSchema.fieldNames.contains(c)))
    val readFunc = ParquetReadBridge.reader(
      spark, dataSchema, partitionSchema, readData, dataFilters)
    new Factory(readFunc, emitted, required,
      if (anyDrop)
        readData.fieldNames.indexOf(ParquetReadBridge.RowIndexColumn)
      else -1,
      eqDeletes)
  }

  private[dsv2] override def batchFactory(): PartitionReaderFactory =
    icebergFactory

  /** One slice per file entry — shared by batch planning and the
    * streaming source's tail batches (a tail entry is never in
    * `dropByFile` and its sequence number exceeds every existing
    * equality delete's, so both sets resolve empty there).
    */
  private[dsv2] def sliceFor(
      e: IcebergTable.FileEntry): GraftInputPartition = {
    val pv = new GenericInternalRow(
      partitionSchema.fields.map { f =>
        val pfName = p.idCols.find(_._1 == f.name).map(_._2)
          .getOrElse(f.name)
        val raw = e.pv.get(pfName).flatten.orNull
        DeltaDsv2.internalPartValue(raw, f.dataType)
      }.toArray[Any])
    val drop = p.dropByFile
      .getOrElse(IcebergDsv2.canon(e.path), Array.empty[Long])
    // equality deletes apply when the data file's sequence
    // number is STRICTLY below the delete's (spec scoping rule)
    val eqIdx = p.eqDeletes.zipWithIndex
      .filter { case (d, _) => e.seq < d._3 }
      .map(_._2).toArray
    GraftInputPartition(
      ParquetReadBridge.wholeFile(pv, e.path,
        Files.size(Paths.get(e.path)), 0L),
      drop, null, eqIdx, Map.empty)
  }

  private[dsv2] override def batchPartitions(): Array[InputPartition] =
    keptFiles().map(sliceFor).toArray[InputPartition]

  override def toMicroBatchStream(
      checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new IcebergMicroBatchStream(table, tableSchema, required, options)
}

/** Offset = (count of snapshot-log entries consumed, whether the
  * initial snapshot has been served, that snapshot's id). The
  * snapshot-log is append-only (rollbacks APPEND a re-current entry),
  * so the index is a monotone stream position from format-version 1
  * up — sequence numbers, the v2 alternative, don't exist on v1
  * tables.
  */
private[dsv2] case class IcebergStreamOffset(
    logIdx: Long, snapshotDone: Boolean, snapshotId: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    s"""{"logIdx":$logIdx,"snapshotDone":$snapshotDone,""" +
      s""""snapshotId":$snapshotId}"""
}

private[dsv2] object IcebergStreamOffset {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  def fromJson(s: String): IcebergStreamOffset = {
    val n = mapper.readTree(s)
    IcebergStreamOffset(
      n.get("logIdx").asLong(),
      n.get("snapshotDone").asBoolean(),
      n.get("snapshotId").asLong())
  }
}

/** The Iceberg STREAMING SOURCE — the [[DeltaMicroBatchStream]] twin
  * (iceberg-spark's own incremental append scan has the same shape):
  * initial snapshot (the full MoR-resolved file set at stream start)
  * as the first micro-batch, then each later snapshot's APPENDED
  * files — the status-1 entries of the data manifests whose
  * `added_snapshot_id` is that snapshot, the spec's append marker —
  * as one batch each. Non-append snapshots (delete/overwrite/replace)
  * fail the stream unless `skipChangeCommits` drops them; a
  * NON-LINEAR history step (a rollback re-currenting an old snapshot)
  * fails loudly — replaying it would duplicate rows. Exactly-once by
  * snapshot-log-index offsets in the streaming checkpoint.
  */
private[dsv2] class IcebergMicroBatchStream(
    table: String, tableSchema: StructType, required: StructType,
    options: Map[String, String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {

  import org.apache.spark.sql.connector.read.streaming.Offset

  private val skipChangeCommits =
    IcebergDsv2.opt(options, "skipChangeCommits").exists(_.toBoolean)

  // the snapshot-pinned inner scan: its factory reads every era this
  // stream serves (single-era gate), its plan carries the initial
  // snapshot's delete state, and tail entries slice through the same
  // sliceFor with empty delete sets
  private lazy val snapScan: IcebergDsv2Scan = {
    val meta = IcebergTable.metadataJson(table)
    val cur = IcebergTable.currentSnapshotNode(meta)
      .get("snapshot-id").asLong()
    IcebergDsv2Scan(table, tableSchema, required, Nil,
      options + ("snapshotid" -> cur.toString))
  }

  override def initialOffset(): Offset = {
    val meta = IcebergTable.metadataJson(table)
    val cur = IcebergTable.currentSnapshotNode(meta)
    IcebergStreamOffset(
      IcebergTable.snapshotLog(table).size.toLong,
      snapshotDone = false,
      cur.get("snapshot-id").asLong())
  }

  override def latestOffset(): Offset =
    IcebergStreamOffset(
      IcebergTable.snapshotLog(table).size.toLong,
      snapshotDone = true, -1L)

  override def deserializeOffset(json: String): Offset =
    IcebergStreamOffset.fromJson(json)

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[IcebergStreamOffset]
    val e = end.asInstanceOf[IcebergStreamOffset]
    val snapshot: Array[InputPartition] =
      if (s.snapshotDone) Array.empty else snapScan.batchPartitions()
    val meta = IcebergTable.metadataJson(table)
    val log = IcebergTable.snapshotLog(table)
    val snapsById: Map[Long, com.fasterxml.jackson.databind.JsonNode] =
      Option(meta.get("snapshots")).toSeq
        .flatMap(_.elements().asScala)
        .map(sn => sn.get("snapshot-id").asLong() -> sn).toMap
    val tail = (s.logIdx.toInt until math.min(e.logIdx.toInt, log.size))
      .flatMap { i =>
        val (_, snapId) = log(i)
        // linear-history gate: this entry must extend the previous one
        // — a rollback re-currents an ALREADY-SERVED snapshot and
        // replaying it would duplicate rows
        val sn = snapsById.getOrElse(snapId,
          throw new IllegalStateException(
            s"snapshot $snapId from the log is expired: the stream " +
              "cannot reconstruct its batch"))
        if (i > 0) {
          val prevId = log(i - 1)._2
          val parent = Option(sn.get("parent-snapshot-id"))
            .filterNot(_.isNull).map(_.asLong())
          require(parent.contains(prevId),
            s"non-linear history at snapshot $snapId of $table (a " +
              "rollback?): replaying it would duplicate rows — start a " +
              "fresh stream from the current snapshot instead")
        }
        val op = Option(sn.get("summary"))
          .flatMap(su => Option(su.get("operation")))
          .map(_.asText()).getOrElse("unknown")
        if (op != "append") {
          if (skipChangeCommits) Nil
          else throw new IllegalStateException(
            s"snapshot $snapId of $table is '$op', not an append: a " +
              "streaming read cannot retract rows — set " +
              "skipChangeCommits=true to drop such commits")
        } else {
          IcebergTable.addedDataFiles(table, meta, sn)
            .sortBy(_.path)
            .map(snapScan.sliceFor)
        }
      }
    snapshot ++ tail.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    snapScan.batchFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
