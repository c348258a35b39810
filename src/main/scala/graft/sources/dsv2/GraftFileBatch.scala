package graft.sources.dsv2

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.types.{DataType, StructType}

/** Shared executor-side machinery of the lakehouse DataSourceV2
  * connectors ([[DeltaTableProvider]] / [[IcebergTableProvider]]):
  * one planned slice per data file, read through Spark's OWN parquet
  * reader ([[org.apache.spark.sql.graftext.ParquetReadBridge]] — the
  * vectorized, pushdown-aware function `FileSourceScanExec` itself
  * ships), then the format's ROW-LEVEL semantics applied per row:
  *
  *  - `dropPositions`: in-file row indexes deleted by a Delta
  *    deletion vector / Iceberg position delete or puffin DV —
  *    excluded via binary search against the row-index metadata
  *    column (sorted `Array[Long]`, bounded by deleted rows per file:
  *    the metadata-not-data discipline both formats' readers share);
  *  - `keepPositions`: the INVERSE mode — emit ONLY the listed
  *    positions (the CDF "newly deleted rows as delete records"
  *    extraction);
  *  - equality deletes (Iceberg v2 MoR): per-file applicable delete
  *    sets (scoped by the planner to delete files with sequence
  *    number STRICTLY above the data file's — the spec rule
  *    `readCore` enforces with its anti-join), checked per row
  *    against a hash set of the delete-key tuples (bounded by deleted
  *    keys — exactly what iceberg-spark's own readers load per task);
  *  - `constants`: per-slice output columns that do not live in the
  *    file (`_change_type` for computed CDF rows, `_commit_version`),
  *    compiled into the output projection as literals.
  *
  * Scale shape: planning is driver-side metadata work bounded by
  * files + deleted rows; the data path is one `PartitionReader` per
  * file slice running Spark's codegen'd parquet decode, so a
  * 1000-executor cluster fans these out exactly like a native scan.
  */
private[dsv2] object GraftFileBatch {

  /** One equality-delete file's content: key column names (resolved
    * against the table schema) and the deleted key tuples in EXTERNAL
    * form (String/Long/...; converted to Catalyst internal values at
    * reader init). Applicability to a given data file is decided by
    * the PLANNER (sequence-number scope) via
    * [[GraftInputPartition.eqIdx]].
    */
  case class EqDelete(cols: Seq[String], values: Seq[Seq[Any]])
      extends Serializable

  /** A planned file slice. `keepPositions == null` means "all rows
    * except dropPositions"; non-null means "only these positions"
    * (and dropPositions is ignored). Both arrays sorted ascending.
    */
  case class GraftInputPartition(
      pf: PartitionedFile,
      dropPositions: Array[Long],
      keepPositions: Array[Long],
      eqIdx: Array[Int],
      constants: Map[String, Any])
      extends InputPartition

  class Factory(
      readFunc: PartitionedFile => Iterator[InternalRow],
      // what readFunc emits: required data columns (incl. the
      // row-index temp column when position semantics are in play)
      // followed by the partition-schema columns
      emitted: StructType,
      // the scan's declared output (readSchema()): every field either
      // present in `emitted` or supplied by a slice's `constants`
      output: StructType,
      rowIdxPos: Int, // index of the row-index column in emitted; -1 = none
      eqDeletes: Array[EqDelete])
      extends PartitionReaderFactory {

    override def createReader(
        partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[GraftInputPartition]
      new Reader(p)
    }

    private class Reader(p: GraftInputPartition)
        extends PartitionReader[InternalRow] {

      // output projection: the slice's constant when one is declared
      // (constants WIN over a same-named read column — a computed-CDF
      // slice's `_change_type` literal must override the null the
      // parquet reader yields for the column a data file lacks), else
      // the emitted column by position — one codegen'd projection
      private val proj: UnsafeProjection = {
        val exprs: Seq[Expression] = output.fields.toSeq.map { f =>
          p.constants.get(f.name) match {
            case Some(ext) =>
              Literal(
                CatalystTypeConverters
                  .createToCatalystConverter(f.dataType)(ext),
                f.dataType)
            case None =>
              val i = emitted.fieldNames.indexOf(f.name)
              if (i < 0) throw new IllegalStateException(
                s"output column ${f.name} neither read nor constant")
              BoundReference(i, emitted(i).dataType, nullable = true)
          }
        }
        UnsafeProjection.create(exprs)
      }

      // equality-delete sets in INTERNAL value form; single-column
      // sets store the bare value, multi-column sets the value Seq
      private val eqSets: Array[(Array[Int], java.util.HashSet[Any])] =
        p.eqIdx.map { i =>
          val d = eqDeletes(i)
          val pos = d.cols.map { c =>
            val at = emitted.fieldNames.indexOf(c)
            require(at >= 0, s"equality-delete column $c not in read schema")
            at
          }.toArray
          val convs = pos.map(at =>
            CatalystTypeConverters
              .createToCatalystConverter(emitted(at).dataType))
          val set = new java.util.HashSet[Any]()
          d.values.foreach { tuple =>
            val conv = tuple.iterator.zipWithIndex
              .map { case (v, j) => convs(j)(v) }.toSeq
            set.add(if (conv.size == 1) conv.head else conv)
          }
          (pos, set)
        }

      private val dts: Array[DataType] = emitted.fields.map(_.dataType)
      private val iter = readFunc(p.pf)
      private var cur: InternalRow = _

      private def positionAdmits(row: InternalRow): Boolean = {
        if (rowIdxPos < 0) return true
        val idx = row.getLong(rowIdxPos)
        if (p.keepPositions != null)
          java.util.Arrays.binarySearch(p.keepPositions, idx) >= 0
        else
          p.dropPositions.length == 0 ||
            java.util.Arrays.binarySearch(p.dropPositions, idx) < 0
      }

      private def eqAdmits(row: InternalRow): Boolean = {
        var i = 0
        while (i < eqSets.length) {
          val (pos, set) = eqSets(i)
          val key: Any =
            if (pos.length == 1)
              (if (row.isNullAt(pos(0))) null else row.get(pos(0), dts(pos(0))))
            else
              pos.toSeq.map(at =>
                if (row.isNullAt(at)) null else row.get(at, dts(at)))
          if (set.contains(key)) return false
          i += 1
        }
        true
      }

      override def next(): Boolean = {
        while (iter.hasNext) {
          val row = iter.next()
          if (positionAdmits(row) && eqAdmits(row)) {
            cur = row
            return true
          }
        }
        false
      }

      override def get(): InternalRow = proj(cur)

      override def close(): Unit = ()
    }
  }

  class SimpleBatch(
      partitions: Array[InputPartition],
      factory: PartitionReaderFactory)
      extends Batch {
    override def planInputPartitions(): Array[InputPartition] = partitions
    override def createReaderFactory(): PartitionReaderFactory = factory
  }

  /** A Batch that delegates back to its (case-class) scan.
    * VALUE-EQUAL BY THE SCAN: `BatchScanExec.equals` compares
    * `this.batch == other.batch` (not the scan!), and AQE's
    * broadcast-exchange reuse — which dynamic partition pruning
    * depends on (`reuseBroadcastOnly`) — runs through exactly that
    * equality; a reference-equal Batch silently degrades every DPP
    * filter to `true`. Deferring planInputPartitions to call time
    * also lets runtime filters re-plan the file set.
    */
  trait LazyBatchSource {
    private[dsv2] def batchPartitions(): Array[InputPartition]
    private[dsv2] def batchFactory(): PartitionReaderFactory
  }

  case class ValueEqualBatch(owner: LazyBatchSource) extends Batch {
    override def planInputPartitions(): Array[InputPartition] =
      owner.batchPartitions()
    override def createReaderFactory(): PartitionReaderFactory =
      owner.batchFactory()
  }
}
