package graft.sources.dsv2

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.{AlwaysTrue, Filter, InsertableRelation}

import graft.sources.{DeltaExport, DeltaLog, DeltaUpdate, IcebergExport, IcebergTable}

/** DataSourceV2 WRITE path — `df.write.format("graft-delta")
  * .mode("append"|"overwrite").save(path)` and the Iceberg twin —
  * through Spark's V1Write fallback: the builder hands Spark an
  * `InsertableRelation` whose insert delegates to the EXISTING
  * transactional writers, so the DSv2 surface gets the same
  * claim-loop concurrency, row-tracking/ICT stamping, stats and
  * partition staging the bespoke API has — one write implementation,
  * two entry points. Spark validates and reorders the incoming frame
  * against the table's reported schema BEFORE insert (AppendData
  * resolution), so the writers see table-shaped rows.
  *
  * OVERWRITE modes (r17):
  *  - full truncate (`mode("overwrite")`, `SupportsTruncate`) —
  *    [[DeltaExport.overwrite]] / [[IcebergExport.replaceTable]]
  *    (Iceberg keeps its partition spec EXPLICITLY via
  *    `currentSpecOf`, so a partitioned table's relayout is the
  *    spec'd one, never silently de-partitioned);
  *  - overwrite-by-filter (`SupportsOverwrite`: SQL `INSERT INTO ...
  *    REPLACE WHERE`, `df.writeTo(...).overwrite(cond)`) — Delta's
  *    [[DeltaUpdate.replaceWhere]]: one commit, fully-matching files
  *    dropped whole, partially-matching ones DV'd, untouched files
  *    byte-identical. Iceberg filter-overwrite is refused toward the
  *    format-native forms (equality/position deletes + append);
  *  - dynamic partition overwrite: Spark's
  *    `OverwritePartitionsDynamicExec` has NO V1 fallback (it demands
  *    a native BatchWrite), so `overwritePartitions()` is not offered
  *    here — the conflict-checked
  *    replace-exactly-the-arriving-partitions writer is
  *    [[DeltaExport.overwriteWhere]], and `REPLACE WHERE` on the
  *    partition predicate expresses the same replacement through SQL.
  *
  * Path-based TableProvider writes reach only EXISTING tables (Spark
  * must infer the schema first): table creation stays with
  * `DeltaExport.create` / `IcebergExport.create*` / the catalog's
  * CREATE TABLE.
  */
private[dsv2] case class DeltaWriteBuilder(
    table: String, info: LogicalWriteInfo) extends WriteBuilder
    with SupportsOverwrite {

  private var mode: String = "append"
  private var overwriteFilters: Array[Filter] = Array.empty

  override def truncate(): WriteBuilder = { mode = "truncate"; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    if (filters.isEmpty || filters.forall(_.isInstanceOf[AlwaysTrue]))
      mode = "truncate"
    else {
      mode = "replaceWhere"
      overwriteFilters = filters
    }
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          val st = DeltaLog.stateAt(data.sparkSession, table, None)
          mode match {
            case "truncate" =>
              DeltaExport.overwrite(data, table, st.partitionCols)
            case "replaceWhere" =>
              val cond: Column = overwriteFilters
                .flatMap(GraftDml.filterToColumn)
                .reduceOption(_ && _)
                .getOrElse(throw new UnsupportedOperationException(
                  s"overwrite condition not expressible as columns: " +
                    overwriteFilters.mkString(", ")))
              DeltaUpdate.replaceWhere(data, table, cond)
            case _ if overwrite =>
              DeltaExport.overwrite(data, table, st.partitionCols)
            case _ =>
              DeltaExport.append(data, table, st.partitionCols)
          }
        }
      }
  }
}

private[dsv2] case class IcebergWriteBuilder(
    table: String, info: LogicalWriteInfo) extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  private var truncateAll = false

  override def truncate(): WriteBuilder = { truncateAll = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          if (truncateAll || overwrite) {
            // truncate-overwrite preserves the table's CURRENT spec
            // EXPLICITLY (r17) — a partitioned table relayouts under
            // its own transforms, never silently de-partitioned
            IcebergExport.replaceTable(
              data, table, IcebergExport.currentSpecOf(table))
          } else
            IcebergExport.append(data, table)
        }
      }
  }
}
