package graft.sources.dsv2

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType

import graft.sources.{DeltaLog, DeltaExport, IcebergExport, IcebergTable}

/** DataSourceV2 WRITE path — `df.write.format("graft-delta")
  * .mode("append"|"overwrite").save(path)` and the Iceberg twin —
  * through Spark's V1Write fallback: the builder hands Spark an
  * `InsertableRelation` whose insert delegates to the EXISTING
  * transactional writers (`DeltaExport.append`/`overwrite`,
  * `IcebergExport.append`/`replaceTable`), so the DSv2 surface gets
  * the same claim-loop concurrency, row-tracking/ICT stamping, stats
  * and partition staging the bespoke API has — one write
  * implementation, two entry points. Spark validates and reorders the
  * incoming frame against the table's reported schema BEFORE insert
  * (AppendData resolution), so the writers see table-shaped rows.
  *
  * Path-based TableProvider writes reach only EXISTING tables (Spark
  * must infer the schema first): table creation stays with
  * `DeltaExport.create` / `IcebergExport.create*`. Dynamic-partition
  * overwrite (overwrite-by-filter) is not offered — only full
  * truncate-overwrite; Spark fails loudly otherwise.
  */
private[dsv2] case class DeltaWriteBuilder(
    table: String, info: LogicalWriteInfo) extends WriteBuilder
    with SupportsTruncate {

  private var truncateAll = false

  override def truncate(): WriteBuilder = { truncateAll = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          val st = DeltaLog.stateAt(data.sparkSession, table, None)
          if (truncateAll || overwrite)
            DeltaExport.overwrite(data, table, st.partitionCols)
          else
            DeltaExport.append(data, table, st.partitionCols)
        }
      }
  }
}

private[dsv2] case class IcebergWriteBuilder(
    table: String, info: LogicalWriteInfo) extends WriteBuilder
    with SupportsTruncate {

  private var truncateAll = false

  override def truncate(): WriteBuilder = { truncateAll = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          if (truncateAll || overwrite) {
            // a truncate-overwrite must keep the table's spec; this
            // module only carries it for unpartitioned tables —
            // partitioned overwrite goes through replaceTable with an
            // explicit spec (loud, not silently de-partitioned)
            val meta = IcebergTable.metadataJson(table)
            val hasSpec =
              IcebergTable.identityPartitionSources(meta).nonEmpty ||
                Option(meta.get("partition-specs")).exists(_.elements()
                  .asScala.exists(sp => sp.get("fields").size() > 0))
            require(!hasSpec,
              s"overwrite through graft-iceberg keeps only an " +
                "UNPARTITIONED spec: use IcebergExport.replaceTable " +
                "with the explicit partition spec instead")
            IcebergExport.replaceTable(data, table)
          } else
            IcebergExport.append(data, table)
        }
      }
  }
}
