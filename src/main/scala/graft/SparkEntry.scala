package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Registry of every implemented operator (SURVEY §2) with its DuckDB
  * oracle. Modules contribute (queries, oracleSql) pairs; keys must match
  * and every aliased column name must agree between Spark and SQL.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q4_mention_counts")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Dashboard.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.EventWindows.queries ++
      graft.queries.Multimodal.queries ++
      graft.queries.Extended.queries ++
      graft.queries.TrainingSet.queries ++
      graft.queries.WarehouseQueries.queries ++
      graft.queries.LakehouseScan.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Dashboard.oracleSql ++
      graft.queries.TextOps.oracleSql ++
      graft.queries.Dedup.oracleSql ++
      graft.queries.Similarity.oracleSql ++
      graft.queries.EventWindows.oracleSql ++
      graft.queries.Multimodal.oracleSql ++
      graft.queries.Extended.oracleSql ++
      graft.queries.TrainingSet.oracleSql ++
      graft.queries.WarehouseQueries.oracleSql ++
      graft.queries.LakehouseScan.oracleSql
}
