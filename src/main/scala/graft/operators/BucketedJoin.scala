package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (100 TB posture): writing both sides
  * bucketed (and sorted) on the join key lets repeated joins on that key
  * run with ZERO shuffle — each task reads matching bucket files from
  * both tables. The write pays one shuffle once; every subsequent join
  * is exchange-free. This is the warehouse layout a fact/dimension
  * pipeline at scale wants for its hottest key (episode_id / doc_id).
  */
object BucketedJoin {

  /** Persist a DataFrame as a bucketed+sorted table on `key`. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two tables previously written with `writeBucketed` on the same
    * key and bucket count — plans without a shuffle exchange on either
    * side (sort-merge over co-located buckets).
    */
  def coLocatedJoin(
      spark: SparkSession,
      tableA: String,
      tableB: String,
      key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), key)
}
