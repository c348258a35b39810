package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Sort the NARROW input, project after — the fix for heavy per-row
  * projections above a global orderBy (guide §2.4/§2.5).
  *
  * A global `orderBy` plans as rangepartitioning, and the range
  * partitioner SAMPLES ITS CHILD to pick bounds: with the projection
  * below the sort, the whole per-row computation (regex battery,
  * chunk generators) runs once in the sampling pass and AGAIN in the
  * real pass — and over a 1-split parquet input both passes run on a
  * single task (measured on t14: two ~300 ms one-task stages for one
  * 6-regex projection). Range-partitioning the narrow (key, payload)
  * frame first and projecting after keeps ONE evaluation, map-parallel
  * across the range partitions.
  *
  * The explicit partition count (defaultParallelism — scale-adaptive,
  * REPARTITION_BY_NUM so AQE cannot coalesce a tiny scale factor back
  * to one task) plus `sortWithinPartitions` yields the same global
  * emitted order as `orderBy`: range partitions are emitted in key
  * order, rows within each are sorted, and narrow order-preserving
  * ops above (projections, per-row generators emitting in sequence
  * order) keep it.
  */
object SortFirst {
  def apply(df: DataFrame, keys: Column*)(
      project: DataFrame => DataFrame): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    project(
      df.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*))
  }
}
