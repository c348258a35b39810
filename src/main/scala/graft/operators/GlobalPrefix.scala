package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global running aggregates WITHOUT an unpartitioned window: the
  * single-task `Window.orderBy(...)` sort is the classic 100×-scale
  * bottleneck (every row through one task). This operator computes, for
  * a totally-ordered frame, each row's 1-based global index `gidx` and
  * running sum `prefix` of a value column, with every stage
  * partition-parallel:
  *
  *  1. bucket rows by range of the leading order column — boundaries
  *     are P-1 approximate quantiles COLLECTED ONCE and baked into the
  *     plan as literals (a placement-derived id like
  *     `spark_partition_id` after `repartitionByRange` is re-evaluated
  *     per plan branch and diverges under AQE — observed row loss);
  *  2. per-bucket row_number + prefix sums (pid-partitioned windows);
  *  3. cumulative (count, sum) offsets across buckets via a triangular
  *     broadcast join over the P bucket totals (P rows, not data rows).
  *
  * Rows with equal leading-key values always land in one bucket, so the
  * bucket order composes with the within-bucket sort to the total
  * order. Bucket balance affects parallelism only, never results.
  *
  * The result feeds multiple plan branches (the totals branch here; a
  * self-join in callers like q6) — all within ONE query execution, so
  * Spark's ReuseExchange/ReuseSubquery dedups the repeated subtrees at
  * runtime; correctness never depends on that reuse because every
  * derived id is a pure function of row data (see above).
  */
object GlobalPrefix {

  /** @param df        input frame
    * @param rangeKey  leading order column — numeric/timestamp (quantile-
    *                  bucketable); ascending
    * @param tieBreaks remaining order columns completing a TOTAL order
    * @param value     column to running-sum (use a long for exactness)
    * @return df + `gidx` (1-based global position) + `prefix` (running
    *         sum of `value` through this row)
    */
  def withPrefix(
      df: DataFrame,
      rangeKey: Column,
      tieBreaks: Seq[Column],
      value: Column,
      buckets: Int = 32,
      checkpointInput: Boolean = true): DataFrame = {
    // Lazy local checkpoint (r17 opt): the two-phase prefix scan reads
    // its input TWICE by construction (the quantile-bounds pass and the
    // bucketed window pass), and callers' upstream pipelines (corpus
    // joins, aggregations) were recomputed for each. Materializing the
    // input once is the canonical two-pass trade (recompute → storage);
    // lazy, so the bounds pass below is what populates it. Values are
    // unchanged — checkpointing only truncates lineage.
    val base0 = {
      val b = df.withColumn("__v", value).withColumn("__k", rangeKey)
      // already-persisted inputs (session caches) re-read cheaply; a
      // second materialized copy per invocation only churns storage
      // (measured: t18's cached-words input swung 1.0 → 2.5-3.8 s
      // under repeated invocations with an unconditional checkpoint)
      if (checkpointInput) b.localCheckpoint(eager = false) else b
    }
    val fracs = (1 until buckets).map(_.toDouble / buckets)
    // null bounds on empty input (percentile of zero rows) → no
    // boundaries → everything in bucket 0, empty result flows through
    val bounds = Option(
      base0
        .agg(percentile_approx(col("__k"), typedLit(fracs), lit(10000)))
        .head().getSeq[Any](0))
      .getOrElse(Seq.empty)
    val pidExpr = bounds
      .map(b => when(col("__k") > lit(b), 1).otherwise(0))
      .reduceOption[Column](_ + _).getOrElse(lit(0))
    val base = base0.withColumn("__pid", pidExpr)
    val order = col("__k") +: tieBreaks
    val wLocal = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val local = base
      .withColumn("__lrn", row_number().over(wLocal))
      .withColumn("__lsum", sum(col("__v")).over(
        wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    val offsets = totals.select(col("__pid"))
      .join(
        broadcast(totals.select(
          col("__pid").as("__p2"), col("__n"), col("__s"))),
        col("__p2") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(
        coalesce(sum(col("__n")), lit(0L)).as("__row_off"),
        coalesce(sum(col("__s")), lit(0L)).as("__sum_off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn("gidx", col("__lrn") + col("__row_off"))
      .withColumn("prefix", col("__lsum") + col("__sum_off"))
      .drop("__v", "__k", "__pid", "__lrn", "__lsum", "__row_off", "__sum_off")
  }
}
