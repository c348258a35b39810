package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftext.Bridge
import org.apache.spark.sql.types.LongType

/** Native AS-OF join — the SURVEY §4 tier-(c) custom operator (logical
  * node → planner strategy → physical `SparkPlan`), completing the
  * taxonomy next to the tier-(b) expressions (DotProduct, SrpSignature,
  * NormalizeText) and the optimizer `Rule` (ApproxDistinctRewrite).
  *
  * Semantics: for each left row (key, t), attach the right row with
  * the same key and the greatest time ≤ t, ties on time resolved to
  * the greatest tiebreak id; left rows with no such right row are
  * dropped (inner as-of) — exactly the w4 contract
  * (`EventWindows.asofJoin`), which doubles as this operator's
  * executable specification and DuckDB oracle.
  *
  * Why a physical operator when w4's union+window formulation already
  * scales: the window trick materializes the UNION of both streams
  * through one shuffle and sorts carrier columns it immediately drops;
  * the native exec is the kdb/DuckDB merge-scan itself — each side
  * shuffles only its own rows, Spark's `EnsureRequirements` inserts
  * the hash exchanges and per-partition sorts from the declared
  * `requiredChildDistribution`/`requiredChildOrdering` (none are
  * hand-scheduled), and the merge is a single forward pass holding ONE
  * buffered right row — no carrier nulls, no window state. It also
  * demonstrates the machinery a from-scratch operator needs: the
  * planner hook (`extraStrategies`), co-partitioned zipped execution,
  * and unsafe-row projection at the emit boundary.
  *
  * Physical input contract (enforced by the API wrapper): left output
  * starts (key: Long, time: Long, …payload); right output starts
  * (key: Long, time: Long, tiebreakId: Long, …payload); all column
  * names distinct across sides. The merge reads ordinals 0/1/2
  * directly — generalizing to arbitrary key types is a projection the
  * caller owns, which keeps the exec free of expression binding.
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  // the merge reads key/time/tiebreak by ORDINAL, so every child
  // column is load-bearing — without this, ColumnPruning sees a node
  // with no expressions and strips "unused" child columns (e.g. the
  // right key when the final select drops it), shifting the ordinals
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one logical shape, one physical translation. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r) => AsofJoinExec(planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** The merge-scan exec. Declares distribution + ordering requirements
  * and lets `EnsureRequirements` place the exchanges/sorts — the
  * custom operator composes with AQE and reuses Spark's own shuffle
  * machinery instead of hand-rolling placement.
  */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan)
    extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(left.output.head)) ::
      ClusteredDistribution(Seq(right.output.head)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(left.output(0), Ascending),
      SortOrder(left.output(1), Ascending)),
    Seq(SortOrder(right.output(0), Ascending),
      SortOrder(right.output(1), Ascending),
      SortOrder(right.output(2), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] =
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
      // the single buffered right row: the latest one at-or-before the
      // current left row's time within the current key
      var lastKey = 0L
      var lastRow: InternalRow = null
      lIter.flatMap { l =>
        val lk = l.getLong(0)
        val lt = l.getLong(1)
        while (rNext != null && (rNext.getLong(0) < lk ||
            (rNext.getLong(0) == lk && rNext.getLong(1) <= lt))) {
          // sorted (key, time, id): the last consumed row of this key
          // is automatically the (time, id)-greatest eligible one;
          // rows of earlier keys can never serve later left rows
          // (left is key-sorted too) and are skipped for good
          if (rNext.getLong(0) == lk) {
            lastRow = rNext.copy()
            lastKey = lk
          }
          rNext = if (rIter.hasNext) rIter.next() else null
        }
        if (lastRow != null && lastKey == lk)
          Iterator.single(proj(joined(l, lastRow)))
        else Iterator.empty
      }
    }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {

  /** Attach the strategy to a session (idempotent) — the
    * `extraStrategies` public hook, mirroring
    * `ApproxDistinctRewrite.registerOn`; `GraftExtensions` injects the
    * same strategy cluster-wide via `spark.sql.extensions`.
    */
  def registerOn(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }

  /** `asof(left, right)`: left columns (key, time, …), right columns
    * (key, time, tiebreakId, …), leading columns LongType, all names
    * distinct. Returns left ⋈asof right with both sides' columns.
    *
    * NULL contract: the exec reads the leading columns with ordinal
    * `getLong`, which would silently decode a NULL as 0L — a NULL key
    * would interleave with real key 0 and produce WRONG matches, not
    * an error. Parquet schemas read as nullable even when the data
    * never is, so instead of rejecting nullable schemas the wrapper
    * FILTERS null keys/times out of both sides here (a row with no
    * key or no time has no as-of position; dim tables with real nulls
    * should clean them upstream). The filter is a no-op scan predicate
    * when the columns are in fact never null.
    */
  def asof(left: DataFrame, right: DataFrame): DataFrame = {
    def needLong(df: DataFrame, n: Int, side: String): Unit =
      (0 until n).foreach { i =>
        require(df.schema(i).dataType == LongType,
          s"asof $side column $i (${df.schema(i).name}) must be LONG, " +
            s"got ${df.schema(i).dataType}")
      }
    needLong(left, 2, "left")
    needLong(right, 3, "right")
    val dup = left.columns.toSet intersect right.columns.toSet
    require(dup.isEmpty, s"asof sides share column names: $dup")
    def dropNullLeading(df: DataFrame, n: Int): DataFrame =
      (0 until n).foldLeft(df)((d, i) =>
        d.filter(org.apache.spark.sql.functions.col(df.columns(i)).isNotNull))
    val l = dropNullLeading(left, 2)
    val r = dropNullLeading(right, 3)
    val spark = left.sparkSession
    registerOn(spark)
    Bridge.ofRows(spark,
      AsofJoinNode(l.queryExecution.analyzed, r.queryExecution.analyzed))
  }
}
