package graft.sources.dsv2

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, SubqueryExpression, And => AndExpr}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftext.Bridge
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter

import graft.sources.{DeltaExport, DeltaMerge, DeltaUpdate, IcebergExport}

/** SQL DML over the lakehouse tables — `DELETE FROM`, `UPDATE`,
  * `MERGE INTO` against `graft.delta.`/p`` / `graft.iceberg.`/p``
  * (r17), shipped the way delta-spark itself ships them: an ANALYZER
  * resolution rule (registered through
  * `spark.sql.extensions=graft.plans.GraftExtensions`, the same
  * mechanism `DeltaSparkSessionExtension` uses) rewrites the resolved
  * logical commands over this module's DSv2 relations into a runnable
  * command node, delegating to the engine's EXISTING transactional
  * writers — DV-growing DELETE ([[DeltaExport.deleteWhere]]) and
  * UPDATE ([[DeltaUpdate.updateWhere]]), copy-on-write MERGE
  * ([[DeltaMerge.merge]]), Iceberg position-delete DELETE
  * ([[IcebergExport.deleteWhere]]), blind-upsert / equality-delete
  * MERGE ([[IcebergExport.mergeUpsert]] /
  * [[IcebergExport.deleteWhereEquality]]) — one write implementation
  * per semantic, SQL as one more entry point. The rule must live in
  * the analyzer: Spark's CheckAnalysis refuses UPDATE/MERGE on any
  * table without `SupportsRowLevelOperations` before a planner
  * strategy could ever see the plan.
  *
  * DELETE with Filter-algebra predicates additionally works WITHOUT
  * the extension, in any session, through `SupportsDeleteV2` on the
  * tables themselves (Spark's own DeleteFromTableExec path).
  *
  * MERGE scope: the classic upsert shapes — `ON` a conjunction of
  * target/source column equalities, `WHEN MATCHED THEN UPDATE SET *`
  * or `DELETE`, `WHEN NOT MATCHED THEN INSERT *`, no action
  * conditions, no NOT MATCHED BY SOURCE, no schema evolution.
  * Anything else is refused loudly naming the writer API that
  * implements it.
  */
object GraftDml {

  /** Resolved condition → a name-resolvable Column (the writers
    * re-resolve against their own scan frames, so the bound
    * AttributeReferences must revert to plain names).
    */
  def columnOf(e: Expression): Column = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      s"subqueries in DML conditions are not offered through SQL: $e")
    Bridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  /** V1 Filter → Column, None when the node has no Column rendering.
    * Powers `SupportsDeleteV2` (extension-less sessions).
    */
  def filterToColumn(f: Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case sources.StringEndsWith(a, p) => Some(col(a).endsWith(p))
    case sources.StringContains(a, p) => Some(col(a).contains(p))
    case sources.And(l, r) =>
      for (a <- filterToColumn(l); b <- filterToColumn(r)) yield a && b
    case sources.Or(l, r) =>
      for (a <- filterToColumn(l); b <- filterToColumn(r)) yield a || b
    case sources.Not(c) => filterToColumn(c).map(!_)
    case _: sources.AlwaysTrue => Some(lit(true))
    case _: sources.AlwaysFalse => Some(lit(false))
    case _ => None
  }
}

/** The rewritten command: a leaf the planner maps to
  * [[GraftDmlExec]]. The closure runs exactly once per execution.
  */
private[dsv2] case class GraftDmlCommand(
    label: String, run: SparkSession => Unit)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

private[dsv2] case class GraftDmlExec(
    label: String, run: SparkSession => Unit) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  private lazy val done: Unit = run(SparkSession.active)
  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
  override protected def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.emptyRDD[InternalRow]
  }
}

/** Plans [[GraftDmlCommand]]; injected by
  * `graft.plans.GraftExtensions`.
  */
class GraftDmlStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftDmlCommand(label, run) => GraftDmlExec(label, run) :: Nil
    case _ => Nil
  }
}

/** The analyzer rewrite — see [[GraftDml]]'s Scaladoc. */
class GraftDmlRule extends Rule[LogicalPlan] {

  import GraftDml._

  /** The DSv2 table under a (possibly aliased) relation, when it is
    * one of this module's.
    */
  private def graftTable(plan: LogicalPlan): Option[(AnyRef, Seq[Attribute])] =
    plan match {
      case SubqueryAlias(_, child) => graftTable(child)
      case r: DataSourceV2Relation => r.table match {
        case d: DeltaDsv2Table => Some((d, r.output))
        case i: IcebergDsv2Table => Some((i, r.output))
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {

    // ------------------------------------------------------------ DELETE
    // rewritten here (not via SupportsDeleteV2) only when the
    // condition falls OUTSIDE the Filter algebra — Spark's own
    // DeleteFromTableExec path serves the simple cases
    case d @ DeleteFromTable(target, condition) if d.resolved =>
      graftTable(target) match {
        case Some((tbl, _)) if !deletableByFilters(tbl, condition) =>
          val cond = columnOf(condition)
          GraftDmlCommand(s"DELETE FROM graft table", spark =>
            tbl match {
              case t: DeltaDsv2Table =>
                DeltaExport.deleteWhere(spark, t.table, cond)
              case t: IcebergDsv2Table =>
                IcebergExport.deleteWhere(spark, t.table, cond)
            })
        case _ => plan
      }

    // ------------------------------------------------------------ UPDATE
    case u @ UpdateTable(target, assignments, condition) if u.resolved =>
      graftTable(target) match {
        case Some((tbl: DeltaDsv2Table, _)) =>
          val cond = condition.map(columnOf).getOrElse(lit(true))
          val sets: Map[String, Column] = assignments.map {
            case Assignment(key: AttributeReference, value) =>
              key.name -> columnOf(value)
            case other => throw new UnsupportedOperationException(
              s"UPDATE assignment target must be a column, got $other")
          }.toMap
          GraftDmlCommand(s"UPDATE ${tbl.table}", spark => {
            DeltaUpdate.updateWhere(spark, tbl.table, cond, sets)
            ()
          })
        case Some((tbl: IcebergDsv2Table, _)) =>
          throw new UnsupportedOperationException(
            s"UPDATE on graft-iceberg ${tbl.table} is not offered: " +
              "express it as MERGE INTO (IcebergExport.mergeUpsert — " +
              "the format-native blind upsert)")
        case _ => plan
      }

    // ------------------------------------------------------------- MERGE
    case m: MergeIntoTable if m.resolved =>
      graftTable(m.targetTable) match {
        case Some((tbl, targetOut)) => rewriteMerge(m, tbl, targetOut)
        case None => plan
      }

    case _ => plan
  }

  /** Whether Spark's own SupportsDeleteV2 path can serve this delete
    * (the condition converts to V1 filters). Conservative: any
    * non-trivial expression shape routes through this rule.
    */
  private def deletableByFilters(tbl: AnyRef, cond: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Or => COr, Not => CNot, _}
    def simple(e: Expression): Boolean = e match {
      case CAnd(l, r) => simple(l) && simple(r)
      case COr(l, r) => simple(l) && simple(r)
      case CNot(c) => simple(c)
      case BinaryComparison(_: AttributeReference, _: Literal) => true
      case BinaryComparison(_: Literal, _: AttributeReference) => true
      case In(_: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) => true
      case InSet(_: AttributeReference, _) => true
      case IsNull(_: AttributeReference) => true
      case IsNotNull(_: AttributeReference) => true
      case StartsWith(_: AttributeReference, _: Literal) => true
      case EndsWith(_: AttributeReference, _: Literal) => true
      case Contains(_: AttributeReference, _: Literal) => true
      case _: Literal => true
      case _ => false
    }
    simple(cond)
  }

  /** `ON` must be a conjunction of target-column = source-column
    * equalities with MATCHING names — the upsert key.
    */
  private def mergeKeys(
      cond: Expression, targetOut: Seq[Attribute]): Seq[String] = {
    val targetIds = targetOut.map(_.exprId).toSet
    def side(a: AttributeReference): Boolean = targetIds.contains(a.exprId)
    cond match {
      case AndExpr(l, r) =>
        mergeKeys(l, targetOut) ++ mergeKeys(r, targetOut)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if side(a) != side(b) =>
        require(a.name.equalsIgnoreCase(b.name),
          s"MERGE ON must equate same-named columns (got " +
            s"${a.name} = ${b.name}): use DeltaMerge.merge / " +
            "IcebergExport.mergeUpsert for renamed keys")
        Seq(if (side(a)) a.name else b.name)
      case other => throw new UnsupportedOperationException(
        s"MERGE ON must be a conjunction of key equalities, got $other")
    }
  }

  /** UPDATE SET * / INSERT * recognition: every assignment carries a
    * same-named source column (the resolved star form), or the action
    * is still the star node.
    */
  private def isStarAssignments(assignments: Seq[Assignment]): Boolean =
    assignments.forall {
      case Assignment(k: AttributeReference, v: AttributeReference) =>
        k.name.equalsIgnoreCase(v.name)
      case _ => false
    }

  private def rewriteMerge(
      m: MergeIntoTable, tbl: AnyRef,
      targetOut: Seq[Attribute]): LogicalPlan = {
    require(m.notMatchedBySourceActions.isEmpty,
      "MERGE WHEN NOT MATCHED BY SOURCE is not offered through SQL: " +
        "use DeltaMerge.applyChanges")
    if (m.withSchemaEvolution) throw new UnsupportedOperationException(
      "MERGE WITH SCHEMA EVOLUTION is not offered through SQL")
    val keys = mergeKeys(m.mergeCondition, targetOut).distinct
    require(keys.nonEmpty, "MERGE needs at least one key equality")

    val matched: Option[DeltaMerge.MatchedAction] = m.matchedActions match {
      case Nil => None
      case Seq(_: UpdateStarAction) => Some(DeltaMerge.UpdateAll)
      case Seq(UpdateAction(None, assigns, _))
          if isStarAssignments(assigns) =>
        Some(DeltaMerge.UpdateAll)
      case Seq(DeleteAction(None)) => Some(DeltaMerge.DeleteMatched)
      case other => throw new UnsupportedOperationException(
        s"MERGE matched action not offered through SQL: $other — " +
          "supported: UPDATE SET * (unconditional), DELETE " +
          "(unconditional); use DeltaMerge.merge for the rest")
    }
    val insert: Boolean = m.notMatchedActions match {
      case Nil => false
      case Seq(_: InsertStarAction) => true
      case Seq(InsertAction(None, assigns)) if isStarAssignments(assigns) =>
        true
      case other => throw new UnsupportedOperationException(
        s"MERGE not-matched action not offered through SQL: $other — " +
          "supported: INSERT * (unconditional)")
    }
    val sourcePlan = m.sourceTable
    tbl match {
      case d: DeltaDsv2Table =>
        GraftDmlCommand(s"MERGE INTO ${d.table}", spark => {
          DeltaMerge.merge(spark, d.table,
            Bridge.ofRows(spark, sourcePlan), keys, matched, insert)
          ()
        })
      case i: IcebergDsv2Table =>
        (matched, insert) match {
          case (Some(DeltaMerge.UpdateAll), true) =>
            GraftDmlCommand(s"MERGE INTO ${i.table}", spark => {
              IcebergExport.mergeUpsert(spark, i.table,
                Bridge.ofRows(spark, sourcePlan), keys)
              ()
            })
          case (Some(DeltaMerge.DeleteMatched), false) =>
            GraftDmlCommand(s"MERGE INTO ${i.table}", spark => {
              IcebergExport.deleteWhereEquality(spark, i.table,
                Bridge.ofRows(spark, sourcePlan)
                  .select(keys.map(col): _*).distinct())
              ()
            })
          case other => throw new UnsupportedOperationException(
            s"MERGE shape $other on graft-iceberg is not offered " +
              "through SQL: the format-native forms are blind upsert " +
              "(UPDATE SET * + INSERT *) and equality delete (DELETE)")
        }
      case other => throw new UnsupportedOperationException(
        s"not a graft lakehouse table: $other")
    }
  }
}
