package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftext.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two double arrays.
  *
  * Why a custom Expression (SURVEY.md §4 preference order b): the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation allocates an
  * intermediate array per row and interprets two lambdas per element —
  * measured 14.5 s for the 2M-pair near-dup scan at sf0.1. This
  * expression participates in whole-stage codegen: one fused loop, no
  * allocation.
  *
  * Summation is strictly left-to-right, matching both the higher-order
  * fold it replaces and DuckDB's `list_dot_product` — results are
  * bit-identical, so oracle parity is preserved.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }

  /** Null semantics match the `aggregate(zip_with(a,b,_*_),0.0,_+_)`
    * fold this expression replaces: a length mismatch or a null element
    * yields NULL (zip_with pads the short side with nulls and the fold
    * absorbs them) — also DuckDB-safe, since its list_dot_product would
    * error on mismatched lengths rather than silently truncate.
    */
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Integer twin of [[DotProduct]] for quantized-code arrays
  * (array<long> — SQ8 codes, nano-quantized coordinates): the same
  * fused loop in exact long math, replacing the interpreted
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` fold with identical
  * semantics (left-to-right, NULL on length mismatch or null element).
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_long"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** `vecDotLong(a, b)` — exact integer dot of two long arrays. */
  def vecDotLong(a: Column, b: Column): Column =
    Bridge.column(DotProductLong(Bridge.expression(a), Bridge.expression(b)))

  /** Column-API surface: `vecDot(a, b)` — dot product of double arrays. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm via the same fused loop. */
  def vecNorm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vecDot(a, a))
  }

  /** Register `vec_dot` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(
      spark, "vec_dot", exprs => DotProduct(exprs(0), exprs(1)))
}
