package org.apache.spark.sql.graftext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for `private[sql]` Spark internals the extension layer
  * needs: Expression ⇄ Column wrapping (the public constructor was
  * removed in Spark 4's Column-node refactor) and function registration.
  * This subpackage placement is the standard technique for third-party
  * Catalyst extensions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` went
    * `private[sql]`-ish behind the classic split in Spark 4) — the
    * entry point a custom LogicalPlan node needs to join the public
    * DataFrame API.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
