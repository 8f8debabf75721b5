package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql package: Spark 4.x removed the public
  * `new Column(expr)` constructor; the supported conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. This object re-exports just the two conversions the
  * graft library needs for its native Catalyst expressions.
  */
object GraftSql {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — `Dataset.ofRows` is
    * `private[sql]`; custom operators (graft.plans) need it to hand
    * their plan nodes back to the public API. */
  def dataFrameOf(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
