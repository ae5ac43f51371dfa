package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Expression<->Column bridge (`classic.ExpressionUtils`) and
  * plan<->DataFrame bridge (`classic.Dataset.ofRows`) are `private[sql]`;
  * this forwarder, living under `org.apache.spark.sql`, re-exports them
  * for graft's custom Catalyst expressions and planner rules. The
  * public-API-only alternative would be registering every expression in
  * the function registry and going through `expr(...)` strings — this is
  * cleaner.
  */
object GraftColumnBridge {
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (for building rewritten subplans
    * with the DataFrame API inside a `Rule[LogicalPlan]`).
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
