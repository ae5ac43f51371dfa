package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Expression<->Column bridge (`classic.ExpressionUtils`) is
  * `private[sql]`; this forwarder, living under `org.apache.spark.sql`,
  * re-exports it for graft's custom Catalyst expressions. Public-API-only
  * alternative would be registering every expression in the function
  * registry and going through `expr(...)` strings — this is cleaner.
  */
object GraftColumnBridge {
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
}
