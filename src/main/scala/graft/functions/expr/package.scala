package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.GraftColumnBridge

/** Spark 4 moved `Column` to a connect-agnostic node tree; the classic
  * Expression<->Column bridge is re-exported via GraftColumnBridge.
  */
package object expr {
  def toCol(e: Expression): Column = GraftColumnBridge.toCol(e)
  def toExpr(c: Column): Expression = GraftColumnBridge.toExpr(c)
}
