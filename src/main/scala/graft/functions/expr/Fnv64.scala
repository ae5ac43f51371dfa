package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Scalar FNV-1a 64-bit hash of a string as a native codegen'd expression.
  *
  * This is the SAME byte fold as [[SimHash64.fnv1a64]] (public-domain FNV
  * spec), exposed as a standalone column so the distinct-count sketches
  * (KMV / HLL, `operators/Sketches.scala`) hash with a function an
  * external SQL engine can recompute byte-for-byte — the DuckDB oracles
  * replay it with the same `fnvSql` building block q25's simhash oracle
  * uses. `xxhash64` would be marginally faster but is not practically
  * replayable in SQL; for sketch inputs (short ids / tokens) the
  * difference is noise.
  */
case class Fnv64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.fnv1a64(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.SimHash64.fnv1a64($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

object Fnv64 {
  def fnv64(c: Column): Column = toCol(Fnv64(toExpr(c)))
}
