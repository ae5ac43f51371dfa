package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** SplitMix64 finalizer ([[graft.operators.Sketches.mix64]]) as a native
  * codegen'd column — the avalanche step of every replayable hashing
  * scheme in the sketch family (KMV/HLL seeds, the replayable MinHash
  * banding). A composed column form (`xor`/`shiftright`/`*`) would hit
  * ANSI overflow interception on the wrap-around multiplies; the JVM
  * static call is mod-2^64 by definition, and the DuckDB oracles replay
  * it with the q90/q91 `mulMod64` split-multiply building block.
  */
case class Mix64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "mix64"

  override def nullSafeEval(input: Any): Any =
    graft.operators.Sketches.mix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.Sketches.mix64($c)")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

object Mix64 {
  def mix64(c: Column): Column = toCol(Mix64(toExpr(c)))
}
