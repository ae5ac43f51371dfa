package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(key)` as a native Catalyst expression — the
  * membership probe for a driver-built Bloom filter over a 64-bit key
  * column (see [[graft.dedup.Ingest]]).
  *
  * The filter rides to executors once as a plan reference object (the
  * same mechanism broadcast-hash-join uses for its relation), NOT as a
  * per-row-evaluated argument, and the generated code is one virtual call
  * per row inside whole-stage codegen — no UDF, no serialization in the
  * hot loop. A `false` is definitive (Bloom filters have no false
  * negatives); a `true` means "maybe present" and needs exact
  * verification if exactness is required.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def bloom_might_contain(key: Column, bloom: BloomFilter): Column =
    toCol(BloomMightContain(toExpr(key), bloom))
}
