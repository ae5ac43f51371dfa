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

  def bloom_might_contain(key: Column,
      bloom: org.apache.spark.broadcast.Broadcast[BloomFilter]): Column =
    toCol(BloomMightContainBc(toExpr(key), bloom))
}

/** [[BloomMightContain]] over a `Broadcast` handle instead of the raw
  * filter. The plain variant embeds the filter in the serialized task
  * binary — fine for small filters, but a billion-key filter at 3% fpp is
  * ~0.9 GB, and the task binary ships per STAGE per retry. Holding the
  * broadcast handle instead keeps the task binary bytes-small and moves
  * the filter through the torrent-broadcast path (once per executor,
  * BitTorrent-style block fan-out) — the same transport a
  * broadcast-hash-join relation uses. The filter is resolved from the
  * broadcast exactly once per task (init-time mutable state in codegen, a
  * transient lazy in interpreted eval), so the per-row hot path is the
  * same single virtual call.
  */
case class BloomMightContainBc(child: Expression,
    bloomBc: org.apache.spark.broadcast.Broadcast[BloomFilter])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_bc"

  @transient private lazy val filter: BloomFilter = bloomBc.value

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[org.apache.spark.broadcast.Broadcast[_]].getName
    val bfCls = classOf[BloomFilter].getName
    val ref = ctx.addReferenceObj("graftBloomBc", bloomBc, bcCls)
    val bloomVar = ctx.addMutableState(bfCls, "graftBloom",
      v => s"$v = ($bfCls) $ref.value();")
    defineCodeGen(ctx, ev, c => s"$bloomVar.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBc =
    copy(child = newChild)
}
