package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact Jaccard similarity of two `array<string>` feature columns
  * (|A ∩ B| / |A ∪ B| over DISTINCT elements) as a native Catalyst
  * expression — the declarative predicate behind text near-dup joins
  * (`jaccard_sim(word_shingles(a.text, 3), word_shingles(b.text, 3)) >=
  * t`), and the exact-verify step of
  * [[graft.plans.ApproxJaccardJoinRewrite]].
  *
  * Why not `size(array_intersect(a,b)) / size(array_union(a,b))`? Two
  * full array materializations and two sort/dedup passes per row-pair;
  * in an all-pairs join the pair count is |A|x|B|, so per-pair
  * allocation dominates. This is one hash-set build per side and one
  * membership sweep, inside whole-stage codegen.
  *
  * Both-empty (or all-null-elements) inputs yield 0.0 — the
  * "no shared content" convention, matching [[CosineSim]] on zero-norm
  * vectors. Null ARRAYS null-propagate (BinaryExpression), so
  * `jaccard_sim(...) >= t` is never satisfied by a null side.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.expr.JaccardSim.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

object JaccardSim {

  private def toSet(arr: ArrayData): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(8, arr.numElements() * 2))
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i))
      i += 1
    }
    s
  }

  /** Static so generated code can call it. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val sa = toSet(a)
    val sb = toSet(b)
    if (sa.isEmpty && sb.isEmpty) return 0.0
    // sweep the smaller set against the larger
    val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    inter.toDouble / (sa.size + sb.size - inter)
  }

  def jaccard_sim(a: Column, b: Column): Column = toCol(JaccardSim(toExpr(a), toExpr(b)))
}
