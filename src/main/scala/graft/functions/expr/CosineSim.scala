package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity of two `array<float>` embedding columns as a native
  * Catalyst expression.
  *
  * The built-in composition (`aggregate(zip_with(a,b,_*_), ...)`) allocates
  * an intermediate array per row-pair; in a brute-force k-NN the pair count
  * is |Q|x|N|, so per-pair allocation dominates. This expression is a tight
  * primitive loop with `doGenCode`, keeping the k-NN scan inside
  * whole-stage codegen and allocation-free.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // declared input types make the analyzer cast array<double> (e.g. SQL
  // array literals) to array<float> instead of getFloat reading garbage
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.expr.CosineSim.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {
  /** Accumulates in double for a deterministic, precision-stable result. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosine_sim(a: Column, b: Column): Column = toCol(CosineSim(toExpr(a), toExpr(b)))
}
