package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 scalar quantization of an `array<float>` vector in ONE
  * pass, as a native Catalyst expression returning
  * `struct<q: array<int>, scale: double>`.
  *
  * Why native and not the `aggregate` + `transform` composition: the scale
  * (`127 / max|v|`) is an aggregate over the whole vector, and lambda
  * bodies re-evaluate invariant subtrees per element — the composed form
  * is O(d^2) per row (the same pitfall documented on [[WordShingles]] and
  * [[MinHashBuckets]]), which at embedding dims of 1024+ turns a
  * bandwidth-bound projection into a compute-bound one. Here: one max
  * pass, one quantize pass.
  *
  * Semantics (identical to the q43 DuckDB oracle): element i maps to
  * `floor(x_i * scale + 0.5)` — floor of a double is bit-deterministic
  * cross-engine, decimal rounding is not. An all-zero vector quantizes to
  * zeros with scale 0.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = StructType(Seq(
    StructField("q", ArrayType(IntegerType, containsNull = true), nullable = false),
    StructField("scale", DoubleType, nullable = false)))

  override def prettyName: String = "quantize_int8"

  override def nullSafeEval(input: Any): Any =
    QuantizeInt8.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.QuantizeInt8.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {

  /** Static so generated code can call it. Null elements are preserved as
    * null (a missing dimension must not become a legitimate zero weight)
    * and are skipped by the max|v| scan — matching the SQL oracle, where
    * `abs(NULL)` drops out of the greatest-fold and
    * `floor(NULL * scale + 0.5)` stays NULL. */
  def compute(vec: ArrayData): InternalRow = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val a = math.abs(vec.getFloat(i).toDouble)
        if (a > maxAbs) maxAbs = a
      }
      i += 1
    }
    val scale = if (maxAbs > 0.0) 127.0 / maxAbs else 0.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) =
        if (vec.isNullAt(i)) null
        else Integer.valueOf(math.floor(vec.getFloat(i).toDouble * scale + 0.5).toInt)
      i += 1
    }
    InternalRow(new GenericArrayData(out), scale)
  }

  def quantize_int8(vec: Column): Column = toCol(QuantizeInt8(toExpr(vec)))
}
