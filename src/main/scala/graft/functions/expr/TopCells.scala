package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** IVF coarse quantizer: indices of the `p` centroids most cosine-similar
  * to the input `array<float>` vector, as a native expression.
  *
  * Centroids ride inside the expression (they are part of the plan and
  * ship with the task binary — fine for the coarse-quantizer sizes IVF
  * uses, ~sqrt(N) cells). One tight pass over all centroids per row, no
  * allocation beyond the p-element output.
  */
case class TopCells(child: Expression, centroids: Seq[Seq[Float]], p: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(p >= 1 && p <= centroids.size)

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"

  @transient private lazy val flat: Array[Array[Float]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    TopCells.compute(input.asInstanceOf[ArrayData], flat, p)

  // non-codegen (CodegenFallback-style via eval): the per-row work is a
  // dense O(cells x dim) loop that dominates any dispatch overhead
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", flat, "float[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.TopCells.compute($c, $cents, $p)")
  }

  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
}

object TopCells {

  /** Static so generated code can call it. */
  def compute(vec: ArrayData, centroids: Array[Array[Float]], p: Int): ArrayData = {
    val n = centroids.length
    val sims = new Array[Double](n)
    var c = 0
    while (c < n) {
      val cent = centroids(c)
      // loud failure on a dimension mismatch — silently truncating the
      // dot product would assign confidently wrong cells
      if (vec.numElements() != cent.length)
        throw new IllegalArgumentException(
          s"TopCells: vector dim ${vec.numElements()} != centroid dim ${cent.length}")
      val d = cent.length
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < d) {
        val x = vec.getFloat(i).toDouble
        val y = cent(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      sims(c) = if (na == 0.0 || nb == 0.0) -2.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      c += 1
    }
    // selection of top-p by repeated max (p is tiny)
    val out = new Array[Any](p)
    val taken = new Array[Boolean](n)
    var r = 0
    while (r < p) {
      var best = -1
      var bestSim = -3.0
      var j = 0
      while (j < n) {
        if (!taken(j) && sims(j) > bestSim) { bestSim = sims(j); best = j }
        j += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  def top_cells(vec: Column, centroids: Seq[Seq[Float]], p: Int): Column =
    toCol(TopCells(toExpr(vec), centroids, p))
}
