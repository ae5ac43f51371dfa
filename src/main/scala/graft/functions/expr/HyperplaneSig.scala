package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bit signature of an `array<float>` embedding as a
  * native Catalyst expression: bit i is the sign of dot(v, plane_i), packed
  * into a long.
  *
  * Why not the built-in composition (per plane,
  * `aggregate(zip_with(v, planeLits, _*_), 0.0, _+_)` OR-reduced)? Each
  * `zip_with` allocates an intermediate dim-element array per row, so an
  * nBits-bit signature costs nBits allocations per row and the plan carries
  * nBits aggregate subtrees (48-bit signatures measurably dominate codegen
  * size). This expression is one allocation-free nested loop: for the q49
  * configuration (dim=64, nBits=48) the signature stage drops ~3x.
  *
  * Bit-exact contract with the composed form (which the DuckDB oracles
  * replay): the dot product accumulates left-to-right in double starting
  * from 0.0 over FLOAT-valued elements widened to double; a null element
  * nulls every dot, which the composed `when(d >= 0, ...).otherwise(0)`
  * maps to an all-zero signature; a length mismatch throws rather than
  * letting zip_with null-pad the vector into bucket 0 (a hidden cross
  * join). Planes are the deterministic seeded Gaussian stream
  * ([[planes]]), memoized per (dim, nBits, seed).
  */
case class HyperplaneSig(child: Expression, dim: Int, nBits: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")

  // array<float> is the engine-wide embedding storage type (same contract
  // as CosineSim): double inputs are narrowed to float32 by the implicit
  // cast BEFORE the dot product — the bit-exact oracle contract holds for
  // float-valued vectors, which is what every operator here stores.
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  // The expression itself is null-safe (standard UnaryExpression plumbing:
  // NULL in -> NULL out). The LOUD-null contract — a corrupt embedding row
  // must not silently skip every LSH bucket and pass dedup unexamined —
  // lives in the public wrapper [[graft.functions.VectorFunctions
  // .hyperplaneSignature]], which raise_errors on a null vector exactly
  // like the composed form's dim guard did.
  override def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], dim, nBits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.HyperplaneSig.compute($c, $dim, $nBits, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {

  /** The deterministic Gaussian hyperplanes. `java.util.Random`'s Gaussian
    * stream is JVM-spec-defined, so these are stable constants any engine
    * can replay (`Double.toString` round-trips to identical bits) — oracle
    * SQL bakes them as literals via
    * [[graft.functions.VectorFunctions.hyperplanes]].
    */
  def planes(dim: Int, nBits: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Row-major flattened planes, memoized: generated once per
    * (dim, nBits, seed) per JVM, shared across all tasks. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Double]]()

  private def flatPlanes(dim: Int, nBits: Int, seed: Long): Array[Double] =
    cache.computeIfAbsent((dim, nBits, seed),
      _ => planes(dim, nBits, seed).toArray.flatten)

  /** Static so generated code can call it. */
  def compute(v: ArrayData, dim: Int, nBits: Int, seed: Long): Long = {
    val n = v.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"hyperplane_sig: expected a $dim-dim vector, got length $n")
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return 0L // composed-form parity: null dot -> all bits 0
      j += 1
    }
    val p = flatPlanes(dim, nBits, seed)
    var sig = 0L
    var i = 0
    while (i < nBits) {
      val off = i * dim
      var acc = 0.0
      var k = 0
      while (k < dim) {
        acc += v.getFloat(k).toDouble * p(off + k)
        k += 1
      }
      if (acc >= 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  def hyperplane_sig(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column =
    toCol(HyperplaneSig(toExpr(vec), dim, nBits, seed))
}
