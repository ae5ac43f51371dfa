package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit ROLLING fingerprints of every k-token window of a token array,
  * as one native Catalyst expression returning `array<long>` (one hash
  * per window start; an array shorter than k yields []).
  *
  * Why native and not `transform(sequence(...), i -> xxhash64(
  * array_join(slice(toks, i+1, k), ' ')))`: the composed form
  * materializes every window as a STRING — O(n*k) bytes copied per
  * document plus a lambda-invariant slice per element — so the hot loop
  * of exact-substring dedup pays ~k times the corpus bytes in pure
  * copying before hashing even starts. Here: one FNV-1a pass per token,
  * then each subsequent window hash is O(1) (subtract the outgoing
  * token's term, multiply by the base, add the incoming token) — O(n)
  * total, zero intermediate strings. At 100 TB the difference is the
  * scan being bandwidth-bound instead of allocation-bound.
  *
  * Hash construction: per-token FNV-1a 64 over UTF-8 bytes, combined as
  * a degree-(k-1) polynomial in an odd base with wrapping 64-bit
  * arithmetic — deterministic everywhere, and the rolling update is
  * exact (wrapping ring), not an approximation. Values are internal
  * join/group keys (never surfaced), so the only contract is collision
  * resistance, same as [[graft.functions.HashFunctions.fingerprint64]].
  * A null token hashes as 0 (token arrays from `TextFunctions.tokens`
  * never contain nulls).
  */
case class TokenWindowHashes(child: Expression, k: Int) extends UnaryExpression
    with ImplicitCastInputTypes {

  require(k > 0, s"token_window_hashes: k must be positive, got $k")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "token_window_hashes"

  override def nullSafeEval(input: Any): Any =
    TokenWindowHashes.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.TokenWindowHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashes =
    copy(child = newChild)
}

object TokenWindowHashes {

  private val Base = 1000003L // odd => invertible in the 2^64 ring
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 over the token's UTF-8 bytes. Static so generated code
    * can call through [[compute]]. */
  private def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * FnvPrime
      i += 1
    }
    h
  }

  /** Static so generated code can call it. */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (toks.isNullAt(i)) 0L else fnv64(toks.getUTF8String(i))
      i += 1
    }
    // pow = Base^(k-1) in the wrapping ring
    var pow = 1L
    var t = 0
    while (t < k - 1) { pow *= Base; t += 1 }
    var h = 0L
    t = 0
    while (t < k) { h = h * Base + th(t); t += 1 }
    val out = new Array[Long](n - k + 1)
    out(0) = h
    i = 1
    while (i <= n - k) {
      h = (h - th(i - 1) * pow) * Base + th(i + k - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def token_window_hashes(toks: Column, k: Int): Column =
    toCol(TokenWindowHashes(toExpr(toks), k))
}
