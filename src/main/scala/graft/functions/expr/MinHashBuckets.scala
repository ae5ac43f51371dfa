package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature + LSH band buckets of an `array<string>` feature
  * column, in ONE pass, as a native Catalyst expression returning
  * `array<struct<band:int, bucket:long>>` (ready to `explode`).
  *
  * Why not the built-in composition (`transform(sequence(0,k-1),
  * i => array_min(transform(features, f => xxhash64(f, i))))`)? Lambda
  * bodies re-evaluate their invariant subtrees on every iteration, and
  * projection collapse inlines the (expensive) feature-extraction tree into
  * every reference — measured 219 s for 5 000 docs at sf0.1 vs <1 s here.
  * The k "permutations" are affine 64-bit universal hashes
  * h_i(x) = mix(xxhash64(x) ^ seed_i) — one string hash per feature, k
  * mix/compare ops each, allocation-free until the final (bands)-element
  * output. E[fraction of matching signature slots] = Jaccard(A, B).
  */
case class MinHashBuckets(child: Expression, k: Int, bands: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k % bands == 0, s"k=$k must be divisible by bands=$bands")

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band", IntegerType, nullable = false),
      StructField("bucket", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "minhash_buckets"

  override def nullSafeEval(input: Any): Any =
    MinHashBuckets.compute(input.asInstanceOf[ArrayData], k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.MinHashBuckets.compute($c, $k, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBuckets =
    copy(child = newChild)
}

object MinHashBuckets {

  private val MAX_K = 1024

  /** SplitMix64 stream (public-domain algorithm) — deterministic seeds. */
  private[graft] val seeds: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(MAX_K) { x += 0x9E3779B97F4A7C15L; mix(x) }
  }

  /** SplitMix64 finalizer: full-avalanche 64-bit mix. */
  private[graft] def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Static so generated code can call it. */
  def compute(arr: ArrayData, k: Int, bands: Int): ArrayData = {
    require(k <= MAX_K, s"k=$k exceeds $MAX_K")
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < k) {
          val h = mix(base ^ seeds(j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    val r = k / bands
    val rows = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      // FNV-1a-style combine of the band's signature slots
      var acc = 0xCBF29CE484222325L ^ b
      var j = b * r
      val end = j + r
      while (j < end) { acc = (acc ^ mins(j)) * 0x100000001B3L; j += 1 }
      rows(b) = InternalRow(b, acc)
      b += 1
    }
    new GenericArrayData(rows)
  }

  def minhash_buckets(features: Column, k: Int, bands: Int): Column =
    toCol(MinHashBuckets(toExpr(features), k, bands))
}
