package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>` columns.
  *
  * Two tiers: built-in compositions (`zip_with` + `aggregate`) that DuckDB
  * can oracle-check, and the allocation-free native expression
  * [[graft.functions.expr.CosineSim]] for hot loops (brute-force k-NN).
  */
object VectorFunctions {

  /** Dot product via zip_with+aggregate (double accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity from built-ins (oracle-comparable path). */
  def cosineBuiltin(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Fast path: native Catalyst expression, stays in whole-stage codegen. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.expr.CosineSim.cosine_sim(a, b)

  /** Symmetric int8 scalar quantization of a float vector — the standard
    * memory/bandwidth reduction for embedding storage and ANN (4x smaller
    * than float32, dot products stay SIMD-friendly). Returns
    * `struct<q: array<int>, scale: double>` in one pass; see
    * [[graft.functions.expr.QuantizeInt8]] for why this is a native
    * expression (the composed aggregate-in-lambda form is O(d^2)/row) and
    * for the floor(x*scale + 0.5) determinism contract.
    */
  def quantizeInt8Struct(vec: Column): Column =
    graft.functions.expr.QuantizeInt8.quantize_int8(vec)

  /** The int8 vector alone (q field of [[quantizeInt8Struct]]). */
  def quantizeInt8(vec: Column): Column =
    quantizeInt8Struct(vec).getField("q")

  /** The quantization scale (127/max|v|; 0 for the all-zero vector) —
    * callers persist it next to the int8 vector to dequantize. */
  def quantizeScale(vec: Column): Column =
    quantizeInt8Struct(vec).getField("scale")

  /** Prefix truncation to the first `d` dimensions — the matryoshka
    * (MRL-style) serving trick: embeddings trained with nested-prefix
    * objectives stay usable at a fraction of the dimensions, so a
    * pipeline can retrieve/cluster/dedup at d=16-64 and reserve the full
    * vector for the final re-rank — a direct multiplier on every
    * downstream ANN cost (index bytes, probe bandwidth, pair-scoring
    * FLOPs). Cosine over truncated vectors needs re-normalization, which
    * every consumer here does implicitly by using cosine (not dot) on the
    * truncated column. Pure `slice` — codegen'd, no copy beyond the
    * projected prefix.
    */
  def truncateDims(vec: Column, d: Int): Column = {
    require(d > 0, s"truncateDims: d must be positive, got $d")
    slice(vec, 1, d)
  }

  /** Banded `(band, bucket)` structs from a packed bit signature: band b's
    * bucket is bits [b*r, (b+1)*r) of the signature. Shared by the LSH
    * kNN, the embedding near-dup join, and the ApproxCosineJoinRewrite
    * planner rule — one definition of banding, one place to fix it.
    */
  def bandBuckets(sig: Column, nBits: Int, bands: Int): Column = {
    val bits = nBits / bands
    array((0 until bands).map(b =>
      struct(lit(b).as("band"), bandBucket(sig, b, bits).as("bucket"))): _*)
  }

  /** Bucket value of one band (bits [band*bits, (band+1)*bits)). */
  def bandBucket(sig: Column, band: Int, bits: Int): Column =
    shiftrightunsigned(sig, band * bits).bitwiseAND(lit((1L << bits) - 1))

  /** The deterministic Gaussian hyperplanes behind [[hyperplaneSignature]].
    * Public so oracle SQL can bake the exact plane values as literals —
    * `java.util.Random`'s Gaussian stream is JVM-spec-defined, so the
    * planes are stable constants, and `Double.toString`'s shortest
    * round-trip representation parses back to the identical bits in any
    * IEEE-754 engine. Delegates to the native expression's companion so
    * the oracle literals and the executed kernel can never drift.
    */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Seq[Array[Double]] =
    graft.functions.expr.HyperplaneSig.planes(dim, nBits, seed)

  /** Random-hyperplane LSH bit signature packed into a long: bit i is the
    * sign of dot(v, plane_i). Native one-pass expression
    * ([[graft.functions.expr.HyperplaneSig]]) — the composed per-plane
    * `aggregate(zip_with(...))` form allocates a dim-element array per
    * plane per row and blows up the plan with nBits aggregate subtrees.
    * Planes are deterministic seeded constants; the expression keeps the
    * composed form's exact semantics (left-to-right double accumulation,
    * all-zero signature on a null element, loud failure on a length
    * mismatch — zip_with would null-pad and collapse the dataset into
    * one LSH bucket, a hidden cross join).
    */
  def hyperplaneSignature(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    // loud-null contract: a NULL embedding (failed upstream embedding job)
    // must not silently hash into no bucket and pass dedup unexamined —
    // same failure mode the composed form's raise_error dim guard caught
    val sig = graft.functions.expr.HyperplaneSig.hyperplane_sig(vec, dim, nBits, seed)
    when(vec.isNull,
      raise_error(lit("hyperplaneSignature: null vector (corrupt embedding row)")).cast("long"))
      .otherwise(sig)
  }

  /** Embedding HYGIENE audit — the vector twin of the text-side q167:
    * the corruption classes that silently poison every ANN / dedup /
    * drift operator downstream, none of which a content gate sees.
    * Per vector: `dim` (actual length), `n_nonfinite` (NaN or ±Inf
    * elements — one NaN makes every cosine against the vector NaN,
    * which most top-k comparators silently sort LAST, i.e. the corrupt
    * vector just never matches anything), `n_zero` (exact-zero
    * elements — sparsity audit), and `ok` = right dimension, all
    * finite, not the all-zeros vector (zero norm makes cosine 0/0).
    * Null vector → null counts, `ok` false (a missing embedding is a
    * definite failure, unlike q167's unknown-text convention: every
    * downstream operator would throw or skip it).
    *
    * Pure element-wise `filter`/`size` over the array — codegen'd, no
    * shuffle, exact integer outputs (NaN/Inf/zero tests are exact
    * predicates, so no float-order instability), replayable in any
    * engine with list primitives.
    */
  def vectorHygiene(df: org.apache.spark.sql.DataFrame, idCol: String,
                    vecCol: String, expectedDim: Int): org.apache.spark.sql.DataFrame = {
    require(expectedDim > 0, s"vectorHygiene: expectedDim must be positive, got $expectedDim")
    val v = col(vecCol)
    val inf = lit(Float.PositiveInfinity)
    df.select(col(idCol),
        size(v).cast("long").as("dim"),
        size(filter(v, x => isnan(x) || x === inf || x === -inf))
          .cast("long").as("n_nonfinite"),
        size(filter(v, x => !isnan(x) && x === 0.0f)).cast("long").as("n_zero"))
      .withColumn("ok",
        coalesce(col("dim") === expectedDim && col("n_nonfinite") === 0L &&
          col("n_zero") < col("dim"), lit(false)))
  }
}
