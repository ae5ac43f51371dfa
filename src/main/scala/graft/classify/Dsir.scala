package graft.classify

import graft.functions.TextFunctions
import graft.functions.expr.Fnv64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick the raw-corpus documents whose hashed-n-gram
  * distribution looks most like a small TARGET corpus, by scoring each
  * document with the log importance weight
  *
  *   log w(doc) = Σ_b cnt_b(doc) · (log p_target(b) − log p_raw(b))
  *
  * under Laplace-smoothed bag-of-n-gram categorical models fit on the
  * two corpora. This is the distribution-MATCHING counterpart of the
  * [[NgramScorer]] classifier gate: the classifier needs labels, DSIR
  * needs only an exemplar corpus — the standard way a pretraining
  * mixture is steered toward a domain (books, wiki, code) without
  * per-document labels.
  *
  * Feature space: hashed lowercase unigram + word-2-shingle COUNTS
  * (bag-of-n-grams, NOT the classifier's binary presence — DSIR's
  * product-of-token-probabilities semantics weights a feature by its
  * occurrence count), FNV-1a'd into a power-of-two bucket space exactly
  * like [[NgramScorer.featureBuckets]].
  *
  * INTEGER-EXACT logs: every log in the score is the piecewise-linear
  * fixed-point base-2 log [[linLog2Q16]] — Q16 (value = 65536·log2(n)
  * at exact powers of two, linearly interpolated between them via the
  * integer mantissa, max error ~0.086 bit between powers). It is pure
  * integer arithmetic (`bin`-string msb + one shift + one div), so fit,
  * score, merge, and retract are bit-reproducible across engines,
  * partitionings, and an ANSI-SQL oracle — a float `ln` would drift by
  * ulps between libms and be unreplayable. Monotone in n, which is the
  * property selection ranking actually needs.
  *
  * With B = buckets, target totals Nt, raw totals Nr (token-occurrence
  * totals, carried on the [[NgramScorer.TotalsBucket]] row):
  *
  *   λ(b)      = L(nt_b + 1) − L(nr_b + 1)          (per-bucket, Q16)
  *   C         = L(Nr + B) − L(Nt + B)              (per-token constant)
  *   score_q16 = Σ_b cnt_b · λ(b)  +  total_cnt · C
  *
  * which is exactly 65536·log2 w(doc) up to the interpolation error.
  * Buckets unseen in BOTH corpora contribute λ = 0 via the smoothing —
  * absent state rows read as nt = nr = 0, L(1) − L(1) = 0, so the left
  * join's null is literally the right answer.
  *
  * Replaces nothing in the reference (no data-selection stage); same
  * north-star scope as the classifier (SURVEY.md §7 step 8).
  *
  * Scale shape (the classifier's): fitting explodes each corpus once
  * into a map-side-combinable (bucket, side) count whose shuffle is
  * bounded by 2·buckets + 2 rows — a PARAMETER, not a corpus quantity.
  * Scoring joins the (≤ buckets + 1)-row λ frame broadcast (size-gated)
  * against the exploded corpus: no corpus shuffle beyond the per-doc
  * sum's map-side pre-combine. State is persistable and a member of the
  * increment family: [[mergeStates]] adds per-key, [[retractState]]
  * subtracts exactly under the [[graft.operators.Retraction]] contract.
  */
object Dsir {

  /** Max count the Q16 log accepts: (n << 16) must stay in a signed 64-bit
    * long with headroom; corpus token totals beyond 2^46 (~70 trillion)
    * need a wider fixed point, so fail loudly there. */
  val MaxLogInput: Long = 1L << 46

  private def requirePow2(buckets: Int): Unit =
    require(buckets > 1 && (buckets & (buckets - 1)) == 0,
      s"Dsir: buckets must be a power of two > 1, got $buckets")

  /** Piecewise-linear fixed-point log2 in Q16: for integer n ≥ 1,
    * msb = floor(log2 n) via the bit length of `bin(n)`, then
    *
    *   L(n) = msb·65536 + ((n·65536) div 2^msb − 65536)
    *
    * — exact at powers of two, linear in n between them (max error
    * 0.0861 bit at n = e·2^k/2), strictly monotone, pure BIGINT. The
    * `bin`-string route is deliberate: both Spark and the DuckDB oracle
    * expose binary formatting of integers, so msb needs no float log
    * on either side. Input must be in [1, [[MaxLogInput]]].
    */
  def linLog2Q16(n: Column): Column = {
    val nl = n.cast("long")
    val msb = (length(bin(nl)) - 1).cast("int")
    val mant = call_function("shiftright", nl * 65536L, msb) - 65536L
    when(nl < 1L || nl > MaxLogInput,
      raise_error(concat(lit("Dsir.linLog2Q16: input out of [1, 2^46]: "),
        nl.cast("string"))))
      .otherwise(msb.cast("long") * 65536L + mant)
  }

  /** JVM mirror of [[linLog2Q16]], bit-identical — for streaming keyed
    * state that must read out exactly like the batch/oracle column form
    * (the [[graft.functions.HashFunctions.idHash32Of]] convention). */
  def linLog2Q16Of(n: Long): Long = {
    require(n >= 1L && n <= MaxLogInput,
      s"Dsir.linLog2Q16Of: input out of [1, 2^46]: $n")
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(n)
    msb.toLong * 65536L + ((n * 65536L) >> msb) - 65536L
  }

  /** The SQL twin of [[linLog2Q16]] for a DuckDB oracle: `n` must be a
    * plain column/lambda reference (substituted multiple times). */
  def linLog2Q16Sql(n: String): String =
    s"((length(bin(CAST($n AS BIGINT))) - 1) * 65536 + " +
      s"(CAST($n AS BIGINT) * 65536) // (CAST(1 AS BIGINT) << (length(bin(CAST($n AS BIGINT))) - 1)) - 65536)"

  /** Explode `docs` into one row per feature OCCURRENCE: `keep` columns
    * plus `bucket` — hashed lowercase unigrams + word-2-grams with
    * duplicates preserved (bag semantics, unlike the classifier's
    * distinct presence; [[TextFunctions.wordShingles]] is deliberately
    * distinct, so the 2-grams are composed here over a tokens column
    * MATERIALIZED first — referencing `tokens(text)` inside the lambda
    * would re-tokenize per element, the pitfall that native expression
    * exists to avoid). Null/empty text contributes no rows when
    * `keepEmptyDocs` is false, one null-bucket row when true. */
  def explodedBuckets(docs: DataFrame, textCol: String, buckets: Int,
                      keep: Seq[String],
                      keepEmptyDocs: Boolean = false): DataFrame = {
    requirePow2(buckets)
    val buck = bucketArray(col("__toks"), buckets)
    val withFeats = docs
      .select(keep.map(col) :+ TextFunctions.tokens(col(textCol)).as("__toks"): _*)
    val ex = if (keepEmptyDocs) explode_outer(buck) else explode(buck)
    withFeats.select(keep.map(col) :+ ex.as("bucket"): _*)
  }

  /** The per-row bag-of-buckets ARRAY (the [[explodedBuckets]] payload
    * without the explode) — the form a stateless streaming gate maps a
    * broadcast λ table over. `toks` MUST be a materialized tokens
    * column reference (see [[explodedBuckets]] on why), never an inline
    * `tokens(text)` call. Null tokens yield a null array. */
  def bucketArray(toks: Column, buckets: Int): Column = {
    requirePow2(buckets)
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat(element_at(toks, i + 1), lit(" "),
          element_at(toks, i + 2)))).otherwise(array())
    transform(concat(toks, bigrams),
      t => Fnv64.fnv64(t).bitwiseAND(lit(buckets - 1L)))
  }

  /** Collect a λ frame into the driver-side map the streaming gate
    * ([[graft.streaming.StreamingOps.dsirGate]]) broadcasts — bounded by
    * construction at `buckets` rows; the require is the loud guard
    * against an unexpectedly huge external frame ([[NgramScorer
    * .collectWeights]] contract). */
  def collectLambda(lambda: DataFrame, maxRows: Long = 4194304L): Map[Long, Long] = {
    val n = lambda.count()
    require(n <= maxRows,
      s"collectLambda: $n rows > maxRows=$maxRows — too large to broadcast as a map")
    lambda.select(col("bucket"), col("lambda_q16")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Per-side bucket-count state from one corpus: long-format
    * `(bucket, side, n)` where n is the total OCCURRENCE count of the
    * bucket across the corpus, plus one [[NgramScorer.TotalsBucket]] row
    * carrying the side's token-occurrence total. `side` is 1 for the
    * target corpus, 0 for raw. One bucket-bounded shuffle. */
  def countState(docs: DataFrame, textCol: String, side: Int,
                 buckets: Int): DataFrame = {
    requirePow2(buckets)
    require(side == 0 || side == 1, s"Dsir.countState: side in {0,1}, got $side")
    val exploded = explodedBuckets(docs, textCol, buckets, keep = Seq.empty)
    val perBucket = exploded.groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"), lit(side.toLong).as("side"), col("n"))
    val totals = exploded.groupBy()
      .agg(count(lit(1)).as("n"))
      .select(lit(NgramScorer.TotalsBucket).as("bucket"),
        lit(side.toLong).as("side"), col("n"))
    perBucket.unionByName(totals)
  }

  /** Fit both sides at once: target ∪ raw count states. */
  def fitState(target: DataFrame, raw: DataFrame, textCol: String,
               buckets: Int): DataFrame =
    countState(target, textCol, side = 1, buckets)
      .unionByName(countState(raw, textCol, side = 0, buckets))

  /** Merge persisted state increments (disjoint doc sets per side) by
    * per-(bucket, side) addition — exact, so a daily-increment fit
    * equals the single-pass fit. */
  def mergeStates(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "Dsir.mergeStates: no increments")
    parts.reduce(_ unionByName _)
      .groupBy("bucket", "side").agg(sum("n").as("n"))
  }

  /** Takedown: subtract removed docs' occurrence counts from one side of
    * a persisted state — re-reads ONLY the removed docs; negative counts
    * fail loudly ([[graft.operators.Retraction]] contract). */
  def retractState(state: DataFrame, removedDocs: DataFrame, textCol: String,
                   side: Int, buckets: Int): DataFrame =
    graft.operators.Retraction.subtract(state,
      countState(removedDocs, textCol, side, buckets),
      Seq("bucket", "side"), "n")

  /** λ weights `(bucket, lambda_q16)` plus the single-row per-token
    * constant frame `(c_q16, nt_total, nr_total)` from a state. The
    * pivot runs at state cardinality (≤ 2·buckets + 2 rows). Buckets
    * never seen on either side get no row (their λ is exactly 0). */
  def lambdaWeights(state: DataFrame, buckets: Int): (DataFrame, DataFrame) = {
    requirePow2(buckets)
    val counts = state.filter(col("bucket") =!= NgramScorer.TotalsBucket)
      .groupBy("bucket")
      .agg(sum(when(col("side") === 1L, col("n")).otherwise(0L)).as("nt"),
        sum(when(col("side") === 0L, col("n")).otherwise(0L)).as("nr"))
    val lambda = counts.select(col("bucket"),
      (linLog2Q16(col("nt") + 1L) - linLog2Q16(col("nr") + 1L))
        .as("lambda_q16"))
    val totals = state.filter(col("bucket") === NgramScorer.TotalsBucket)
      .groupBy()
      .agg(sum(when(col("side") === 1L, col("n")).otherwise(0L)).as("nt_total"),
        sum(when(col("side") === 0L, col("n")).otherwise(0L)).as("nr_total"))
      .select(
        (linLog2Q16(col("nr_total") + lit(buckets.toLong)) -
          linLog2Q16(col("nt_total") + lit(buckets.toLong))).as("c_q16"),
        col("nt_total"), col("nr_total"))
    (lambda, totals)
  }

  /** Score documents by the Q16 log importance weight:
    * `(doc_id, n_tokens, score_q16)`. Docs with no features score
    * exactly 0 (empty product). The λ frame joins broadcast when small
    * (size-gated); the 1-row constant frame always crossJoins broadcast.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            lambda: DataFrame, const: DataFrame, buckets: Int,
            broadcastMaxRows: Long = 4194304L): DataFrame = {
    requirePow2(buckets)
    val w = lambda.select(col("bucket").as("__b"), col("lambda_q16"))
    val wSide = if (lambda.count() <= broadcastMaxRows) broadcast(w) else w
    explodedBuckets(
        docs.select(col(idCol).as("doc_id"), col(textCol)),
        textCol, buckets, keep = Seq("doc_id"), keepEmptyDocs = true)
      .join(wSide, col("bucket") === col("__b"), "left")
      .groupBy("doc_id")
      .agg(count(col("bucket")).as("n_tokens"),
        coalesce(sum(col("lambda_q16")), lit(0L)).as("__s"))
      .crossJoin(broadcast(const.select(col("c_q16"))))
      .select(col("doc_id"), col("n_tokens"),
        (col("__s") + col("n_tokens") * col("c_q16")).as("score_q16"))
  }

  /** Fit on (target, raw) and score `docs` end-to-end. */
  def selectScores(target: DataFrame, raw: DataFrame, docs: DataFrame,
                   idCol: String, textCol: String, buckets: Int): DataFrame = {
    val (lambda, const) = lambdaWeights(
      fitState(target, raw, textCol, buckets), buckets)
    score(docs, idCol, textCol, lambda, const, buckets)
  }

  /** The selection itself: top-k most target-like docs, deterministic
    * tie-break on doc_id — a TakeOrderedAndProject, never a global sort
    * materialization. */
  def selectTopK(scored: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"Dsir.selectTopK: k must be positive, got $k")
    scored.orderBy(col("score_q16").desc, col("doc_id")).limit(k)
  }
}
