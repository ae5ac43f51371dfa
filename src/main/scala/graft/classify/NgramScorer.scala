package graft.classify

import graft.functions.TextFunctions
import graft.functions.expr.Fnv64
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashed-n-gram LINEAR text classifier — the quality-filter stage of a
  * training-data pipeline (the CCNet / GPT-3 "looks like the reference
  * corpus" gate, fastText-style): train per-feature weights from a
  * labeled sample, then score every corpus document by a sparse linear
  * model over hashed word n-grams and keep what clears a threshold.
  *
  * Model: binary presence features (a document's DISTINCT hashed
  * unigrams + word-2-shingles, bucketed by FNV-1a into a power-of-two
  * feature space — the hashing trick, so the weight vector is bounded by
  * `buckets` regardless of vocabulary), with the weight of bucket `b`
  * the Laplace-smoothed difference of class presence rates in ppm:
  *
  *   w(b) = (n_pos(b)+1)·1e6 div (N_pos+2)  −  (n_neg(b)+1)·1e6 div (N_neg+2)
  *
  * and score(doc) = Σ_{b ∈ features(doc)} w(b), unseen buckets scoring 0
  * (uninformative). This is the Rocchio/class-centroid linear model on
  * binary features — the same family as a fastText/logistic quality
  * classifier, but with INTEGER-EXACT training and scoring: every count,
  * div, and sum is BIGINT, so the model is bit-reproducible across
  * engines, runs, and partitionings (a float log-odds model would drift
  * by ulps between partial-agg trees and be unreplayable in an oracle).
  *
  * Replaces nothing in the reference (it has no classifier); north-star
  * scope like SURVEY.md §7 step 8 — the curation gate the reference's
  * Redshift-side review scoring (`apps/process_reviews.py:125-135`)
  * points toward at corpus scale.
  *
  * Scale shape: training is one explode of distinct per-doc buckets into
  * a map-side-combinable (bucket, label) count — the shuffle is bounded
  * by 2·buckets + 2 rows, a PARAMETER, not a corpus quantity. Scoring
  * re-joins the (≤ buckets)-row weight frame broadcast (size-gated), so
  * the corpus never shuffles: distinct-bucket explode, map-side hash
  * join, one pre-combined per-doc sum. The count state is a member of
  * the persistable-state family: increments over disjoint doc sets merge
  * by per-key addition ([[mergeStates]]) and retract exactly
  * ([[retractState]], [[graft.operators.Retraction]] contract).
  *
  * Probe-backed (Scratch, round 8, local[32], ~40-token docs, 2^18
  * buckets): train 6.3 s at 100k docs vs 7.0 s at 1M (flat at 10x —
  * fixed scheduling overhead dominates; the shuffle is bucket-bounded),
  * score 1.3 s vs 3.4 s (2.6x at 10x, tracking the corpus scan).
  */
object NgramScorer {

  /** Reserved state bucket carrying per-class document totals (real
    * feature buckets are masked into [0, buckets)). */
  val TotalsBucket: Long = -1L

  private def requirePow2(buckets: Int): Unit =
    require(buckets > 1 && (buckets & (buckets - 1)) == 0,
      s"NgramScorer: buckets must be a power of two > 1, got $buckets")

  /** A document's DISTINCT feature buckets: hashed lowercase whitespace
    * unigrams plus word-2-shingles, FNV-1a'd and masked into
    * [0, buckets). Power-of-two masking makes Spark's signed-long and
    * the oracle's UBIGINT views of the hash agree bit-for-bit (the
    * low-bits window is representation-independent; a general modulus is
    * not). Distinct at BUCKET level: two features colliding into one
    * bucket are one presence — the hashing-trick semantics both train
    * and score must share.
    */
  def featureBuckets(text: org.apache.spark.sql.Column, buckets: Int): org.apache.spark.sql.Column = {
    requirePow2(buckets)
    val feats = array_union(
      array_distinct(TextFunctions.tokens(text)),
      TextFunctions.wordShingles(text, 2))
    array_distinct(transform(feats,
      t => Fnv64.fnv64(t).bitwiseAND(lit(buckets - 1L))))
  }

  /** The classifier's COUNT STATE from a labeled sample: long-format
    * `(bucket, label, n)` — per (feature bucket, class) the number of
    * documents containing the bucket, plus one [[TotalsBucket]] row per
    * class with its document total. `labelExpr` must evaluate to a
    * boolean (true = positive class); null-labeled rows are excluded.
    * One bounded shuffle; merge increments with [[mergeStates]], retract
    * with [[retractState]], turn into weights with [[weightsFromState]].
    */
  def countState(docs: DataFrame, textCol: String, labelExpr: String,
                 buckets: Int): DataFrame = {
    requirePow2(buckets)
    val labeled = docs
      .withColumn("__label", when(expr(labelExpr), 1L).otherwise(0L))
      .filter(expr(labelExpr).isNotNull)
    val present = labeled
      .select(col("__label").as("label"),
        explode(featureBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy("bucket", "label").agg(count(lit(1)).as("n"))
    val totals = labeled.groupBy(col("__label").as("label"))
      .agg(count(lit(1)).as("n"))
      .select(lit(TotalsBucket).as("bucket"), col("label"), col("n"))
    present.unionByName(totals)
  }

  /** Merge persisted [[countState]] increments (disjoint doc sets) by
    * per-(bucket, label) addition — exact, so incremental training over
    * daily snapshots equals the single-pass model. */
  def mergeStates(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "NgramScorer.mergeStates: no increments")
    parts.reduce(_ unionByName _)
      .groupBy("bucket", "label").agg(sum("n").as("n"))
  }

  /** Takedown: subtract removed labeled docs' counts from a persisted
    * state — re-reads ONLY the removed docs; negative counts fail
    * loudly ([[graft.operators.Retraction]] contract). */
  def retractState(state: DataFrame, removedDocs: DataFrame, textCol: String,
                   labelExpr: String, buckets: Int): DataFrame =
    graft.operators.Retraction.subtract(state,
      countState(removedDocs, textCol, labelExpr, buckets),
      Seq("bucket", "label"), "n")

  /** Weights `(bucket, w_ppm)` from a [[countState]]: Laplace-smoothed
    * presence-rate difference in ppm, integer-exact (see object doc).
    * Buckets absent from the state get no row — [[scoreAgainst]] scores
    * them 0. The pivot runs at state cardinality (≤ 2·buckets rows).
    */
  def weightsFromState(state: DataFrame): DataFrame = {
    val counts = state.filter(col("bucket") =!= TotalsBucket)
      .groupBy("bucket")
      .agg(sum(when(col("label") === 1L, col("n")).otherwise(0L)).as("np"),
        sum(when(col("label") === 0L, col("n")).otherwise(0L)).as("nn"))
    val totals = state.filter(col("bucket") === TotalsBucket)
      .groupBy()
      .agg(sum(when(col("label") === 1L, col("n")).otherwise(0L)).as("tp"),
        sum(when(col("label") === 0L, col("n")).otherwise(0L)).as("tn"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (expr("(np + 1) * 1000000 div (tp + 2)") -
          expr("(nn + 1) * 1000000 div (tn + 2)")).as("w_ppm"))
  }

  /** Train end-to-end: [[countState]] → [[weightsFromState]]. */
  def train(docs: DataFrame, textCol: String, labelExpr: String,
            buckets: Int): DataFrame =
    weightsFromState(countState(docs, textCol, labelExpr, buckets))

  /** Score documents against a FIXED weight frame (from [[train]] or
    * persisted weights) — the serving form. Returns
    * `(doc_id, n_feats, score_ppm)`; docs with zero features score 0
    * over 0 features (kept — absence of evidence is not negative
    * evidence; gate on n_feats separately if required). Weights
    * broadcast when ≤ `broadcastMaxRows` (they are ≤ `buckets` rows by
    * construction — the gate only fires if a caller passes an
    * unexpectedly huge external frame), so the corpus never shuffles.
    */
  def scoreAgainst(docs: DataFrame, idCol: String, textCol: String,
                   weights: DataFrame, buckets: Int,
                   broadcastMaxRows: Long = 4194304L): DataFrame = {
    requirePow2(buckets)
    val w = weights.select(col("bucket").as("__b"), col("w_ppm"))
    val wSide = if (weights.count() <= broadcastMaxRows) broadcast(w) else w
    docs.select(col(idCol).as("doc_id"),
        explode_outer(featureBuckets(col(textCol), buckets)).as("bucket"))
      .join(wSide, col("bucket") === col("__b"), "left")
      .groupBy("doc_id")
      .agg(count(col("bucket")).as("n_feats"),
        coalesce(sum(col("w_ppm")), lit(0L)).as("score_ppm"))
  }

  /** Collect a weight frame into the driver-side map the streaming gate
    * ([[graft.streaming.StreamingOps.ngramQualityGate]]) broadcasts.
    * Bounded by construction at `buckets` rows; the require is the loud
    * guard against an unexpectedly huge external frame (the
    * collectBigramCounts contract). */
  def collectWeights(weights: DataFrame, maxRows: Long = 4194304L): Map[Long, Long] = {
    val n = weights.count()
    require(n <= maxRows,
      s"collectWeights: $n rows > maxRows=$maxRows — too large to broadcast as a map")
    weights.select(col("bucket"), col("w_ppm")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** [[scoreAgainst]] plus the keep decision: `keep = score_ppm >=
    * thresholdPpm` — the corpus-curation gate itself. */
  def qualityGate(docs: DataFrame, idCol: String, textCol: String,
                  weights: DataFrame, buckets: Int,
                  thresholdPpm: Long): DataFrame =
    scoreAgainst(docs, idCol, textCol, weights, buckets)
      .withColumn("keep", col("score_ppm") >= thresholdPpm)
}
