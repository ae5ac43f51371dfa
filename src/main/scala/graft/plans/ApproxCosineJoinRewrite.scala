package graft.plans

import graft.functions.VectorFunctions
import graft.functions.expr.CosineSim
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.GraftColumnBridge

/** Opt-in planner rule: rewrites an all-pairs cosine-similarity join
  *
  * {{{ SELECT ... FROM a JOIN b WHERE cosine_sim(a.vec, b.vec) >= t }}}
  *
  * (a cross join — O(|a|x|b|) pairs) into a banded random-hyperplane LSH
  * candidate join: both sides are tagged with (band, bucket) keys, joined
  * on them (hash shuffle on narrow keys), each surviving pair is verified
  * by the ORIGINAL exact predicate, and a first-matching-band filter keeps
  * pair multiplicity identical to the cross join (no dropDuplicates).
  * Pattern matching, loop guard, conjunct scan, and the exactness tail
  * are shared with the text twin — [[ApproxJoinRewriteBase]].
  *
  * The rewrite is APPROXIMATE — pairs whose signatures collide in no band
  * are lost (recall 1-(1-p^r)^b with threshold-dependent banding — see chooseBanding) —
  * so it is disabled unless `spark.graft.rewrite.approxCosineJoin=true`.
  * Precision is exact: the original filter still runs on every candidate.
  *
  * This is the SURVEY §7 step-8 "rewrite Rule for similarity-join
  * planning": users keep the declarative form; the rule supplies the plan
  * that survives a 100x scale-up.
  */
case class ApproxCosineJoinRewrite(spark: SparkSession) extends ApproxJoinRewriteBase {

  protected val enabledKey = "spark.graft.rewrite.approxCosineJoin"
  private val dimKey = "spark.graft.rewrite.approxCosineJoin.dim"
  protected val bucketPrefix = "__bucket_"

  protected def matchSimilarity(e: Expression): Option[(Expression, Expression)] =
    e match {
      case CosineSim(a, b) => Some((a, b))
      case _ => None
    }

  /** Pick the banding (r bits per band x b bands, signature width r*b
    * <= 63 so it packs in one long) from the matched threshold: the most
    * SELECTIVE configuration (widest bands — random pairs collide with
    * ~b*2^-r) whose recall 1-(1-p^r)^b at j = t stays >= 0.9, with
    * p = 1 - arccos(t)/pi (the hyperplane collision probability), using
    * the fewest bands that reach that recall (explode fan-out is b rows
    * per input row).
    *
    * Why selectivity is the primary axis: a streamed codegen comparison
    * (what the cross join does per pair) is ~100x cheaper than a
    * materialized-and-shuffled candidate row, so the rewrite only beats
    * the cross join once banding cuts the pair space well below 1% —
    * 4-bit bands (25% collision) LOSE to brute force on any corpus where
    * brute force is runnable at all. High thresholds earn 12-16-bit
    * bands; low thresholds fall back to permissive 2-bit rows rather
    * than silently losing recall (the rewrite stays opt-in precisely
    * because low-threshold pruning is weak — see the NearDedup
    * embeddingPairs cost model and Scratch probe numbers).
    */
  private[graft] def chooseBanding(t: Double): (Int, Int) = {
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, t))) / math.Pi
    def recall(r: Int, b: Int): Double = 1.0 - math.pow(1.0 - math.pow(p, r), b)
    val maxBands = 12 // fan-out bound: explode emits b rows per input row
    Seq(16, 12, 8, 6, 4, 2).flatMap { r =>
      (1 to math.min(63 / r, maxBands)).find(b => recall(r, b) >= 0.9).map(b => (r, b))
    }.headOption.getOrElse((2, maxBands)) // best already-searched recall, not below it
  }

  protected def rewrite(origOutput: Seq[Attribute], cond: Expression,
                        left: LogicalPlan, right: LogicalPlan,
                        lVec: Expression, rVec: Expression,
                        threshold: Double): LogicalPlan = {
    val dim = spark.conf.getOption(dimKey).map(_.toInt).getOrElse(64)
    val (bitsPerBand, bands) = chooseBanding(threshold)
    val bits = bitsPerBand
    val nBits = bits * bands
    import org.apache.spark.sql.functions.explode
    val toCol = GraftColumnBridge.toCol _

    def banded(side: LogicalPlan, vec: Expression, sigName: String,
               bandName: String, bucketName: String) = {
      val bb = s"__bb$sigName"
      GraftColumnBridge.ofRows(spark, side)
        // null vectors can never satisfy cosine_sim >= t (the predicate
        // null-propagates to false), so dropping them preserves semantics
        // and keeps hyperplaneSignature's dim guard from firing on them
        .filter(toCol(vec).isNotNull)
        .withColumn(sigName, VectorFunctions.hyperplaneSignature(toCol(vec), dim, nBits))
        .withColumn(bb, explode(VectorFunctions.bandBuckets(col(sigName), nBits, bands)))
        .withColumn(bandName, col(s"$bb.band"))
        .withColumn(bucketName, col(s"$bb.bucket"))
        .drop(bb)
    }

    val lb = banded(left, lVec, "__sig_l", "__band_l", "__bucket_l")
    val rb = banded(right, rVec, "__sig_r", "__band_r", "__bucket_r")

    val keepFirst = firstMatchingBand(bands, col("__band_l"), (side, band) =>
      VectorFunctions.bandBucket(col(if (side == 0) "__sig_l" else "__sig_r"), band, bits))

    val joined = lb.join(rb,
        col("__band_l") === col("__band_r") && col("__bucket_l") === col("__bucket_r"))
      .filter(keepFirst)
      .drop("__sig_l", "__band_l", "__bucket_l", "__sig_r", "__band_r", "__bucket_r")

    verifyAndRestore(origOutput, cond, left, right, joined)
  }
}
