package graft.plans

import graft.functions.expr.{JaccardSim, MinHashBuckets}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.{col, element_at, explode}
import org.apache.spark.sql.graftbridge.GraftColumnBridge

/** Opt-in planner rule — the text twin of [[ApproxCosineJoinRewrite]]:
  * rewrites an all-pairs Jaccard-similarity join
  *
  * {{{ SELECT ... FROM a JOIN b
  *     WHERE jaccard_sim(word_shingles(a.text, 3), word_shingles(b.text, 3)) >= t }}}
  *
  * (a cross join — O(|a|x|b|) pairs, each paying a shingle-set compare)
  * into a MinHash-banded candidate join: both sides are tagged with
  * (band, bucket) keys from ONE MinHash pass over the SAME shingle
  * expression the predicate uses, joined on them (hash shuffle on narrow
  * keys), each surviving pair re-verified by the ORIGINAL exact
  * predicate, and a first-matching-band filter keeps pair multiplicity
  * identical to the cross join (no dropDuplicates). Pattern matching,
  * loop guard, conjunct scan, and the exactness tail are shared with the
  * cosine rule — [[ApproxJoinRewriteBase]].
  *
  * The rewrite is APPROXIMATE — pairs whose signatures collide in no
  * band are lost (recall 1-(1-j^r)^b at Jaccard j; banding is threshold-
  * dependent, see chooseBanding) — so it is disabled unless
  * `spark.graft.rewrite.approxJaccardJoin=true`. Precision is exact: the
  * original filter still runs on every candidate.
  */
case class ApproxJaccardJoinRewrite(spark: SparkSession) extends ApproxJoinRewriteBase {

  protected val enabledKey = "spark.graft.rewrite.approxJaccardJoin"
  protected val bucketPrefix = "__jbucket_"

  protected def matchSimilarity(e: Expression): Option[(Expression, Expression)] =
    e match {
      case JaccardSim(a, b) => Some((a, b))
      case _ => None
    }

  /** Pick (rows-per-band r, bands b) from the matched threshold. A
    * MinHash slot collides with probability j (the Jaccard itself — the
    * classic estimator identity), so a band of r slots collides with
    * j^r and recall over b bands is 1-(1-j^r)^b. As with the cosine
    * rule, SELECTIVITY is the primary axis (a materialized candidate
    * costs ~100x a streamed compare): prefer the widest band r whose
    * recall at j = t reaches 0.9 within the band budget, with the
    * fewest bands that get there (explode fan-out is b rows per input
    * row; signature work is k = r*b mixes per feature, bounded by
    * MinHashBuckets' MAX_K).
    */
  private[graft] def chooseBanding(t: Double): (Int, Int) = {
    val j = math.max(0.0, math.min(1.0, t))
    def recall(r: Int, b: Int): Double = 1.0 - math.pow(1.0 - math.pow(j, r), b)
    val maxBands = 12 // fan-out bound: explode emits b rows per input row
    Seq(16, 12, 8, 6, 4, 2, 1).flatMap { r =>
      (1 to maxBands).find(b => recall(r, b) >= 0.9).map(b => (r, b))
    }.headOption.getOrElse((1, maxBands)) // best already-searched recall, not below it
  }

  protected def rewrite(origOutput: Seq[Attribute], cond: Expression,
                        left: LogicalPlan, right: LogicalPlan,
                        lSh: Expression, rSh: Expression,
                        threshold: Double): LogicalPlan = {
    val (rowsPerBand, bands) = chooseBanding(threshold)
    val k = rowsPerBand * bands
    val toCol = GraftColumnBridge.toCol _

    def banded(side: LogicalPlan, shingles: Expression, arrName: String,
               bandName: String, bucketName: String) = {
      val bb = s"__bb$arrName"
      GraftColumnBridge.ofRows(spark, side)
        // a null shingle array can never satisfy jaccard_sim >= t (the
        // predicate null-propagates to false), so dropping it preserves
        // semantics
        .filter(toCol(shingles).isNotNull)
        .withColumn(arrName, toCol(MinHashBuckets(shingles, k, bands)))
        .withColumn(bb, explode(col(arrName)))
        .withColumn(bandName, col(s"$bb.band"))
        .withColumn(bucketName, col(s"$bb.bucket"))
        .drop(bb)
    }

    val lb = banded(left, lSh, "__jmh_l", "__jband_l", "__jbucket_l")
    val rb = banded(right, rSh, "__jmh_r", "__jband_r", "__jbucket_r")

    val keepFirst = firstMatchingBand(bands, col("__jband_l"), (side, band) =>
      element_at(col(if (side == 0) "__jmh_l" else "__jmh_r"), band + 1)
        .getField("bucket"))

    val joined = lb.join(rb,
        col("__jband_l") === col("__jband_r") && col("__jbucket_l") === col("__jbucket_r"))
      .filter(keepFirst)
      .drop("__jmh_l", "__jband_l", "__jbucket_l", "__jmh_r", "__jband_r", "__jbucket_r")

    verifyAndRestore(origOutput, cond, left, right, joined)
  }
}
