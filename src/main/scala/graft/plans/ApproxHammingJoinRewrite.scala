package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types.LongType

/** Opt-in planner rule — the fingerprint member of the similarity-join
  * rewrite family ([[ApproxCosineJoinRewrite]] /
  * [[ApproxJaccardJoinRewrite]]): rewrites an all-pairs Hamming-distance
  * join over 64-bit fingerprints
  *
  * {{{ SELECT ... FROM a JOIN b
  *     WHERE bit_count(xor(a.sig, b.sig)) <= k   -- hamming64(a.sig, b.sig) }}}
  *
  * (a cross join — O(|a|x|b|) popcounts) into the chunk-pair multi-index
  * candidate join the simhash dedup operator uses
  * (`NearDedup.simhashPairsFromSigs` — generalized pigeonhole): split
  * each signature into `c = k + 2` chunks; a pair within Hamming k has
  * at most k differing bits, hence at least TWO error-free chunks, so it
  * agrees exactly on some chunk PAIR — the C(c,2) (combo, v1, v2)
  * triples are the join keys. Unlike the two LSH rules this rewrite's
  * recall is EXACT, not probabilistic: every qualifying pair shares a
  * key by pigeonhole, the original predicate re-verifies each candidate
  * (precision exact as always), and the first-matching-combo filter
  * keeps pair multiplicity identical to the cross join. It is still
  * opt-in (`spark.graft.rewrite.hammingJoin=true`) because the explode
  * fan-out — C(c,2) rows per input row, 28 at k=6 — is a plan-shape
  * change a user should choose; radii past 14 (fan-out 120) are vetoed
  * and the plan left untouched, matching the operator's cap.
  *
  * Only LongType fingerprint expressions match — the chunk masks assume
  * 64 bits end to end.
  */
case class ApproxHammingJoinRewrite(spark: SparkSession) extends ApproxJoinRewriteBase {

  protected val enabledKey = "spark.graft.rewrite.hammingJoin"
  protected val bucketPrefix = "__hchunks_"
  override protected def isDistance: Boolean = true
  override protected def thresholdEligible(t: Double): Boolean =
    t >= 0.0 && t <= graft.functions.HashFunctions.MaxHammingIndexRadius.toDouble

  protected def matchSimilarity(e: Expression): Option[(Expression, Expression)] =
    e match {
      case BitwiseCount(BitwiseXor(a, b))
          if a.dataType == LongType && b.dataType == LongType =>
        Some((a, b))
      case _ => None
    }

  protected def rewrite(origOutput: Seq[Attribute], cond: Expression,
                        left: LogicalPlan, right: LogicalPlan,
                        lSig: Expression, rSig: Expression,
                        threshold: Double): LogicalPlan = {
    // floor(t): `dist <= 3.5` admits the same integer distances as
    // `dist <= 3`; a strict `dist < t` needs at most this radius, so the
    // candidate set stays a superset either way and recall stays exact
    val maxHamming = math.floor(threshold).toInt
    val nChunks = maxHamming + 2
    // chunk scheme shared with NearDedup.simhashPairsFromSigs — one
    // definition (HashFunctions) so rule and operator cannot drift
    val comboPairs = graft.functions.HashFunctions.hammingComboPairs(nChunks)
    val toCol = GraftColumnBridge.toCol _

    def chunksOf(sig: Column): Column =
      array(graft.functions.HashFunctions.hammingChunkVals(sig, maxHamming): _*)

    def tagged(side: LogicalPlan, sig: Expression, chunksName: String,
               bandName: String, v1Name: String, v2Name: String) = {
      val cb = s"__cb$chunksName"
      GraftColumnBridge.ofRows(spark, side)
        // a null fingerprint can never satisfy bit_count(xor(..)) <= k
        // (the predicate null-propagates to false), so dropping it
        // preserves semantics
        .filter(toCol(sig).isNotNull)
        .withColumn(chunksName, chunksOf(toCol(sig)))
        .withColumn(cb, explode(array(comboPairs.zipWithIndex.map { case ((i, j), m) =>
          struct(lit(m).as("band"),
            element_at(col(chunksName), i + 1).as("v1"),
            element_at(col(chunksName), j + 1).as("v2"))
        }: _*)))
        .withColumn(bandName, col(s"$cb.band"))
        .withColumn(v1Name, col(s"$cb.v1"))
        .withColumn(v2Name, col(s"$cb.v2"))
        .drop(cb)
    }

    val lb = tagged(left, lSig, "__hchunks_l", "__hband_l", "__hv1_l", "__hv2_l")
    val rb = tagged(right, rSig, "__hchunks_r", "__hband_r", "__hv1_r", "__hv2_r")

    val keepFirst = firstMatchingBand(comboPairs.length, col("__hband_l"), (side, m) => {
      val chunks = col(if (side == 0) "__hchunks_l" else "__hchunks_r")
      val (i, j) = comboPairs(m)
      struct(element_at(chunks, i + 1), element_at(chunks, j + 1))
    })

    val joined = lb.join(rb,
        col("__hband_l") === col("__hband_r") &&
          col("__hv1_l") === col("__hv1_r") && col("__hv2_l") === col("__hv2_r"))
      .filter(keepFirst)
      .drop("__hchunks_l", "__hband_l", "__hv1_l", "__hv2_l",
        "__hchunks_r", "__hband_r", "__hv1_r", "__hv2_r")

    verifyAndRestore(origOutput, cond, left, right, joined)
  }
}
