package graft.plans

import graft.functions.VectorFunctions
import graft.functions.expr.CosineSim
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, lit, shiftrightunsigned}
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types.Decimal

/** Opt-in planner rule: rewrites an all-pairs cosine-similarity join
  *
  * {{{ SELECT ... FROM a JOIN b WHERE cosine_sim(a.vec, b.vec) >= t }}}
  *
  * (a cross join — O(|a|x|b|) pairs) into a banded random-hyperplane LSH
  * candidate join: both sides are tagged with (band, bucket) keys, joined
  * on them (hash shuffle on narrow keys), each surviving pair is verified
  * by the ORIGINAL exact predicate, and a first-matching-band filter keeps
  * pair multiplicity identical to the cross join (no dropDuplicates).
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
case class ApproxCosineJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val enabledKey = "spark.graft.rewrite.approxCosineJoin"
  private val dimKey = "spark.graft.rewrite.approxCosineJoin.dim"

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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.getOption(enabledKey).contains("true")) return plan
    val dim = spark.conf.getOption(dimKey).map(_.toInt).getOrElse(64)
    plan.transform {
      // the filter may still sit above the join, or predicate pushdown may
      // already have folded it into the join condition — handle both
      case f @ Filter(cond, Join(left, right, Inner | Cross, None, _))
          if eligible(left, right) =>
        findCosinePair(cond, left, right) match {
          case Some((lVec, rVec, t)) =>
            rewrite(f.output, cond, left, right, lVec, rVec, dim, t)
          case None => f
        }
      case j @ Join(left, right, Inner | Cross, Some(cond), _)
          if eligible(left, right) =>
        findCosinePair(cond, left, right) match {
          case Some((lVec, rVec, t)) =>
            rewrite(j.output, cond, left, right, lVec, rVec, dim, t)
          case None => j
        }
    }
  }

  /** Loop guard: never rewrite a join whose inputs carry our generated
    * bucket columns — that IS the rewritten plan (pushdown re-folds the
    * exact-verification predicate into it on later fixed-point passes).
    */
  private def eligible(left: LogicalPlan, right: LogicalPlan): Boolean =
    !(left.output ++ right.output).exists(_.name.startsWith("__bucket_"))

  /** Find `cosine_sim(a, b) >= lit` (any of the four comparison spellings,
    * either argument order) among the filter's conjuncts, with `a` from
    * the left side and `b` from the right — scanning ALL candidates, not
    * just the first (a same-side cosine conjunct must not shadow a
    * splittable one).
    */
  private def findCosinePair(cond: Expression, left: LogicalPlan,
                             right: LogicalPlan): Option[(Expression, Expression, Double)] = {
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
        Some((a, b))
      else if (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
        Some((b, a))
      else None
    def thresh(l: Literal): Option[Double] = l.value match {
      case d: java.lang.Double => Some(d.doubleValue)
      case f: java.lang.Float => Some(f.doubleValue)
      case d: Decimal => Some(d.toDouble)
      case _ => None
    }
    splitConjunctivePredicates(cond).flatMap {
      case GreaterThanOrEqual(CosineSim(a, b), l: Literal) => thresh(l).map((a, b, _))
      case GreaterThan(CosineSim(a, b), l: Literal) => thresh(l).map((a, b, _))
      case LessThanOrEqual(l: Literal, CosineSim(a, b)) => thresh(l).map((a, b, _))
      case LessThan(l: Literal, CosineSim(a, b)) => thresh(l).map((a, b, _))
      case _ => None
    }.flatMap { case (a, b, t) => sides(a, b).map { case (x, y) => (x, y, t) } }
      .headOption
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }

  private def rewrite(origOutput: Seq[Attribute], cond: Expression,
                      left: LogicalPlan, right: LogicalPlan,
                      lVec: Expression, rVec: Expression, dim: Int,
                      threshold: Double): LogicalPlan = {
    val (bitsPerBand, bands) = chooseBanding(threshold)
    val bits = bitsPerBand
    val nBits = bits * bands
    import org.apache.spark.sql.functions.{array, explode, struct}
    val toCol = GraftColumnBridge.toCol _

    def bucketOf(sig: org.apache.spark.sql.Column, band: Int) =
      VectorFunctions.bandBucket(sig, band, bits)

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

    // join on (band, bucket); keep only the FIRST band in which the two
    // signatures agree, so each qualifying pair appears exactly once —
    // same multiplicity as the cross join, without a dropDuplicates pass
    val earlierBandsDiffer = (0 until bands).map { m =>
      val priorDiffer = (0 until m)
        .map(p => bucketOf(col("__sig_l"), p) =!= bucketOf(col("__sig_r"), p))
        .foldLeft(lit(true))(_ && _)
      (col("__band_l") === m) && priorDiffer
    }.reduce(_ || _)

    val joined = lb.join(rb,
        col("__band_l") === col("__band_r") && col("__bucket_l") === col("__bucket_r"))
      .filter(earlierBandsDiffer)
      .drop("__sig_l", "__band_l", "__bucket_l", "__sig_r", "__band_r", "__bucket_r")

    val candidate = joined.queryExecution.analyzed
    require(candidate.output.length == origOutput.length,
      s"rewrite output arity mismatch: ${candidate.output} vs $origOutput")
    // analysis may have re-aliased a self-joined right side, so remap the
    // original predicate onto the candidate's (positionally equal) output
    val mapping = AttributeMap((left.output ++ right.output).zip(candidate.output))
    val remappedCond = cond.transform { case a: Attribute => mapping.getOrElse(a, a) }
    val verified = Filter(remappedCond, candidate) // exact re-verification
    val restored = origOutput.zip(candidate.output).map { case (o, n) =>
      Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }
    Project(restored, verified)
  }
}
