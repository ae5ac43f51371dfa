package graft.plans

import graft.functions.expr.{JaccardSim, MinHashBuckets}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, element_at, explode, lit}
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types.Decimal

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
  * identical to the cross join (no dropDuplicates).
  *
  * The rewrite is APPROXIMATE — pairs whose signatures collide in no
  * band are lost (recall 1-(1-j^r)^b at Jaccard j; banding is threshold-
  * dependent, see chooseBanding) — so it is disabled unless
  * `spark.graft.rewrite.approxJaccardJoin=true`. Precision is exact: the
  * original filter still runs on every candidate.
  */
case class ApproxJaccardJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val enabledKey = "spark.graft.rewrite.approxJaccardJoin"

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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.getOption(enabledKey).contains("true")) return plan
    plan.transform {
      case f @ Filter(cond, Join(left, right, Inner | Cross, None, _))
          if eligible(left, right) =>
        findJaccardPair(cond, left, right) match {
          case Some((lSh, rSh, t)) =>
            rewrite(f.output, cond, left, right, lSh, rSh, t)
          case None => f
        }
      case j @ Join(left, right, Inner | Cross, Some(cond), _)
          if eligible(left, right) =>
        findJaccardPair(cond, left, right) match {
          case Some((lSh, rSh, t)) =>
            rewrite(j.output, cond, left, right, lSh, rSh, t)
          case None => j
        }
    }
  }

  /** Loop guard: never rewrite a join whose inputs carry our generated
    * bucket columns — that IS the rewritten plan.
    */
  private def eligible(left: LogicalPlan, right: LogicalPlan): Boolean =
    !(left.output ++ right.output).exists(_.name.startsWith("__jbucket_"))

  /** Find `jaccard_sim(a, b) >= lit` (any of the four comparison
    * spellings, either argument order) among the filter's conjuncts,
    * with `a` from the left side and `b` from the right — scanning ALL
    * candidates, not just the first.
    */
  private def findJaccardPair(cond: Expression, left: LogicalPlan,
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
      case GreaterThanOrEqual(JaccardSim(a, b), l: Literal) => thresh(l).map((a, b, _))
      case GreaterThan(JaccardSim(a, b), l: Literal) => thresh(l).map((a, b, _))
      case LessThanOrEqual(l: Literal, JaccardSim(a, b)) => thresh(l).map((a, b, _))
      case LessThan(l: Literal, JaccardSim(a, b)) => thresh(l).map((a, b, _))
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

    // join on (band, bucket); keep only the FIRST band in which the two
    // signatures agree, so each qualifying pair appears exactly once —
    // same multiplicity as the cross join, without a dropDuplicates pass
    def bucketAt(arr: String, band: Int) =
      element_at(col(arr), band + 1).getField("bucket")
    val earlierBandsDiffer = (0 until bands).map { m =>
      val priorDiffer = (0 until m)
        .map(p => bucketAt("__jmh_l", p) =!= bucketAt("__jmh_r", p))
        .foldLeft(lit(true))(_ && _)
      (col("__jband_l") === m) && priorDiffer
    }.reduce(_ || _)

    val joined = lb.join(rb,
        col("__jband_l") === col("__jband_r") && col("__jbucket_l") === col("__jbucket_r"))
      .filter(earlierBandsDiffer)
      .drop("__jmh_l", "__jband_l", "__jbucket_l", "__jmh_r", "__jband_r", "__jbucket_r")

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
