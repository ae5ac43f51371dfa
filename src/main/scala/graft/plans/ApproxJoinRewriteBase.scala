package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.Decimal

/** Shared scaffolding for the opt-in approximate-similarity join
  * rewrites ([[ApproxCosineJoinRewrite]], [[ApproxJaccardJoinRewrite]]):
  * one implementation of the plan-pattern match (filter-above-join AND
  * condition-folded-into-join), the fixed-point loop guard, the
  * conjunct scan for `sim(a, b) >= lit` in its four comparison
  * spellings with left/right side assignment, the first-matching-band
  * multiplicity filter, and the candidate → exact-re-verify → output-
  * restore tail. Concrete rules supply the similarity-expression
  * matcher, the banding, and the per-side (band, bucket) tagging —
  * everything physical about HOW candidates are generated; everything
  * about WHEN a rewrite fires and how its answer is kept exact lives
  * here, once.
  */
trait ApproxJoinRewriteBase extends Rule[LogicalPlan] {

  def spark: SparkSession

  /** Conf key gating the rule (opt-in; approximate recall). */
  protected def enabledKey: String

  /** Prefix of the generated bucket columns — the fixed-point loop
    * guard: a join whose inputs already carry them IS the rewritten
    * plan (pushdown re-folds the verification predicate into it on
    * later optimizer passes).
    */
  protected def bucketPrefix: String

  /** Match this rule's similarity expression, returning its two vector/
    * set arguments. */
  protected def matchSimilarity(e: Expression): Option[(Expression, Expression)]

  /** `false` (default): the matched expression is a SIMILARITY and the
    * conjunct must say `sim >= lit` / `sim > lit`. `true`: it is a
    * DISTANCE and the conjunct must say `dist <= lit` / `dist < lit`
    * (either spelling order) — e.g. a Hamming-distance join.
    */
  protected def isDistance: Boolean = false

  /** Veto thresholds this rule cannot band usefully (e.g. a Hamming
    * radius past the multi-index cap) — the plan is left untouched.
    */
  protected def thresholdEligible(t: Double): Boolean = true

  /** Build the banded candidate join for a matched pair. */
  protected def rewrite(origOutput: Seq[Attribute], cond: Expression,
                        left: LogicalPlan, right: LogicalPlan,
                        lExpr: Expression, rExpr: Expression,
                        threshold: Double): LogicalPlan

  final override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.getOption(enabledKey).contains("true")) return plan
    plan.transform {
      // the filter may still sit above the join, or predicate pushdown may
      // already have folded it into the join condition — handle both
      case f @ Filter(cond, Join(left, right, Inner | Cross, None, _))
          if eligible(left, right) =>
        findPair(cond, left, right) match {
          case Some((l, r, t)) => rewrite(f.output, cond, left, right, l, r, t)
          case None => f
        }
      case j @ Join(left, right, Inner | Cross, Some(cond), _)
          if eligible(left, right) =>
        findPair(cond, left, right) match {
          case Some((l, r, t)) => rewrite(j.output, cond, left, right, l, r, t)
          case None => j
        }
    }
  }

  private def eligible(left: LogicalPlan, right: LogicalPlan): Boolean =
    !(left.output ++ right.output).exists(_.name.startsWith(bucketPrefix))

  /** Find `sim(a, b) >= lit` (any of the four comparison spellings,
    * either argument order) among the condition's conjuncts, with `a`
    * resolvable from the left side and `b` from the right — scanning ALL
    * candidates, not just the first (a same-side conjunct must not
    * shadow a splittable one).
    */
  private def findPair(cond: Expression, left: LogicalPlan,
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
      case i: java.lang.Integer => Some(i.doubleValue)
      case i: java.lang.Long => Some(i.doubleValue)
      case i: java.lang.Short => Some(i.doubleValue)
      case i: java.lang.Byte => Some(i.doubleValue)
      case _ => None
    }
    def simOf(e: Expression, l: Literal): Option[(Expression, Expression, Double)] =
      matchSimilarity(e).flatMap { case (a, b) =>
        thresh(l).filter(thresholdEligible).map((a, b, _))
      }
    val conjuncts = splitConjuncts(cond)
    val matched =
      if (isDistance) conjuncts.flatMap {
        case LessThanOrEqual(e, l: Literal) => simOf(e, l)
        case LessThan(e, l: Literal) => simOf(e, l)
        case GreaterThanOrEqual(l: Literal, e) => simOf(e, l)
        case GreaterThan(l: Literal, e) => simOf(e, l)
        case _ => None
      }
      else conjuncts.flatMap {
        case GreaterThanOrEqual(e, l: Literal) => simOf(e, l)
        case GreaterThan(e, l: Literal) => simOf(e, l)
        case LessThanOrEqual(l: Literal, e) => simOf(e, l)
        case LessThan(l: Literal, e) => simOf(e, l)
        case _ => None
      }
    matched.flatMap { case (a, b, t) => sides(a, b).map { case (x, y) => (x, y, t) } }
      .headOption
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** First-matching-band predicate: keep a candidate row only in the
    * FIRST band where the two sides' buckets agree, so each qualifying
    * pair appears exactly once — cross-join multiplicity without a
    * dropDuplicates pass. `bucketAt(side, band)` reads side `0` (left)
    * or `1` (right)'s bucket for a band.
    */
  protected final def firstMatchingBand(bands: Int, bandLCol: Column,
                                        bucketAt: (Int, Int) => Column): Column =
    (0 until bands).map { m =>
      val priorDiffer = (0 until m)
        .map(p => bucketAt(0, p) =!= bucketAt(1, p))
        .foldLeft(lit(true))(_ && _)
      (bandLCol === m) && priorDiffer
    }.reduce(_ || _)

  /** The exactness tail every rewrite shares: analyze the candidate
    * frame, re-verify every candidate with the ORIGINAL predicate
    * (remapped onto the analyzed output — analysis may re-alias a
    * self-joined right side), and restore the original output
    * attributes positionally.
    */
  protected final def verifyAndRestore(origOutput: Seq[Attribute], cond: Expression,
                                       left: LogicalPlan, right: LogicalPlan,
                                       joined: DataFrame): LogicalPlan = {
    val candidate = joined.queryExecution.analyzed
    require(candidate.output.length == origOutput.length,
      s"rewrite output arity mismatch: ${candidate.output} vs $origOutput")
    val mapping = AttributeMap((left.output ++ right.output).zip(candidate.output))
    val remappedCond = cond.transform { case a: Attribute => mapping.getOrElse(a, a) }
    val verified = Filter(remappedCond, candidate) // exact re-verification
    val restored = origOutput.zip(candidate.output).map { case (o, n) =>
      Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }
    Project(restored, verified)
  }
}
