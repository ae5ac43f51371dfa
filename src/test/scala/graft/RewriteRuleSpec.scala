package graft

import org.apache.spark.sql.functions._

/** The opt-in approximate cosine-join planner rule
  * ([[graft.plans.ApproxCosineJoinRewrite]], registered by
  * [[GraftExtensions]]): plan shape, precision, recall, multiplicity.
  */
class RewriteRuleSpec extends SparkSpec {
  import spark.implicits._

  private val key = "spark.graft.rewrite.approxCosineJoin"

  // corpus with planted near-duplicates (same construction as
  // NearDedupSpec's embeddingPairs test)
  private lazy val embs = {
    val rnd = new scala.util.Random(11)
    def unit(dim: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    val base = (0 until 30).map(i => (i.toLong, unit(64)))
    val planted = (0 until 6).map(i =>
      (100L + i, base(i)._2.map(x => x + 0.02f * rnd.nextGaussian().toFloat)))
    (base ++ planted).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  private def pairSql = {
    embs.createOrReplaceTempView("re")
    spark.sql(
      """SELECT a.vec_id AS ia, b.vec_id AS ib
        |FROM re a, re b
        |WHERE a.vec_id < b.vec_id
        |  AND cosine_sim(a.embedding, b.embedding) >= CAST(0.95 AS DOUBLE)""".stripMargin)
  }

  test("chooseBanding: wide selective bands at high thresholds, recall target kept") {
    val rule = graft.plans.ApproxCosineJoinRewrite(spark)
    def recall(t: Double, r: Int, b: Int): Double = {
      val p = 1.0 - math.acos(t) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, r), b)
    }
    for (t <- Seq(0.5, 0.8, 0.9, 0.95, 0.99)) {
      val (r, b) = rule.chooseBanding(t)
      assert(r * b <= 63, s"t=$t: signature must pack in one long, got ${r * b} bits")
      if (t >= 0.9)
        assert(recall(t, r, b) >= 0.9, f"t=$t%.2f (r=$r, b=$b): recall ${recall(t, r, b)}%.3f")
    }
    // a materialized candidate costs ~100x a streamed comparison, so
    // near-exact thresholds must earn wide bands (collision ~b*2^-r)
    assert(rule.chooseBanding(0.99)._1 >= 12, "0.99 should earn >=12-bit bands")
    assert(rule.chooseBanding(0.95)._1 >= 8, "0.95 should earn >=8-bit bands")
  }

  test("disabled by default: the plan stays an all-pairs join") {
    spark.conf.unset(key)
    val plan = pairSql.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__bucket_"), s"rewrite must be opt-in:\n$plan")
  }

  test("enabled: banded candidate join replaces the cross product, results exact-verified") {
    spark.conf.unset(key)
    val exact = pairSql.as[(Long, Long)].collect().toSet
    assert(exact.size >= 5, s"fixture must contain planted pairs, got $exact")

    spark.conf.set(key, "true")
    try {
      val rewrittenDf = pairSql
      val plan = rewrittenDf.queryExecution.optimizedPlan.toString
      assert(plan.contains("__bucket_"), s"rewrite did not fire:\n$plan")

      val approx = rewrittenDf.as[(Long, Long)].collect()
      // multiplicity: first-matching-band filter emits each pair once
      assert(approx.length === approx.toSet.size, "duplicate pairs emitted")
      // precision is exact: every returned pair is in the exact result
      assert(approx.toSet.subsetOf(exact))
      // recall at cosine>=0.95 with 4x4 banding ≈ 98.5%
      val recall = approx.toSet.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.8, f"recall $recall%.2f too low (exact=${exact.size})")
    } finally spark.conf.unset(key)
  }
}
