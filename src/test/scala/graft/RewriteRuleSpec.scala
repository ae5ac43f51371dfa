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

  // ---- the text twin: ApproxJaccardJoinRewrite ----

  private val jKey = "spark.graft.rewrite.approxJaccardJoin"

  // documents with planted near-duplicates: shared base sentences with
  // small word substitutions keep Jaccard(word 3-shingles) high
  private lazy val docs = {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 400).map(i => s"w$i")
    def sentence(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, sentence(40)))
    val planted = (0 until 6).map { i =>
      val words = base(i)._2.split(" ")
      words(rnd.nextInt(words.length)) = "sub" // one substitution: j ~ 0.85
      (100L + i, words.mkString(" "))
    }
    (base ++ planted).toDF("doc_id", "text")
  }

  private def jPairSql = {
    docs.createOrReplaceTempView("rj")
    spark.sql(
      """SELECT a.doc_id AS ia, b.doc_id AS ib
        |FROM rj a, rj b
        |WHERE a.doc_id < b.doc_id
        |  AND jaccard_sim(word_shingles(a.text, 3), word_shingles(b.text, 3))
        |      >= CAST(0.5 AS DOUBLE)""".stripMargin)
  }

  test("jaccard_sim: exact values, distinct semantics, null/empty conventions") {
    val r = spark.sql(
      """SELECT
        |  jaccard_sim(array('a','b','c'), array('b','c','d')) AS half,
        |  jaccard_sim(array('a','a','b'), array('a','b','b')) AS dup_distinct,
        |  jaccard_sim(array('a'), array('a')) AS same,
        |  jaccard_sim(array('a'), array('b')) AS disjoint,
        |  jaccard_sim(cast(array() AS array<string>), cast(array() AS array<string>)) AS both_empty,
        |  jaccard_sim(cast(NULL AS array<string>), array('a')) AS null_side
        |""".stripMargin).head()
    assert(r.getDouble(0) === 0.5)
    assert(r.getDouble(1) === 1.0, "duplicates must not change the distinct-set ratio")
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 0.0, "both-empty convention is 0.0")
    assert(r.isNullAt(5), "null array must null-propagate")
  }

  test("jaccard chooseBanding: selective bands at high thresholds, recall target kept") {
    val rule = graft.plans.ApproxJaccardJoinRewrite(spark)
    def recall(t: Double, r: Int, b: Int): Double =
      1.0 - math.pow(1.0 - math.pow(t, r), b)
    for (t <- Seq(0.3, 0.5, 0.8, 0.9, 0.95)) {
      val (r, b) = rule.chooseBanding(t)
      assert(r * b <= 1024, s"t=$t: k=r*b must stay within MinHashBuckets MAX_K")
      assert(b <= 12, s"t=$t: band fan-out bound")
      if (t >= 0.5)
        assert(recall(t, r, b) >= 0.9, f"t=$t%.2f (r=$r, b=$b): recall ${recall(t, r, b)}%.3f")
    }
    // high thresholds must earn wide (selective) bands
    assert(rule.chooseBanding(0.95)._1 >= 12, "0.95 should earn >=12-row bands")
    assert(rule.chooseBanding(0.9)._1 >= 8, "0.9 should earn >=8-row bands")
  }

  test("jaccard rewrite disabled by default: the plan stays an all-pairs join") {
    spark.conf.unset(jKey)
    val plan = jPairSql.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__jbucket_"), s"rewrite must be opt-in:\n$plan")
  }

  test("jaccard rewrite enabled: minhash-banded join replaces the cross product, exact-verified") {
    spark.conf.unset(jKey)
    val exact = jPairSql.as[(Long, Long)].collect().toSet
    assert(exact.size >= 5, s"fixture must contain planted pairs, got $exact")

    spark.conf.set(jKey, "true")
    try {
      val rewrittenDf = jPairSql
      val plan = rewrittenDf.queryExecution.optimizedPlan.toString
      assert(plan.contains("__jbucket_"), s"rewrite did not fire:\n$plan")

      val approx = rewrittenDf.as[(Long, Long)].collect()
      // multiplicity: first-matching-band filter emits each pair once
      assert(approx.length === approx.toSet.size, "duplicate pairs emitted")
      // precision is exact: every returned pair satisfies the original predicate
      assert(approx.toSet.subsetOf(exact))
      // planted pairs sit at j ~ 0.85-0.93, far above the 0.5 threshold's
      // permissive banding — recall target is comfortable
      val recall = approx.toSet.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.8, f"recall $recall%.2f too low (exact=${exact.size})")
    } finally spark.conf.unset(jKey)
  }

  // ---- Hamming-distance rewrite (exact recall by pigeonhole) ----

  private val hKey = "spark.graft.rewrite.hammingJoin"

  private lazy val sigs = {
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map(i => (i.toLong, rnd.nextLong()))
    // plant near pairs at distance exactly 1..3 (distinct bit positions)
    val planted = (0 until 8).map { i =>
      val flips = rnd.shuffle((0 until 64).toList).take(i % 3 + 1)
      (200L + i, flips.foldLeft(base(i)._2)((s, b) => s ^ (1L << b)))
    }
    (base ++ planted).toDF("id", "sig")
  }

  private def hPairSql(radius: Int) = {
    sigs.createOrReplaceTempView("rh")
    spark.sql(
      s"""SELECT a.id AS ia, b.id AS ib
         |FROM rh a, rh b
         |WHERE a.id < b.id AND bit_count(a.sig ^ b.sig) <= $radius""".stripMargin)
  }

  test("hamming rewrite disabled by default: the plan stays an all-pairs join") {
    spark.conf.unset(hKey)
    val plan = hPairSql(3).queryExecution.optimizedPlan.toString
    assert(!plan.contains("__hv1_"), s"rewrite must be opt-in:\n$plan")
  }

  test("hamming rewrite enabled: chunk-pair multi-index join, recall EXACT by pigeonhole") {
    spark.conf.unset(hKey)
    val exact = hPairSql(3).as[(Long, Long)].collect().toSet
    assert(exact.size >= 8, s"fixture must contain the planted pairs, got ${exact.size}")

    spark.conf.set(hKey, "true")
    try {
      val rewrittenDf = hPairSql(3)
      val plan = rewrittenDf.queryExecution.optimizedPlan.toString
      assert(plan.contains("__hv1_"), s"rewrite did not fire:\n$plan")

      val approx = rewrittenDf.as[(Long, Long)].collect()
      // multiplicity: first-matching-combo filter emits each pair once
      assert(approx.length === approx.toSet.size, "duplicate pairs emitted")
      // unlike the LSH rules this one is EXACT both ways: pigeonhole
      // guarantees every qualifying pair shares a chunk pair
      assert(approx.toSet === exact,
        s"chunk-pair index must be lossless: missing ${exact -- approx.toSet}")
    } finally spark.conf.unset(hKey)
  }

  test("hamming rewrite vetoes radii past the multi-index cap") {
    spark.conf.set(hKey, "true")
    try {
      val plan = hPairSql(20).queryExecution.optimizedPlan.toString
      assert(!plan.contains("__hv1_"),
        s"radius 20 must leave the plan untouched (fan-out 231):\n$plan")
    } finally spark.conf.unset(hKey)
  }
}
