package graft

import graft.functions.TextFunctions
import graft.search.Lexical
import org.apache.spark.sql.functions._

/** Lexical retrieval (BM25 / vocabulary) and PII redaction semantics. */
class SearchSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("id", "txt")
  }

  test("bm25TopK: idf favors rare terms, dl normalization favors short docs") {
    val corpus = docs(
      1L -> "apple banana banana",
      2L -> "apple cherry",
      3L -> "cherry cherry cherry cherry",
      4L -> "cherry date")
    val res = Lexical.bm25TopK(corpus, "id", "txt",
        Seq(0 -> "banana", 1 -> "apple", 2 -> "banana cherry"), k = 5,
        reuseIndex = false)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

    val q0 = res.filter(_._1 == 0)
    assert(q0.map(_._3).toSeq == Seq(1L), "banana matches only doc 1")

    // apple appears once in both doc1 (dl 3) and doc2 (dl 2): the shorter
    // doc must rank first purely from length normalization.
    val q1 = res.filter(_._1 == 1)
    assert(q1.map(_._3).toSeq == Seq(2L, 1L))
    assert(q1(0)._4 > q1(1)._4)

    // banana (df 1) must out-idf cherry (df 3): doc1 (banana only, tf 2)
    // beats doc3 (cherry only, tf 4) for the combined query.
    val q2 = res.filter(_._1 == 2)
    assert(q2.head._3 == 1L, s"rare-term doc should rank first: ${q2.toSeq}")
    assert(q2.map(_._3).length == 4, "every doc matching any term is scored")
  }

  test("bm25TopK matches a hand-computed score") {
    val corpus = docs(1L -> "apple banana banana", 2L -> "apple cherry")
    val res = Lexical.bm25TopK(corpus, "id", "txt", Seq(7 -> "banana banana apple"),
        k = 5, reuseIndex = false)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap

    val (k1, b) = (1.2, 0.75)
    val (n, avgdl) = (2L, (3 + 2).toDouble / 2)
    def idf(df: Long) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def tfn(tf: Long, dl: Long) =
      (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * dl / avgdl))
    def contrib(w: Long, df: Long, tf: Long, dl: Long): BigDecimal =
      BigDecimal(w * idf(df) * tfn(tf, dl)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def score(c: Seq[BigDecimal]) =
      (c.sum / 1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    // doc1: banana tf=2 (w=2), apple tf=1 (w=1); doc2: apple tf=1 only.
    assert(res(1L) == score(Seq(contrib(2, 1, 2, 3), contrib(1, 2, 1, 3))))
    assert(res(2L) == score(Seq(contrib(1, 2, 1, 2))))
  }

  test("bm25TopK plans a per-group rank limit (WindowGroupLimit)") {
    val corpus = docs(1L -> "apple banana", 2L -> "banana cherry")
    val df = Lexical.bm25TopK(corpus, "id", "txt", Seq(0 -> "banana"), k = 1,
      reuseIndex = false)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rank <= k must push into the window as a per-partition top-k")
    Lexical.releaseIndexes()
  }

  test("vocabStats: cf counts occurrences, df counts documents, order is total") {
    val corpus = docs(1L -> "a a b", 2L -> "a c", 3L -> "b a")
    val rows = Lexical.vocabStats(corpus, "id", "txt", limit = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("a", 4L, 3L), ("b", 2L, 2L)))
  }

  test("pii: counts and redaction for urls, emails, ipv4") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "mail me at jo.doe+x@corp.example.org or see https://ex.org/a?b=1 now",
      "server 192.168.0.1 and 10.0.0.7 up",
      "no pii here").toDF("txt")
    val out = df.select(
        TextFunctions.piiCounts(col("txt")).as("c"),
        TextFunctions.piiRedact(col("txt")).as("r"))
      .select(col("c.n_urls"), col("c.n_emails"), col("c.n_ips"), col("r"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out(0) == ((1, 1, 0, "mail me at <EMAIL> or see <URL> now")))
    assert(out(1) == ((0, 0, 2, "server <IP> and <IP> up")))
    assert(out(2) == ((0, 0, 0, "no pii here")))
  }

  test("oovRate: vocab by (cf desc, term asc), occurrence permille, token-free docs absent") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "a a b"),
      (2L, "b c"),
      (3L, "   "))  // zero tokens -> absent
      .toDF("id", "txt")
    // counts: a=2, b=2, c=1. vocabSize 1: a and b tie on cf, 'a' wins the
    // lexical tie -> vocab {a}
    val v1 = Lexical.oovRate(corpus, "id", "txt", vocabSize = 1)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(v1.toSeq === Seq((1L, 3L, 333L), (2L, 2L, 1000L)))
    // vocabSize 2 -> {a, b}: doc1 fully covered, doc2 half ('c' is OOV)
    val v2 = Lexical.oovRate(corpus, "id", "txt", vocabSize = 2)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(v2.toSeq === Seq((1L, 3L, 0L), (2L, 2L, 500L)))
  }

  test("termCounts state: merged increments equal one-pass; yesterday's vocab scores today's batch") {
    val s = spark
    import s.implicits._
    val yesterday = Seq((1L, "a a b"), (2L, "b c a")).toDF("id", "txt")
    val today = Seq((10L, "a d d"), (11L, "c c")).toDF("id", "txt")
    // merge(increment counts) == counts over the union, term for term
    val merged = Lexical.mergeTermCounts(Seq(
        Lexical.termCounts(yesterday, "id", "txt"),
        Lexical.termCounts(today, "id", "txt")))
      .orderBy("term").as[(String, Long)].collect()
    val onePass = Lexical.termCounts(yesterday.unionByName(today), "id", "txt")
      .orderBy("term").as[(String, Long)].collect()
    assert(merged.toSeq === onePass.toSeq)
    assert(merged.toMap === Map("a" -> 4L, "b" -> 2L, "c" -> 3L, "d" -> 2L))
    // the serving form: vocab FIXED from yesterday's counts ({a, b}),
    // today's docs scored against it — 'd' and 'c' are OOV today
    val vocab = Lexical.vocabFromCounts(
      Lexical.termCounts(yesterday, "id", "txt"), 2)
    assert(vocab.as[String].collect().toSet === Set("a", "b"))
    val scored = Lexical.oovRateAgainst(today, "id", "txt", vocab)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(scored.toSeq === Seq((10L, 3L, 666L), (11L, 2L, 1000L)))
  }

  test("Mmr.diversify: redundancy penalty reorders the pure-relevance ranking") {
    val s = spark
    import s.implicits._
    // query 0 along e1; candidates: 1 and 2 near-identical high-rel
    // (cos≈1 to query AND to each other), 3 orthogonal-ish lower-rel.
    // Pure top-3: 1, 2, 3. MMR λ=0.5: picks 1, then 3 (2's penalty
    // ≈1e6 kills it), then 2.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),
      (2L, Array(0.995f, 0.09f, 0.0f)),
      (3L, Array(0.5f, 0.0f, 0.86f))
    ).toDF("vec_id", "embedding")
    val neighbors = graft.similarity.Knn.bruteForceTopK(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", 3)
    // sanity: pure relevance ranks 2, 1, 3 (cos 0.9959, 0.9949, 0.5025)
    assert(neighbors.orderBy("rank").select("neighbor_id")
      .as[Long].collect().toSeq === Seq(2L, 1L, 3L))
    val got = graft.search.Mmr.diversify(neighbors, vecs, "vec_id", "embedding",
        m = 3, lambdaPpm = 500000L)
      .orderBy("step")
      .as[(Long, Long, Long, Long, Option[Long], Long)].collect()
    assert(got.map(_._3).toSeq === Seq(2L, 3L, 1L),
      s"MMR order must be 2 (best rel), 3 (diverse), 1 (redundant): ${got.toSeq}")
    // step 1 carries no penalty; step 3's penalty is 1's huge sim to 2
    assert(got(0)._5.isEmpty)
    assert(got(2)._5.exists(_ > 990000L), s"redundant pick penalty: ${got(2)._5}")
    // scores are the exact integer combination λ·rel − (1−λ)·penalty
    got.filter(_._5.nonEmpty).foreach { r =>
      assert(r._6 === 500000L * r._4 - 500000L * r._5.get)
    }
  }

  test("Mmr.diversify: m=1 equals the pure-relevance top pick, ties to min id") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (5L, Array(0.8f, 0.6f)),
      (7L, Array(0.8f, 0.6f))
    ).toDF("vec_id", "embedding")
    val neighbors = graft.similarity.Knn.bruteForceTopK(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", 2)
    val got = graft.search.Mmr.diversify(neighbors, vecs, "vec_id", "embedding",
        m = 1, lambdaPpm = 700000L)
      .as[(Long, Long, Long, Long, Option[Long], Long)].collect()
    assert(got.length === 1)
    assert(got.head._3 === 5L, "equal-cos tie must break to the smaller id")
  }
}
