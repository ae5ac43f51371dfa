package graft

import graft.dedup.NearDedup
import graft.similarity.Knn
import org.apache.spark.sql.functions._

/** Dedup + similarity operators on planted near-duplicates — the fixtures'
  * documents table has real dups too, but planting controls ground truth.
  */
class NearDedupSpec extends SparkSpec {
  import spark.implicits._

  private val lorem = (0 until 60).map(i => s"word$i").mkString(" ")
  private val loremNear = (0 until 60).map(i => if (i == 7) "CHANGED" else s"word$i").mkString(" ")
  private val other = (0 until 60).map(i => s"tok$i").mkString(" ")

  private lazy val docs = Seq(
    (1L, "en", lorem),
    (2L, "en", loremNear),       // near-dup of 1
    (3L, "en", other),           // unrelated
    (4L, "en", lorem),           // exact dup of 1
    (5L, "en", "short text"))    // too short for 3-shingles
    .toDF("doc_id", "lang", "text")

  test("exactByContent: normalized-hash dedup keeps min id and counts copies") {
    val out = NearDedup.exactByContent(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(out === Seq((1L, 2L), (2L, 1L), (3L, 1L), (5L, 1L)))
  }

  test("minhashPairs: finds planted near-dups, skips unrelated") {
    val pairs = NearDedup.minhashPairs(docs, "doc_id", "text",
        shingleLen = 3, k = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)))
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhashPairs jaccard values are exact (verified, not estimated)") {
    val j = NearDedup.minhashPairs(docs, "doc_id", "text", 3, 64, 16, 0.5)
      .filter($"id_a" === 1L && $"id_b" === 4L)
      .select("jaccard").as[Double].head()
    assert(j === 1.0) // exact dup pair
  }

  test("minhashPairsChar finds CJK near-dups that word shingles miss") {
    // unsegmented text: each doc is ONE whitespace token, so word
    // 3-shingles are empty and the word-based variant finds nothing
    val zhA = "今天天气很好我们一起去公园散步然后喝茶聊天看书写字画画唱歌跳舞"
    val zhB = zhA.replace("喝茶", "喝酒") // near-dup: 2 chars changed
    val zhC = "完全不同的另一段话讲的是工作学习编程数据引擎测试系统设计架构"
    val docs = Seq((1L, zhA), (2L, zhB), (3L, zhC), (4L, zhA)).toDF("doc_id", "text")
    val word = NearDedup.minhashPairs(docs, "doc_id", "text", 3, 64, 16, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(word.isEmpty, s"word shingles can't pair unsegmented text, got $word")
    val char = NearDedup.minhashPairsChar(docs, "doc_id", "text", 4, 64, 16, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(char.contains((1L, 2L)))
    assert(char.contains((1L, 4L)))
    assert(!char.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhashPairs: near-dups within hamming bound") {
    val pairs = NearDedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // identical -> hamming 0
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhashPairs: exhaustive — exactly the pairs with hamming <= maxHamming") {
    // A corpus dense enough that true pairs land at MANY distinct Hamming
    // distances, including 4-6 (the range the old fixed 4x16 chunking could
    // silently drop when the differing bits spread across all four chunks).
    import graft.functions.expr.SimHash64
    import graft.functions.TextFunctions
    val corpus = (0 until 40).map { i =>
      // perturb a base doc one token at a time -> smooth hamming spectrum
      val toks = (0 until 30).map(t => if (t < i % 7) s"alt${t}_$i" else s"base$t")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    for (maxH <- Seq(3, 6)) {
      val sigs = corpus.select($"doc_id",
          SimHash64.simhash64(TextFunctions.tokens($"text")).as("sig"))
        .as[(Long, Long)].collect()
      val expected = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        if java.lang.Long.bitCount(sa ^ sb) <= maxH
      } yield (ia, ib)).toSet
      val got = NearDedup.simhashPairs(corpus, "doc_id", "text", maxHamming = maxH)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got === expected, s"maxHamming=$maxH: recall/precision gap")
      assert(expected.nonEmpty, s"maxHamming=$maxH: vacuous fixture")
    }
  }

  test("ngramJaccardPairs agrees with a brute-force computation") {
    def shingleSet(t: String): Set[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).sliding(3)
        .map(_.mkString(" ")).toSet
    val rows = docs.select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    val expected = (for {
      a <- rows; b <- rows if a._1 < b._1 && a._2 == b._2
      sa = shingleSet(a._3); sb = shingleSet(b._3)
      if sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.3
    } yield (a._1, b._1)).toSet
    val got = NearDedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", 3, 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("embeddingPairs: banded LSH recalls planted near-dup vectors") {
    val rnd = new scala.util.Random(7)
    def unit(dim: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    def jitter(v: Array[Float], eps: Float): Array[Float] =
      v.map(x => x + eps * rnd.nextGaussian().toFloat)
    val base = (0 until 20).map(i => (i.toLong, unit(64)))
    // plant: 100+i is a near-dup of i for i < 5
    val planted = (0 until 5).map(i => (100L + i, jitter(base(i)._2, 0.02f)))
    val embs = (base ++ planted).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val pairs = NearDedup.embeddingPairs(embs, "vec_id", "embedding",
        dim = 64, threshold = 0.95, nBits = 16, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 5).foreach(i => assert(pairs.contains((i.toLong, 100L + i)),
      s"planted pair $i <-> ${100 + i} not recalled"))
    // random unit vectors in 64-dim shouldn't reach cosine 0.95
    assert(pairs.size === 5)
  }

  test("embeddingPairs recall vs the exact cosine-threshold join (q40 vs q34)") {
    import graft.functions.VectorFunctions
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = embs.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = embs.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(VectorFunctions.cosine(col("va"), col("vb")), 6))
      .filter(col("cosine") >= 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = NearDedup.embeddingPairs(embs, "vec_id", "embedding",
        dim = 64, threshold = 0.45, nBits = 16, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "vacuous fixture")
    assert(lsh.subsetOf(exact), "LSH emitted a pair below the exact threshold")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, f"LSH embedding-dedup recall $recall%.2f below 0.9")
  }

  test("ivfTopK recall vs brute force on the fixture embeddings") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = embs.filter(col("vec_id") < 10)
    val exact = Knn.bruteForceTopK(queries, embs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Knn.ivfTopK(queries, embs, "vec_id", "embedding", k = 5,
        nCells = 16, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, f"IVF recall $recall%.2f too low")
    // every query must get k results (cells are never empty at nProbe=8)
    assert(approx.groupBy(_._1).forall(_._2.size == 5))
  }

  test("k-means-trained IVF recall >= stride-sampled recall at the same nProbe") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = embs.filter(col("vec_id") < 10)
    val exact = Knn.bruteForceTopK(queries, embs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val stride = recallOf(Knn.ivfTopK(queries, embs, "vec_id", "embedding",
      k = 5, nCells = 16, nProbe = 4))
    val trained = recallOf(Knn.ivfTopKTrained(queries, embs, "vec_id", "embedding",
      k = 5, nCells = 16, nProbe = 4, iters = 3))
    assert(trained >= stride,
      f"k-means cells ($trained%.2f) should not lose to stride sampling ($stride%.2f)")
    assert(trained >= 0.5, f"trained IVF recall $trained%.2f too low")
  }

  test("lshTopK recall vs brute force on the fixture embeddings") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = embs.filter(col("vec_id") < 10)
    val exact = Knn.bruteForceTopK(queries, embs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Knn.lshTopK(queries, embs, "vec_id", "embedding",
        dim = 64, k = 5, nBits = 16, bands = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, f"LSH recall $recall%.2f too low") // random vectors: candidates are genuinely spread
    assert(approx.nonEmpty)
  }
}
