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

  test("minhashPairsIncremental: exactly the full-recompute pairs touching the batch") {
    // state: 1-4 (with an internal near-dup pair 1~2~4); batch: 5-7 where
    // 6 is a near-dup of state doc 1 and 7 duplicates batch doc 6
    val state = docs // ids 1..5
    val batch = Seq(
      (6L, "en", loremNear.replace("word3", "ALTERED")), // near 1/2/4
      (7L, "en", loremNear.replace("word3", "ALTERED")), // exact dup of 6
      (8L, "en", (0 until 60).map(i => s"zz$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val inc = NearDedup.minhashPairsIncremental(
        NearDedup.minhashState(state, "doc_id", "text"), batch, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    val full = NearDedup.minhashPairs(state.unionByName(batch), "doc_id", "text",
        shingleLen = 3, k = 64, bands = 16, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val expected = full.filter(p => p._1 >= 6L || p._2 >= 6L)
    assert(inc === expected,
      s"incremental must equal full-recompute restricted to batch-touching pairs")
    assert(inc.exists(p => p._2 == 6L && p._1 < 6L), "state-batch pair found")
    assert(inc.contains((6L, 7L, 1.0)), "batch-batch exact dup found")
    assert(!inc.exists(p => p._1 < 6L && p._2 < 6L), "no state-state pair leaks")
    NearDedup.releaseSketches()
  }

  test("minhashPairsIncremental: re-ingested id is an upsert (one row per pair, batch content wins)") {
    // doc 2 is re-ingested with text now IDENTICAL to doc 1 (its state copy
    // was loremNear); doc 9 exactly duplicates state doc 3
    val batch = Seq(
      (2L, "en", lorem),
      (9L, "en", other))
      .toDF("doc_id", "lang", "text")
    val inc = NearDedup.minhashPairsIncremental(
        NearDedup.minhashState(docs, "doc_id", "text"), batch, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSeq
    assert(inc.map(p => (p._1, p._2)).distinct.size === inc.size,
      s"a re-ingested id must not produce duplicate pair rows: $inc")
    assert(!inc.exists(p => p._1 == p._2), "same-id collision is not a pair")
    // pair (1,2) verifies against the NEW content: exact dup, not the old
    // one-word-changed jaccard
    assert(inc.filter(p => p._1 == 1L && p._2 == 2L).map(_._3) === Seq(1.0),
      s"pair (1,2) must verify against the batch copy of doc 2: $inc")
    assert(inc.filter(p => p._1 == 3L && p._2 == 9L).map(_._3) === Seq(1.0))
    NearDedup.releaseSketches()
  }

  test("simhashPairsIncremental: batch-touching slice of the full recompute, with upsert") {
    // signatures chosen so the chunk-pair index is genuinely exercised:
    // 0x0F is within Hamming 4 of 0x1F/0x0E, far from the high-bit family
    def sig(bits: Long) = bits
    val state = Seq(
      (1L, sig(0x0FL)), (2L, sig(0x1FL)),            // near pair inside state
      (3L, sig(0xF000000000000000L)),                // far from everything low
      (4L, sig(0x0FL)))                              // exact dup of 1 (state-state)
      .toDF("id", "sig")
    val batch = Seq(
      (5L, sig(0x0EL)),                              // near state 1/4 and 2
      (6L, sig(0x0EL)),                              // exact dup of batch 5
      (4L, sig(0xF000000000000001L)))                // RE-INGEST: 4 moves next to 3
      .toDF("id", "sig")
    val inc = NearDedup.simhashPairsIncremental(
        NearDedup.simhashState(state, maxHamming = 4), batch, maxHamming = 4)
      .as[(Long, Long, Int)].collect().toSet
    // full recompute over the upserted corpus (4 carries its batch sig)
    val upserted = Seq((1L, 0x0FL), (2L, 0x1FL), (3L, 0xF000000000000000L),
      (4L, 0xF000000000000001L), (5L, 0x0EL), (6L, 0x0EL)).toDF("id", "sig")
    val full = NearDedup.simhashPairsFromSigs(upserted, maxHamming = 4)
      .as[(Long, Long, Int)].collect().toSet
    val expected = full.filter(p => p._1 >= 4L || p._2 >= 4L) // 4 re-ingested = batch
    assert(inc === expected,
      s"incremental must equal the full-recompute batch slice: $inc vs $expected")
    assert(inc.contains((5L, 6L, 0)), "batch-batch exact dup found")
    assert(inc.contains((3L, 4L, 1)),
      "re-ingested id must pair against its NEW signature (upsert)")
    assert(!inc.exists(p => p._1 == 1L && p._2 == 4L),
      "the OLD state copy of a re-ingested id must not pair (1~old-4 was Hamming 0)")
    assert(!inc.exists(p => p._1 < 4L && p._2 < 4L), "no state-state pair leaks")
    assert(!inc.exists(p => p._1 == p._2), "same-id collision is not a pair")
  }

  test("simhashPairsIncremental broadcasts the batch keys (state side streams)") {
    val state = NearDedup.simhashState(
      Seq((1L, 0x0FL), (2L, 0x1FL)).toDF("id", "sig"), maxHamming = 4)
    val plan = NearDedup.simhashPairsIncremental(state,
        Seq((6L, 0x0EL)).toDF("id", "sig"), maxHamming = 4,
        reuseSketches = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate join must broadcast the new side, got:\n$plan")
  }

  test("minhashPairsIncremental broadcasts the batch buckets (state side streams)") {
    val batch = Seq((6L, "en", loremNear)).toDF("doc_id", "lang", "text")
    val plan = NearDedup.minhashPairsIncremental(
        NearDedup.minhashState(docs, "doc_id", "text", reuseSketches = false),
        batch, "doc_id", "text", reuseSketches = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate join must broadcast the new side, got:\n$plan")
  }

  test("embeddingPairsIncremental: exactly the full-recompute pairs touching the batch") {
    def vec(seed: Int) = {
      val r = new scala.util.Random(seed)
      Array.fill(16)(r.nextGaussian().toFloat)
    }
    val state = (1L to 40L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    // batch: near-copies of state vectors 1-3 plus an unrelated vector
    val batch = Seq(
      (101L, vec(1).map(x => x + 0.01f)),
      (102L, vec(2).map(x => x + 0.01f)),
      (103L, vec(3).map(x => x + 0.01f)),
      (104L, vec(999)))
      .toDF("vec_id", "embedding")
    val inc = NearDedup.embeddingPairsIncremental(
        NearDedup.embeddingState(state, "vec_id", "embedding",
          dim = 16, nBits = 32, bands = 8),
        batch, "vec_id", "embedding", dim = 16, threshold = 0.95,
        nBits = 32, bands = 8)
      .as[(Long, Long, Double)].collect().toSet
    val full = NearDedup.embeddingPairs(state.unionByName(batch),
        "vec_id", "embedding", dim = 16, threshold = 0.95, nBits = 32, bands = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc === full.filter(p => p._1 > 100L || p._2 > 100L),
      "incremental must equal full-recompute restricted to batch-touching pairs")
    assert(Set(1L, 2L, 3L).subsetOf(inc.map(_._1)), "all planted state matches found")
    assert(!inc.exists(p => p._1 <= 100L && p._2 <= 100L), "no state-state pair leaks")
    NearDedup.releaseSketches()
  }

  test("embeddingPairsIncremental: re-ingested id is an upsert (batch vector wins)") {
    def vec(seed: Int) = {
      val r = new scala.util.Random(seed)
      Array.fill(16)(r.nextGaussian().toFloat)
    }
    val state = (1L to 40L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    // id 2 re-ingested as a near-copy of vector 1; id 105 is a near-copy of
    // id 2's OLD state vector — under upsert semantics (2,105) must NOT pair
    // (id 2's current content is vec(1)-like), while (1,2) must
    val batch = Seq(
      (2L, vec(1).map(x => x + 0.01f)),
      (105L, vec(2).map(x => x + 0.01f)))
      .toDF("vec_id", "embedding")
    val inc = NearDedup.embeddingPairsIncremental(
        NearDedup.embeddingState(state, "vec_id", "embedding",
          dim = 16, nBits = 32, bands = 8),
        batch, "vec_id", "embedding", dim = 16, threshold = 0.95,
        nBits = 32, bands = 8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(inc.map(p => (p._1, p._2)).distinct.size === inc.size,
      s"a re-ingested id must not produce duplicate pair rows: $inc")
    assert(!inc.exists(p => p._1 == p._2), "same-id collision is not a pair")
    assert(inc.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 0.95),
      s"(1,2) must verify against the batch copy of id 2: $inc")
    assert(!inc.exists(p => p._1 == 2L && p._2 == 105L),
      s"(2,105) would only pair against id 2's replaced state vector: $inc")
    NearDedup.releaseSketches()
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

  test("containmentPairs flags a short eval item quoted inside a long doc") {
    val evalText = (0 until 12).map(i => s"eval$i").mkString(" ")
    val longDoc = ((0 until 200).map(i => s"fill$i") ++ evalText.split(" ") ++
      (200 until 400).map(i => s"fill$i")).mkString(" ")
    val corpus = Seq((1L, longDoc), (2L, other)).toDF("doc_id", "text")
    val evals = Seq((100L, evalText)).toDF("eval_id", "etext")
    val got = NearDedup.containmentPairs(corpus, "doc_id", "text",
        evals, "eval_id", "etext", n = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    // the quote is verbatim: every eval shingle appears in doc 1
    assert(got === Seq((1L, 100L, 1.0)))
    // symmetric Jaccard would never flag this pair: |inter|/|union| is
    // ~10/410 — the asymmetric measure is the point of the operator
    val j = NearDedup.ngramJaccardPairs(
      corpus.unionByName(evals.select($"eval_id".as("doc_id"), $"etext".as("text")))
        .withColumn("blk", lit("x")),
      "doc_id", "text", "blk", 3, 0.3)
    assert(j.isEmpty, "Jaccard at 0.3 should miss the quoted eval item")
  }

  test("containmentPairs keeps the corpus side broadcast-joined (no corpus shuffle)") {
    val corpus = Seq((1L, lorem), (2L, other)).toDF("doc_id", "text")
    val evals = Seq((100L, lorem)).toDF("eval_id", "etext")
    val plan = NearDedup.containmentPairs(corpus, "doc_id", "text",
      evals, "eval_id", "etext", n = 3, threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval index should broadcast, plan was:\n$plan")
  }

  test("passageDedup: survivor is min (doc_id, para_idx), copies counted") {
    import graft.functions.TextFunctions
    val block = (0 until 50).map(i => s"w$i").mkString(" ")  // one full window
    val tail = (0 until 30).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"$block $tail"),         // passages: block, tail
      (2L, s"$block ${tail.toUpperCase}"), // block shared (tokens lowercase), tail shared too
      (3L, other))
      .toDF("doc_id", "text")
    val out = NearDedup.passageDedup(docs, "doc_id",
        TextFunctions.tokenWindows(col("text"), 50))
      .as[(Long, Long, Long)].collect().toSet
    // block + tail both survive at doc 1; doc 2 contributes no survivors
    assert(out === Set((1L, 0L, 2L), (1L, 1L, 2L), (3L, 0L, 1L), (3L, 1L, 1L)))
  }

  test("embeddingPairs at dedup-grade threshold 0.9: recall and pruning (q49)") {
    import graft.functions.VectorFunctions
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    // the q49 augmentation: one near-copy per vector (+0.05 per coordinate,
    // rounded back to float), true pairs at cosine 0.92-0.95
    val copies = embs.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"),
        x => (x.cast("double") + lit(0.05)).cast("float")).as("embedding"))
    val aug = embs.unionByName(copies)
    val a = aug.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = aug.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(VectorFunctions.cosine(col("va"), col("vb")), 6))
      .filter(col("cosine") >= 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size === 500, "augmentation should plant exactly one pair per vector")
    val lsh = NearDedup.embeddingPairs(aug, "vec_id", "embedding",
        dim = 64, threshold = 0.9, nBits = 48, bands = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH emitted a pair below the exact threshold")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.85, f"q49-config recall $recall%.2f below 0.85")
    // pruning: candidate pairs surviving banding must be a small fraction
    // of the n^2/2 cross join (the wide-band scale configs push this to
    // ~true-pair volume; see the embeddingPairs cost model)
    val sig = aug.select(col("vec_id"),
      VectorFunctions.hyperplaneSignature(col("embedding"), 64, 48).as("sig"))
    val banded = sig.select(col("vec_id"),
        explode(VectorFunctions.bandBuckets(col("sig"), 48, 6)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cands = banded.as("x").join(banded.as("y"), Seq("band", "bucket"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id")).distinct().count()
    val crossPairs = 1000L * 999L / 2
    assert(cands.toDouble / crossPairs < 0.1,
      f"banding kept ${cands.toDouble / crossPairs}%.3f of the cross join — no pruning")
  }

  test("connectedComponents: multi-hop chains collapse, min-id survivor labels") {
    import graft.dedup.Clusters
    // chain 1-2-3 (1~3 never paired) + island 10-11 + reversed-order pair
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // a longer chain exercises >1 propagation round
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Clusters.connectedComponents(chain, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet === Set(1L), s"chain must collapse to one cluster: $labels")
  }

  test("connectedComponents: driver union-find path equals the distributed loop") {
    import graft.dedup.Clusters
    // multi-component random graph: chains, a clique, islands, reversed
    // and duplicate pairs
    val rnd = new scala.util.Random(7)
    val pairs = (
      (1L until 30L).map(i => (i, i + 1)) ++                 // long chain
      (for (a <- 100L to 104L; b <- (a + 1) to 104L) yield (a, b)) ++ // clique
      Seq((200L, 201L), (201L, 200L), (200L, 201L)) ++       // dup + reversed
      Seq.fill(40)((rnd.nextInt(50).toLong + 300L, rnd.nextInt(50).toLong + 300L))
    ).toDF("id_a", "id_b")
    val viaDriver = Clusters.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val viaLoop = Clusters.connectedComponents(pairs, "id_a", "id_b",
        driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver === viaLoop,
      "the two physical paths must emit identical labels")
  }

  test("incrementalComponents: state star edges + batch pairs equal one-pass, parquet round-trip") {
    import graft.dedup.Clusters
    // history: clusters {1,2,3} (chain) and {10,11}; singleton-free by construction
    val histPairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val state = Clusters.connectedComponents(histPairs, "id_a", "id_b")
    // the state is a plain frame — persist/reload like any other state family member
    val dir = java.nio.file.Files.createTempDirectory("cluster_state").toString
    state.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    // batch pairs exercise all three shapes:
    //  - 20~21: brand-new cluster
    //  - 4~3:   new node joins an old cluster (via a non-rep member)
    //  - 12~10 with 12 also ~11's cluster-mate? instead: merge case 3~10
    //    bridges the two OLD clusters into one
    //  - 0~11:  a batch id SMALLER than every old label relabels the
    //           merged component to 0 (labels are canonical, not stable)
    val batchPairs = Seq((20L, 21L), (4L, 3L), (3L, 10L), (0L, 11L))
      .toDF("id_a", "id_b")
    val got = Clusters.incrementalComponents(reloaded, batchPairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val onePass = Clusters.connectedComponents(
        histPairs.unionByName(batchPairs), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got === onePass,
      "incremental labels must equal one-pass labels over the full edge set")
    // and the one-pass truth is what the shapes above dictate
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      10L -> 0L, 11L -> 0L, 20L -> 20L, 21L -> 20L))
  }

  test("centralityPpm: hand-computed integer PageRank on a path, partition-invariant") {
    import graft.dedup.Clusters
    // path 1-2-3 plus island 10-11; all arithmetic floor-div ppm
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Clusters.centralityPpm(pairs, "id_a", "id_b", iters = 3)
      .as[(Long, Long)].collect().toMap
    // iter1: r = (575000, 1850000, 575000); iter2: (936250, 1127500, 936250);
    // iter3: (629187, 1741625, 629187). A degree-1 symmetric pair is a
    // fixpoint at exactly 1e6.
    assert(got === Map(1L -> 629187L, 2L -> 1741625L, 3L -> 629187L,
      10L -> 1000000L, 11L -> 1000000L))
    val repart = Clusters.centralityPpm(pairs.repartition(7), "id_a", "id_b", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(repart === got, "integer-ppm ranks must not depend on partitioning")
  }

  test("splitByCluster: near-dup cluster members never straddle the split boundary") {
    import graft.dedup.Clusters
    val docs = (1L to 400L).map(i => Tuple1(i)).toDF("doc_id")
    // clusters: {1,2,3}, {10,11}; everything else singleton
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster_id")
    val split = Clusters.splitByCluster(docs, "doc_id", labels)
      .as[(Long, String)].collect().toMap
    assert(split.size === 400)
    assert(Set(split(1L), split(2L), split(3L)).size === 1,
      "cluster {1,2,3} must share one split")
    assert(split(10L) === split(11L), "cluster {10,11} must share one split")
    // permille cuts land near 80/10/10 on 400 singleton-ish docs
    val frac = split.values.groupBy(identity).view.mapValues(_.size / 400.0).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train share off: $frac")
    assert(frac.getOrElse("val", 0.0) > 0.03 && frac.getOrElse("test", 0.0) > 0.03,
      s"val/test shares off: $frac")
  }

  test("contaminationClosure: whole near-dup cluster drops, closure-only twins flagged") {
    import graft.dedup.Clusters
    val docs = (1L to 60L).map(i => Tuple1(i)).toDF("doc_id")
    // clusters: {1,2,3}, {10,11}; everything else singleton
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster_id")
    // directly flagged: 2 (a mid-cluster member, NOT the representative)
    // and 50 (unclustered — must drop exactly itself)
    val flagged = Seq(Tuple1(2L), Tuple1(50L)).toDF("doc_id")
    val got = Clusters.contaminationClosure(docs, "doc_id", labels, flagged, "doc_id")
      .as[(Long, Long, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.size === 60)
    // the whole cluster {1,2,3} drops; only 2 is direct — 1 and 3 are the
    // closure-only catches the containment check alone would have kept
    assert(got(2L) === ((1L, true, "drop")))
    assert(got(1L) === ((1L, false, "drop")))
    assert(got(3L) === ((1L, false, "drop")))
    // the clean cluster {10,11} keeps both members
    assert(got(10L) === ((10L, false, "keep")))
    assert(got(11L) === ((10L, false, "keep")))
    // an unclustered flagged doc drops exactly itself
    assert(got(50L) === ((50L, true, "drop")))
    assert(got(51L) === ((51L, false, "keep")))
    // invariant: a verdict is constant within a cluster
    val byCluster = got.values.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    assert(byCluster.values.forall(_.size == 1),
      "every cluster must carry exactly one verdict")
  }

  test("releaseSketches unpersists the tracked sketch frames (cache lifecycle)") {
    // earlier tests in this suite cached the same sketch plan; start clean
    // or CacheManager dedups the persist and no NEW entry appears
    NearDedup.releaseSketches()
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    NearDedup.minhashPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).count()
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "expected the sketch frame to be persisted")
    NearDedup.releaseSketches()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(added.forall(!after.contains(_)),
      "sketch frames still persisted after releaseSketches()")
  }

  test("Pca.topComponentTrail: converges to a planted dominant direction, partition-invariant") {
    import graft.similarity.Pca
    val dim = 16
    val rnd = new scala.util.Random(13)
    val w = {
      val raw = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    // x_i = g_i * w + small isotropic noise: top PC is w up to sign
    val vecs = (0 until 300).map { i =>
      val g = rnd.nextGaussian() * 3.0
      (i.toLong, w.map(c => (g * c + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("id", "v")

    val trail = Pca.topComponentTrail(vecs, "id", "v", dim, iters = 3)
    val last = trail.filter(col("iter") === 3).orderBy("dim")
      .select("v_u").as[Long].collect()
    assert(last.length === dim)
    // per-iteration normalization contract: max |v_u| is exactly 1e6
    (1 to 3).foreach { it =>
      val mx = trail.filter(col("iter") === it)
        .agg(max(abs(col("v_u")))).as[Long].head()
      assert(mx === 1000000L, s"iter $it max-abs $mx")
    }
    // convergence: |cos(v3, w)| > 0.99
    val vd = last.map(_.toDouble)
    val cos = vd.zip(w).map { case (a, b) => a * b }.sum /
      (math.sqrt(vd.map(x => x * x).sum) * math.sqrt(w.map(x => x * x).sum))
    assert(math.abs(cos) > 0.99, f"top PC missed planted direction: cos=$cos%.4f")
    // partition invariance: fixed-point arithmetic makes the trail
    // bit-identical whatever the layout
    val again = Pca.topComponentTrail(vecs.repartition(7), "id", "v", dim, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(again === trail.as[(Long, Long, Long)].collect().toSet)
  }

  test("Pca direction persists through parquet; drift vs stored == drift vs recomputed") {
    import graft.similarity.Pca
    val dir = java.nio.file.Files.createTempDirectory("graft_pca").toString
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = embs.filter(col("vec_id") % 2 === 0)
    val b = embs.filter(col("vec_id") % 2 === 1)

    val va = Pca.topComponent(a, "vec_id", "embedding", 64, 3)
    Pca.directionToDF(spark, va).write.mode("overwrite").parquet(s"$dir/direction")
    val loaded = Pca.directionFromDF(spark.read.parquet(s"$dir/direction"))
    assert(loaded.toSeq === va.toSeq, "micros must round-trip parquet exactly")

    val viaState = Pca.directionDriftAgainst(b, "vec_id", "embedding", 64, 3, loaded)
      .as[(Long, Long)].head()
    val direct = Pca.directionDrift(b, a, "vec_id", "embedding", 64, 3)
      .as[(Long, Long)].head()
    assert(viaState === direct,
      "serving against the persisted direction must equal the two-pass form")
  }

  test("IvfIndex round-trips through parquet and searches identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = embs.filter(col("vec_id") < 10)

    val built = Knn.buildIvfIndex(embs, "vec_id", "embedding", nCells = 16, iters = 3)
    Knn.centroidsToDF(spark, built.centroids).write.mode("overwrite")
      .parquet(s"$dir/centroids")
    built.cells.write.mode("overwrite").parquet(s"$dir/cells")

    // a "serving session": index loaded purely from parquet
    val loaded = graft.similarity.IvfIndex(
      Knn.centroidsFromDF(spark.read.parquet(s"$dir/centroids")),
      spark.read.parquet(s"$dir/cells"))
    val fromIndex = Knn.ivfTopKFromIndex(loaded, queries, "vec_id", "embedding",
        k = 5, nProbe = 4)
      .as[(Long, Long, Double, Long)].collect().toSet
    val direct = Knn.ivfTopKTrained(queries, embs, "vec_id", "embedding",
        k = 5, nCells = 16, nProbe = 4, iters = 3)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(fromIndex === direct,
      "search from the persisted index must equal the train-per-call path")
  }

  test("IvfSq8Index round-trips through parquet and searches identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sq8").toString
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = embs.filter(col("vec_id") < 10)

    val built = Knn.buildIvfSq8Index(embs, "vec_id", "embedding", nCells = 16)
    Knn.centroidsToDF(spark, built.centroids).write.mode("overwrite")
      .parquet(s"$dir/centroids")
    built.codes.write.mode("overwrite").parquet(s"$dir/codes")

    val loaded = graft.similarity.IvfSq8Index(
      Knn.centroidsFromDF(spark.read.parquet(s"$dir/centroids")),
      spark.read.parquet(s"$dir/codes"))
    val fromLoaded = Knn.ivfSq8TopK(loaded, queries, "vec_id", "embedding",
        k = 5, nProbe = 4)
      .as[(Long, Long, Double, Long)].collect().toSet
    val fromBuilt = Knn.ivfSq8TopK(built, queries, "vec_id", "embedding",
        k = 5, nProbe = 4)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(fromLoaded === fromBuilt,
      "SQ8 search from the persisted index must equal search from the built one")
  }

  test("IvfPqIndex round-trips through parquet (codebooks included) and searches identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = embs.filter(col("vec_id") < 10)

    // trained codebooks (trainIters > 0) are the case that CANNOT be
    // re-derived cheaply in a serving session — the whole point of
    // persisting them
    val built = Knn.buildIvfPqIndex(embs, "vec_id", "embedding",
      nCells = 16, m = 8, ksub = 16, trainIters = 1)
    Knn.centroidsToDF(spark, built.centroids).write.mode("overwrite")
      .parquet(s"$dir/centroids")
    Knn.codebooksToDF(spark, built.codebooks).write.mode("overwrite")
      .parquet(s"$dir/codebooks")
    built.codes.write.mode("overwrite").parquet(s"$dir/codes")

    val reloadedBooks = Knn.codebooksFromDF(spark.read.parquet(s"$dir/codebooks"))
    assert(reloadedBooks === built.codebooks,
      "codebook tensor must survive the parquet round-trip exactly")
    val loaded = graft.similarity.IvfPqIndex(
      Knn.centroidsFromDF(spark.read.parquet(s"$dir/centroids")),
      reloadedBooks,
      spark.read.parquet(s"$dir/codes"))
    val fromLoaded = Knn.ivfPqTopK(loaded, queries, "vec_id", "embedding",
        k = 5, nProbe = 4)
      .as[(Long, Long, Double, Long)].collect().toSet
    val fromBuilt = Knn.ivfPqTopK(built, queries, "vec_id", "embedding",
        k = 5, nProbe = 4)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(fromLoaded === fromBuilt,
      "PQ search from the persisted index must equal search from the built one")
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

  test("ivfSq8TopK: quantized probe tracks the float IVF ranking, no float vectors read") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = embs.filter(col("vec_id") < 10)
    val index = Knn.buildIvfSq8Index(embs, "vec_id", "embedding", nCells = 16)
    assert(index.codes.columns.toSet === Set("neighbor_id", "cell", "maxabs", "codes"),
      "the SQ8 index must not carry float vectors")
    // nProbe = nCells disables cell pruning, isolating quantization error:
    // against the float path at the SAME (stride) centroids, int8 residual
    // codes must preserve nearly the whole top-5 set
    val sq8 = Knn.ivfSq8TopK(index, queries, "vec_id", "embedding",
        k = 5, nProbe = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val float = Knn.ivfTopK(queries, embs, "vec_id", "embedding", k = 5,
        nCells = 16, nProbe = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = float.intersect(sq8).size.toDouble / float.size
    assert(recall >= 0.8, f"SQ8 recall vs float IVF $recall%.2f too low")
    assert(sq8.groupBy(_._1).forall(_._2.size == 5), "k rows per query")
  }

  test("ivfPqTopK: product-quantized probe tracks float IVF; m-byte codes only") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = embs.filter(col("vec_id") < 10)
    val index = Knn.buildIvfPqIndex(embs, "vec_id", "embedding",
      nCells = 16, m = 16, ksub = 64, trainIters = 3)
    assert(index.codes.columns.toSet === Set("neighbor_id", "cell", "codes"),
      "the PQ index must carry neither float vectors nor per-vector scales")
    assert(index.codebooks.size === 16 && index.codebooks.forall(_.size === 64)
      && index.codebooks.forall(_.forall(_.size === 4)), "m x ksub x dsub codebooks")
    // every code must be a valid codebook index (argmin can never miss)
    val codeRange = index.codes.select(explode(col("codes")).as("c"))
      .agg(min("c"), max("c")).as[(Int, Int)].head()
    assert(codeRange._1 >= 0 && codeRange._2 < 64, s"codes out of range: $codeRange")
    // nProbe = nCells disables cell pruning, isolating quantization error;
    // PQ is lossier than SQ8 (8 bytes vs 64 per vector) so the bar is lower
    val float = Knn.ivfTopK(queries, embs, "vec_id", "embedding", k = 5,
        nCells = 16, nProbe = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(ix: graft.similarity.IvfPqIndex): Double = {
      val pq = Knn.ivfPqTopK(ix, queries, "vec_id", "embedding",
          k = 5, nProbe = 16)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      assert(pq.groupBy(_._1).forall(_._2.size == 5), "k rows per query")
      float.intersect(pq).size.toDouble / float.size
    }
    val trained = recallOf(index)
    assert(trained >= 0.5, f"trained-PQ recall vs float IVF $trained%.2f too low")
    // Lloyd-refined codebooks must beat the raw deterministic sample
    val sampledRecall = recallOf(Knn.buildIvfPqIndex(embs, "vec_id", "embedding",
      nCells = 16, m = 16, ksub = 64, trainIters = 0))
    assert(trained >= sampledRecall,
      f"training ($trained%.2f) should not lose to the sample ($sampledRecall%.2f)")
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

  test("classifyFromNeighbors: planted clusters classify correctly, ties break to min label") {
    // three tight clusters along orthogonal axes; labels follow clusters
    def axisVec(axis: Int, jitter: Float): Seq[Float] =
      (0 until 6).map(d => if (d == axis) 1.0f else if (d == (axis + 1) % 6) jitter else 0.0f)
    val corpus = (0 until 3).flatMap { lbl =>
      (0 until 4).map(i => (lbl * 10L + i, axisVec(lbl * 2, 0.01f * i), lbl))
    }.toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (100L, axisVec(0, 0.02f), -1),
      (101L, axisVec(2, 0.02f), -1),
      (102L, axisVec(4, 0.02f), -1)).toDF("vec_id", "embedding", "label")
    val pred = Knn.classifyFromNeighbors(
        Knn.bruteForceTopK(queries, corpus, "vec_id", "embedding", 3),
        corpus, "vec_id", "label", 3)
      .as[(Long, Int, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(pred(100L) === ((0, 3L, 1.0)))
    assert(pred(101L) === ((1, 3L, 1.0)))
    assert(pred(102L) === ((2, 3L, 1.0)))

    // exact vote tie (k=2, one neighbor each of labels 7 and 3) -> min label
    val tieCorpus = Seq(
      (1L, Seq(1.0f, 0.0f), 7),
      (2L, Seq(0.9f, 0.1f), 3)).toDF("vec_id", "embedding", "label")
    val tieQuery = Seq((9L, Seq(1.0f, 0.05f), -1)).toDF("vec_id", "embedding", "label")
    val tie = Knn.classifyFromNeighbors(
        Knn.bruteForceTopK(tieQuery, tieCorpus, "vec_id", "embedding", 2),
        tieCorpus, "vec_id", "label", 2)
      .as[(Long, Int, Long, Double)].collect()
    assert(tie.toSeq === Seq((9L, 3, 1L, 0.5)), s"tie must break to min label: ${tie.toSeq}")
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

  test("truncationRecall: full-dim truncation is identity; dim-1 tie collapse loses planted neighbors") {
    // dim-2 vectors whose true ranking lives in the SECOND dimension:
    // truncating to dim 1 collapses every cosine to 1.0 and the tie
    // order (neighbor_id asc) takes over.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 10.0f)),   // far from 0 in angle
      (2L, Array(0.9f, 0.1f)),    // 0's true nearest
      (3L, Array(5.0f, 0.0f)))    // colinear with 0
      .toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id").isin(0L, 3L))

    // dims = full width -> the two producers are the same query: kept = k
    val identity = Knn.truncationRecall(queries, vecs, "vec_id", "embedding",
        k = 2, dims = 2)
      .orderBy("query_id").as[(Long, Long, Long)].collect()
    assert(identity.toSeq === Seq((0L, 2L, 1000L), (3L, 2L, 1000L)))

    // dims = 1: every truncated cosine collapses to 1.0 and the tie
    // order (neighbor_id asc) decides. q0's candidates are {1,2,3}: the
    // tie picks id 1, so its true top-1 (id 3, colinear) is lost. q3's
    // candidates are {0,1,2}: the tie picks id 0, which IS its true
    // top-1 — kept survives the collapse by luck of the id order.
    val out = Knn.truncationRecall(queries, vecs, "vec_id", "embedding",
        k = 1, dims = 1)
      .orderBy("query_id").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(0L) === ((0L, 0L)), s"q0 must report kept=0, got $out")
    assert(out(3L) === ((1L, 1000L)), s"q3's top-1 (id 0) wins the dim-1 tie too")
  }

  test("hardNegatives: same-label neighbors excluded, rank over cross-label set, null label is a value") {
    val vecs = Seq(
      (0L, "A", Array(1.0f, 0.0f)),
      (1L, "A", Array(0.99f, 0.01f)),  // nearest overall — same label, must not appear
      (2L, "B", Array(0.9f, 0.1f)),    // nearest cross-label
      (3L, "B", Array(0.0f, 1.0f)),
      (4L, null.asInstanceOf[String], Array(0.95f, 0.05f))) // null label: DISTINCT from "A"
      .toDF("vec_id", "label", "embedding")
    val out = Knn.hardNegatives(vecs.filter(col("vec_id") === 0L), vecs,
        "vec_id", "embedding", "label", k = 5)
      .orderBy("rank")
      .select("neighbor_id", "neighbor_label", "rank")
      .as[(Long, String, Long)].collect()
    // all three cross-label vectors, ranked by cosine; id 1 (label A) absent
    assert(out.map(_._1).toSeq === Seq(4L, 2L, 3L), s"got ${out.toSeq}")
    assert(out.map(_._3).toSeq === Seq(1L, 2L, 3L))
    assert(!out.map(_._1).contains(1L), "same-label nearest neighbor must be excluded")

    // a null-labeled QUERY gets every non-null-labeled vector as negative
    // (null <=> null is TRUE -> the other null-labeled row is excluded)
    val vecs2 = vecs.unionByName(Seq(
      (5L, null.asInstanceOf[String], Array(0.94f, 0.06f)))
      .toDF("vec_id", "label", "embedding"))
    val nullQ = Knn.hardNegatives(vecs2.filter(col("vec_id") === 4L), vecs2,
        "vec_id", "embedding", "label", k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert(nullQ === Set(0L, 1L, 2L, 3L), s"null-vs-null is SAME label: $nullQ")
  }

  test("hardNegativesFromNeighbors: composed over a wide producer list == brute; recall bounded by producer k") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = embs.filter(col("vec_id") < 8)
    // a producer list wide enough to contain every cross-label candidate
    // makes the composed form IDENTICAL to the brute operator
    val wide = Knn.bruteForceTopK(queries, embs, "vec_id", "embedding", k = 40)
    val composed = Knn.hardNegativesFromNeighbors(wide, embs, "vec_id", "label", k = 3)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Int, Double, Long)].collect()
    val brute = Knn.hardNegatives(queries, embs, "vec_id", "embedding", "label", k = 3)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Int, Double, Long)].collect()
    assert(composed.nonEmpty && composed.toSeq === brute.toSeq)
    composed.foreach { case (_, ql, _, nl, _, _) => assert(ql != nl) }
    // a producer list of k=1 can exhaust on same-label neighborhoods:
    // fewer (possibly zero) negatives per query — bounded, not padded
    val narrow = Knn.hardNegativesFromNeighbors(
      Knn.bruteForceTopK(queries, embs, "vec_id", "embedding", k = 1),
      embs, "vec_id", "label", k = 3)
    val perQuery = narrow.groupBy("query_id").count()
      .select("count").as[Long].collect()
    assert(perQuery.forall(_ <= 1), "k=1 producer can yield at most 1 negative per query")
  }

  test("verifiedPairsReplayable + crossSourceDupMatrix: verified subset, exact matrix") {
    import graft.dedup.NearDedup
    import graft.functions.TextFunctions
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base, "mirror_a"),                      // near-copies across sources
      (2L, base + " extra", "mirror_b"),
      (3L, base + " tail", "mirror_b"),            // and within mirror_b
      (4L, "completely different words nothing shared here at all everyone", "clean"),
      (5L, "another unrelated document with its own vocabulary entirely", "clean")
    ).toDF("doc_id", "text", "source")
    val feats = TextFunctions.wordShingles(col("text"), 3)
    val verified = NearDedup.verifiedPairsReplayable(docs, "doc_id", feats,
        k = 32, bands = 8, thresholdPpm = 300000L)
      .as[(Long, Long, Long)].collect()
    // every verified pair passes the threshold and is a candidate pair
    assert(verified.forall(_._3 >= 300000L))
    val cands = NearDedup.minhashCandidatesReplayable(docs, "doc_id", feats,
        k = 32, bands = 8)
      .as[(Long, Long)].collect().toSet
    assert(verified.map(p => (p._1, p._2)).toSet.subsetOf(cands))
    // the three near-copies pair up; the clean docs pair with nothing
    assert(verified.map(p => (p._1, p._2)).toSet ===
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val mat = NearDedup.crossSourceDupMatrix(docs, "doc_id", "source", feats,
        k = 32, bands = 8, thresholdPpm = 300000L)
      .orderBy("src_lo", "src_hi")
      .as[(String, String, Long, Long)].collect()
    // (1,2) and (1,3) are mirror_a x mirror_b (docs 1,2,3); (2,3) is the
    // mirror_b diagonal (docs 2,3)
    assert(mat.toSeq === Seq(
      ("mirror_a", "mirror_b", 2L, 3L),
      ("mirror_b", "mirror_b", 1L, 2L)))
  }
}
