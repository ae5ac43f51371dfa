package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants on RANDOM inputs — the edge cases fixtures
  * don't plant (empty groups, all-ties, hot keys, oversize rows). Raw
  * ScalaCheck driven through its own Test runner (the scalatest bridge
  * artifact isn't vendored); each property runs a bounded number of small
  * Spark jobs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("property: media codecs quarantine ANY byte corruption, never throw") {
    // The multimodal decode contract — "one corrupt file in a 100 TB
    // crawl flags its row, never kills the job" — asserted on RANDOM
    // corruption, not the fixture's planted classes: arbitrary garbage
    // bytes, and valid synth payloads with random slices mutated /
    // truncated / extended. Every decoder must return null or a value;
    // an exception here is a job-killer in production. Pure driver-side
    // byte work (no Spark jobs), so the property can afford many cases.
    import graft.multimodal.{Ppm, PpmSeq, Wav}
    val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
      "ppm_stats" -> (b => Ppm.decodeStats(b)),
      "ppm_ahash" -> (b => Ppm.aHash64(b)),
      "ppm_resize" -> (b => Ppm.resize(b, 3, 2)),
      "wav_stats" -> (b => Wav.decodeStats(b)),
      "wav_sig" -> (b => Wav.audioSig64(b)),
      "ppmseq_frames" -> (b => PpmSeq.frameCount(b)),
      "ppmseq_stats" -> (b => PpmSeq.sampleStats(b, 2)),
      "ppmseq_ahashes" -> (b => PpmSeq.frameAHashes(b, 2)))
    def survives(payload: Array[Byte]): Boolean =
      decoders.forall { case (name, d) =>
        try { d(payload); true }
        catch { case e: Throwable =>
          fail(s"$name threw on ${payload.length}-byte input: $e"); false
        }
      }
    val genGarbage = Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    val genValid: Gen[Array[Byte]] = Gen.oneOf(
      Gen.chooseNum(0L, 5000L).map(Ppm.synthPayload),
      Gen.chooseNum(0L, 5000L).map(Wav.synthPayload),
      Gen.chooseNum(0L, 5000L).map(Wav.synthChirpPayload),
      Gen.zip(Gen.chooseNum(0L, 5000L), Gen.chooseNum(1, 6))
        .map { case (id, nf) => PpmSeq.synthPayload(id, nf) })
    val genMutated = for {
      base <- genValid
      nMut <- Gen.chooseNum(1, 8)
      muts <- Gen.listOfN(nMut,
        Gen.zip(Gen.chooseNum(0, math.max(base.length - 1, 0)),
          Gen.chooseNum(-128, 127).map(_.toByte)))
      cut <- Gen.chooseNum(0, base.length)
      mode <- Gen.chooseNum(0, 2)
    } yield mode match {
      case 0 => val b = base.clone(); muts.foreach { case (i, v) => b(i) = v }; b
      case 1 => base.take(cut) // truncation at any offset
      case 2 => base ++ muts.map(_._2) // trailing junk
    }
    check("codec fuzz (garbage)", Prop.forAll(genGarbage)(survives), n = 60)
    check("codec fuzz (mutated valid)", Prop.forAll(genMutated)(survives), n = 120)
  }

  test("property: saltedJoin is result-identical to the plain join") {
    val genRows = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(0L, 5L), Gen.alphaStr.map(_.take(4))))
    val genDim = Gen.listOfN(6, Gen.zip(Gen.chooseNum(0L, 7L), Gen.alphaStr.map(_.take(4))))
    val prop = Prop.forAll(genRows, genDim, Gen.chooseNum(1, 8)) {
      (rows, dim, f) =>
        val left = rows.toDF("k", "v")
        val right = dim.distinct.toDF("k", "w") // dim keys may repeat rows otherwise
        val salted = graft.operators.Skew.saltedJoin(left, right, "k", f)
          .as[(Long, String, String)].collect().sorted.toSeq
        val plain = left.join(right, Seq("k"))
          .as[(Long, String, String)].collect().sorted.toSeq
        salted == plain
    }
    check("saltedJoin", prop, n = 10)
  }

  test("property: packBins is lossless, order-monotone, and offset-bounded") {
    val genRows = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(1L, 120L)))
    val prop = Prop.forAll(genRows) { rowsRaw =>
      val rows = rowsRaw.distinctBy(_._1)
      val budget = 100L
      val df = rows.toDF("id", "n_tok").withColumn("g", lit(0))
      val packed = graft.operators.SequencePacking.packBins(
          df, Seq("g"), Seq(col("id")), "n_tok", budget)
        .select(col("id"), col("n_tok"), col("bin"))
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val lossless = packed.map(_._1) == rows.map(_._1).sorted
      // offset packing: bins never decrease along the order, and a bin's
      // token sum exceeds the budget by less than its largest row (a row
      // is assigned where its START offset lands)
      val monotone = packed.map(_._3) == packed.map(_._3).sorted
      val bounded = packed.groupBy(_._3).values.forall { bin =>
        bin.map(_._2).sum - bin.map(_._2).max < budget
      }
      lossless && monotone && bounded
    }
    check("packBins", prop, n = 10)
  }

  test("property: tokenWindows covers every token exactly once, in order") {
    val genText = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dddd"))
      .map(_.mkString(" "))
    val prop = Prop.forAll(genText, Gen.chooseNum(1, 7)) { (text, win) =>
      val out = Seq(Tuple1(text)).toDF("text")
        .select(graft.functions.TextFunctions.tokenWindows(col("text"), win)
          .as("w"))
        .select(explode(col("w")).as("p"))
        .as[String].collect().toSeq
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      out.flatMap(_.split(" ").filter(_.nonEmpty)) == toks &&
        out.forall(p => p.split(" ").count(_.nonEmpty) <= win)
    }
    check("tokenWindows", prop, n = 15)
  }

  test("property: tokenChunks are stride-offset slices covering every token") {
    val genText = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dddd"))
      .map(_.mkString(" "))
    val prop = Prop.forAll(genText, Gen.chooseNum(1, 6), Gen.chooseNum(1, 6)) {
      (text, x, y) =>
        val win = math.max(x, y); val stride = math.min(x, y)
        val out = Seq(Tuple1(text)).toDF("text")
          .select(explode(graft.functions.TextFunctions
            .tokenChunks(col("text"), win, stride)).as("c"))
          .as[String].collect().toSeq
        val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
        val slicesOk = out.zipWithIndex.forall { case (c, i) =>
          c == toks.slice(i * stride, i * stride + win).mkString(" ")
        }
        val covered = out.zipWithIndex
          .flatMap { case (_, i) => i * stride until math.min(i * stride + win, toks.size) }
          .toSet
        slicesOk && covered == toks.indices.toSet &&
          (stride != win || out == Seq(Tuple1(text)).toDF("text")
            .select(explode(graft.functions.TextFunctions
              .tokenWindows(col("text"), win)).as("c")).as[String].collect().toSeq)
    }
    check("tokenChunks", prop, n = 15)
  }

  test("property: bloom-pruned newRows equals the anti join for any key mix") {
    val genKeys = Gen.listOfN(25, Gen.chooseNum(0L, 30L))
    val prop = Prop.forAll(genKeys, genKeys, Gen.oneOf(0.01, 0.2, 0.4)) {
      (stateKeys, batchKeys, fpp) =>
        val state = stateKeys.toDF("k")
        val batch = batchKeys.zipWithIndex.map { case (k, i) => (k, i) }
          .toDF("k", "row")
        val got = graft.dedup.Ingest.newRows(state, batch, "k",
            expectedStateKeys = math.max(stateKeys.size.toLong, 1L), fpp = fpp)
          .as[(Long, Int)].collect().sorted.toSeq
        val want = batch.join(state, Seq("k"), "left_anti")
          .as[(Long, Int)].collect().sorted.toSeq
        got == want
    }
    check("newRows", prop, n = 10)
  }

  test("property: retraction subtracts to the survivors' counts for any removal subset") {
    import graft.operators.Retraction
    // keys drawn from a small alphabet so collisions (the interesting
    // case) are common; the removal set is a random sub-multiset
    val genKeys = Gen.listOfN(50, Gen.chooseNum(0L, 11L))
    val genMask = Gen.listOfN(50, Gen.prob(0.4))
    val prop = Prop.forAll(genKeys, genMask) { (keys, mask) =>
      val removedKeys = keys.zip(mask).collect { case (k, true) => k }
      val survivors = keys.zip(mask).collect { case (k, false) => k }
      def counts(ks: Seq[Long]) = ks.toDF("k").groupBy("k").agg(count(lit(1)).as("n"))
      val got = Retraction.subtract(counts(keys), counts(removedKeys), Seq("k"), "n")
        .as[(Long, Long)].collect().sorted.toSeq
      val direct = counts(survivors).as[(Long, Long)].collect().sorted.toSeq
      got == direct
    }
    check("retraction", prop, n = 10)
  }

  test("property: CMS inner product is symmetric and never undercounts the true join size") {
    import graft.functions.expr.Fnv64.fnv64
    import graft.operators.CountMin
    val genSide = Gen.listOfN(60, Gen.chooseNum(0, 25))
    val prop = Prop.forAll(genSide, genSide) { (l, r) =>
      def state(ks: Seq[Int]): Array[Byte] =
        ks.map(i => s"k_$i").toDF("v").select(fnv64(col("v")).as("h"))
          .agg(CountMin.cmsState(col("h"), 4, 512).as("st"))
          .head().getAs[Array[Byte]](0)
      val (sl, sr) = (state(l), state(r))
      val est = CountMin.cmsInnerProductOf(sl, sr, 4, 512)
      val lc = l.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val rc = r.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val exact = lc.keys.map(k => lc(k) * rc.getOrElse(k, 0L)).sum
      est == CountMin.cmsInnerProductOf(sr, sl, 4, 512) && est >= BigInt(exact)
    }
    check("cmsInnerProduct", prop, n = 8)
  }

  test("property: sample-state merge is split-invariant (any partition of the input)") {
    import graft.operators.Sampling
    val genIds = Gen.listOfN(80, Gen.chooseNum(0L, 10000L)).map(_.distinct)
    val genCut = Gen.listOfN(80, Gen.chooseNum(0, 2))
    val prop = Prop.forAll(genIds, genCut, Gen.chooseNum(1, 30)) { (ids, cut, k) =>
      val parts = (0 to 2).map(p =>
        ids.zip(cut).collect { case (id, c) if c == p => id })
      val incs = parts.filter(_.nonEmpty).map(p =>
        Sampling.uniformSampleState(p.toDF("id"), "id", k))
      val onePass = Sampling.uniformSampleState(ids.toDF("id"), "id", k)
        .as[Long].collect().toSeq
      incs.isEmpty ||
        Sampling.mergeSampleStates(incs, "id", k).as[Long].collect().toSeq == onePass
    }
    check("sampleMerge", prop, n = 8)
  }

  test("property: jaccard_sim equals the set-arithmetic reference on random arrays") {
    // small alphabet forces overlaps, duplicates, and empty arrays
    val genArr = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e")).map(_.take(12))
    val prop = Prop.forAll(genArr, genArr) { (xs, ys) =>
      val got = Seq((xs, ys)).toDF("a", "b")
        .select(graft.functions.expr.JaccardSim.jaccard_sim(col("a"), col("b")))
        .head().getDouble(0)
      val (sa, sb) = (xs.toSet, ys.toSet)
      val want =
        if (sa.isEmpty && sb.isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      got == want
    }
    check("jaccard_sim", prop, n = 20)
  }

  test("property: BPE join-form encode equals the per-occurrence fold on random corpora") {
    // the r9 rewrite moved BpeVocab.encode from fold-per-token-occurrence
    // to fold-per-distinct-word + join; this pins the two formulations
    // equal on random text over a tiny alphabet (dense repeats, so merges
    // learned on doc 0 genuinely fire — and fail to fire — on others)
    val genWord = Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val genDoc = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))
    val prop = Prop.forAll(Gen.listOfN(4, genDoc), Gen.chooseNum(1, 3)) {
      (docsRaw, k) =>
        val docs = docsRaw.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "txt")
        val (merges, words) = graft.search.BpeVocab.learnMerges(docs, "txt", k)
        words.unpersist(blocking = false)
        val joinForm = graft.search.BpeVocab.encode(docs, "id", "txt", merges)
          .as[(Long, Long, Long, Long)].collect().sorted.toSeq
        // reference: the pre-r9 per-occurrence fold, inlined
        val toks = graft.functions.TextFunctions.tokens(col("txt"))
        val enc = merges.foldLeft(
          transform(toks, t => transform(sequence(lit(1), length(t)),
            i => t.substr(i, lit(1))))) { case (acc, m) =>
          transform(acc, s => graft.search.BpeVocab.mergeOnce(s, m.left, m.right))
        }
        val foldForm = docs.select(col("id"),
            size(toks).cast("long").as("n_tokens"),
            aggregate(toks, lit(0L), (a, t) => a + length(t)).as("n_chars"),
            aggregate(enc, lit(0L), (a, s) => a + size(s)).as("n_bpe_syms"))
          .as[(Long, Long, Long, Long)].collect().sorted.toSeq
        joinForm == foldForm
    }
    check("bpeEncodeForms", prop, n = 8)
  }

  test("property: batched BPE training equals classic one-at-a-time BPE") {
    // tiny alphabet + short words: dense pair-count ties, self-pairs
    // (aa), and hot shared symbols — exactly the cases the batched
    // acceptance rule (symbol-disjoint prefix, strict count drop) must
    // survive; batchTop=3 forces the LIMIT-truncation bound path too
    val genWord = Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val genDoc = Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))
    val prop = Prop.forAll(Gen.listOfN(3, genDoc), Gen.chooseNum(1, 6),
      Gen.oneOf(3, 64)) { (docsRaw, k, batchTop) =>
      val docs = docsRaw.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "txt")
      val (seqM, w1) = graft.search.BpeVocab.learnMerges(docs, "txt", k)
      val (batM, w2) = graft.search.BpeVocab.learnMergesBatched(
        docs, "txt", k, batchTop)
      val sameWords = w1.orderBy("word").collect().toSeq ==
        w2.orderBy("word").collect().toSeq
      w1.unpersist(blocking = false); w2.unpersist(blocking = false)
      seqM == batM && sameWords
    }
    check("bpeBatchedTraining", prop, n = 25)
  }

  test("property: priorityKeyOf mirrors the column-form priority key bit-for-bit") {
    val genRow = Gen.zip(Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(1L, 1000000L))
    val prop = Prop.forAll(Gen.listOfN(30, genRow)) { rows =>
      val df = rows.distinctBy(_._1).toDF("id", "w")
      val fromColumn = df.select(col("id"),
          graft.operators.Sampling.priorityKey("id", "w").as("k"))
        .as[(Long, Long)].collect().toMap
      rows.distinctBy(_._1).forall { case (id, w) =>
        graft.operators.Sampling.priorityKeyOf(id, w) == fromColumn(id)
      }
    }
    check("priorityKeyOf", prop, n = 10)
  }
}
