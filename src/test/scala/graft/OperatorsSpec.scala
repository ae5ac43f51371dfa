package graft

import graft.operators.{Aggregates, Dedup, Windows}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("latestPerKey: deterministic winner incl. timestamp ties") {
    val df = Seq(
      (1, ts("2021-01-01 00:00:00"), "old"),
      (1, ts("2021-02-01 00:00:00"), "new"),
      (2, ts("2021-01-01 00:00:00"), "tie-a"),
      (2, ts("2021-01-01 00:00:00"), "tie-b"))
      .toDF("k", "t", "v")
    // tie broken by v desc -> "tie-b" must win, every run
    val out = Dedup.latestPerKey(df, Seq("k"), Seq(col("t").desc, col("v").desc))
      .orderBy("k").select("k", "v").as[(Int, String)].collect()
    assert(out === Seq((1, "new"), (2, "tie-b")))
  }

  test("mergeIncremental: delta overrides state per key, union by name") {
    val state = Seq((1, ts("2021-01-01 00:00:00"), "a"), (2, ts("2021-01-01 00:00:00"), "b"))
      .toDF("k", "t", "v")
    val delta = Seq((2, ts("2021-02-01 00:00:00"), "b2"), (3, ts("2021-02-01 00:00:00"), "c"))
      .toDF("k", "t", "v")
    val out = Dedup.mergeIncremental(state, delta, Seq("k"), Seq(col("t").desc, col("k")))
      .orderBy("k").select("k", "v").as[(Int, String)].collect()
    assert(out === Seq((1, "a"), (2, "b2"), (3, "c")))
  }

  test("sessionize: new session after gap, per key") {
    val df = Seq(
      ("u1", ts("2021-01-01 10:00:00")),
      ("u1", ts("2021-01-01 10:10:00")),  // <30min -> same session
      ("u1", ts("2021-01-01 11:00:00")),  // 50min gap -> new session
      ("u2", ts("2021-01-01 10:00:00")))
      .toDF("user", "t")
    val out = Windows.sessionize(df, "user", "t", gapSeconds = 1800)
      .orderBy("user", "t").select("user", "session_seq")
      .as[(String, Long)].collect()
    assert(out === Seq(("u1", 1L), ("u1", 1L), ("u1", 2L), ("u2", 1L)))
  }

  test("shareOfTotal sums to 1 and has no single-partition window") {
    val df = (1 to 100).map(i => (s"g${i % 4}", i)).toDF("g", "x")
    val out = Aggregates.shareOfTotal(df, Seq("g"))
    assert(math.abs(out.agg(sum("share")).as[Double].head() - 1.0) < 1e-6)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), "share-of-total must not use a global window")
  }

  test("distinctCountHistogram matches a hand computation") {
    val df = Seq(("u1", "a"), ("u1", "b"), ("u1", "a"), ("u2", "a"), ("u3", "a"), ("u3", "b"))
      .toDF("k", "v")
    val out = Aggregates.distinctCountHistogram(df, "k", "v")
      .orderBy("n_distinct").as[(Long, Long)].collect()
    assert(out === Seq((1L, 1L), (2L, 2L))) // one key saw 1 value; two keys saw 2
  }

  test("saltedJoin matches a plain join on skewed data") {
    import graft.operators.Skew
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i))
      .toDF("k", "v")
    val right = (0L to 6L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = left.join(right, "k")
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 8)
    assert(salted.count() === plain.count())
    assert(salted.agg(sum("v")).as[Long].head() === plain.agg(sum("v")).as[Long].head())
  }

  test("saltedCount matches a plain groupBy count") {
    import graft.operators.Skew
    val df = (1 to 1000).map(i => (s"k${i % 3}", i)).toDF("k", "v")
    val got = Skew.saltedCount(df, "k").orderBy("k").as[(String, Long)].collect()
    val want = df.groupBy("k").count().orderBy("k").as[(String, Long)].collect()
    assert(got.toSeq === want.toSeq)
  }

  test("topK plans TakeOrderedAndProject (no global sort shuffle)") {
    val df = (1 to 1000).map(i => (i, i * 2)).toDF("a", "b")
    val top = Aggregates.topK(df, Seq(col("b").desc), 5)
    assert(top.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    assert(top.select("a").as[Int].collect().toSeq === Seq(1000, 999, 998, 997, 996))
  }

  test("asofBackward: latest prior match, inclusive at equal ts, tie-broken") {
    import graft.operators.TemporalJoins
    val quotes = Seq( // (key, ts, quote_id)
      (1, ts("2021-01-01 09:00:00"), 10L),
      (1, ts("2021-01-01 10:00:00"), 11L),
      (1, ts("2021-01-01 10:00:00"), 12L), // tie at 10:00 -> greatest id wins
      (1, ts("2021-01-01 12:00:00"), 13L),
      (2, ts("2021-01-01 09:30:00"), 20L))
      .toDF("k", "t", "quote_id")
    val trades = Seq( // (key, ts, trade_id)
      (1, ts("2021-01-01 08:00:00"), 100L), // before any quote -> null
      (1, ts("2021-01-01 10:00:00"), 101L), // equal ts -> inclusive, tie -> 12
      (1, ts("2021-01-01 11:59:59"), 102L), // between -> 12
      (1, ts("2021-01-01 23:00:00"), 103L), // after last -> 13
      (2, ts("2021-01-01 09:31:00"), 200L), // other key -> 20
      (3, ts("2021-01-01 09:31:00"), 300L)) // key with no quotes -> null
      .toDF("k", "t", "trade_id")
    val out = TemporalJoins.asofBackward(trades, quotes, Seq("k"), "t", "t",
        payloadCols = Seq("quote_id"), tieCol = "quote_id")
      .select(col("trade_id"), col("asof.quote_id").as("q"))
      .orderBy("trade_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq === Seq((100L, -1L), (101L, 12L), (102L, 12L),
      (103L, 13L), (200L, 20L), (300L, -1L)))
  }

  test("packBins: offset packing is deterministic and capacity-bounded") {
    import graft.operators.SequencePacking
    val docs = Seq( // (group, id, tokens) — cumulative: 100,250,350,390,600
      ("g", 1L, 100L), ("g", 2L, 150L), ("g", 3L, 100L), ("g", 4L, 40L),
      ("g", 5L, 210L), ("h", 9L, 500L))
      .toDF("grp", "doc_id", "n_tokens")
    val out = SequencePacking.packBins(docs, Seq("grp"), Seq(col("doc_id")),
        "n_tokens", budget = 256L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // exclusive prefix sums: 0,100,250,350,390 -> bins 0,0,0,1,1; h: 0 -> 0
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 9L -> 0L))
    // capacity property: every bin's total < budget + its largest doc
    val bins = SequencePacking.packBins(docs, Seq("grp"), Seq(col("doc_id")),
        "n_tokens", 256L)
      .groupBy("grp", "bin")
      .agg(sum("n_tokens").as("t"), max("n_tokens").as("m"))
      .as[(String, Long, Long, Long)].collect()
    bins.foreach { case (g, b, t, m) =>
      assert(t < 256L + m, s"bin ($g,$b) total $t exceeds budget+maxdoc") }
  }

  test("packByLengthBucket: no-straddle bins never exceed budget, full bins > 50%") {
    import graft.operators.SequencePacking
    val rnd = new scala.util.Random(5)
    val docs = ((1 to 400).map(i => ("g", i.toLong, 1L + rnd.nextInt(512).toLong)) :+
      (("g", 999L, 2000L)) :+ // oversize: own bin
      (("g", 998L, 0L)))      // nonpositive: null bucket/bin
      .toDF("grp", "doc_id", "n_tokens")
    val out = SequencePacking.packByLengthBucket(docs, Seq("grp"),
      Seq(col("doc_id")), "n_tokens", budget = 512L)

    // null-propagation: unknown length -> unknown bin, row kept
    val z = out.filter(col("doc_id") === 998L)
      .select("len_bucket", "bin").collect().head
    assert(z.isNullAt(0) && z.isNullAt(1))
    // oversize doc: bucket -1, alone in its bin
    val over = out.filter(col("len_bucket") === -1)
    assert(over.count() === 1 && over.select("doc_id").as[Long].head() === 999L)

    val bins = out.filter(col("len_bucket") >= 0)
      .groupBy("len_bucket", "bin")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("nd"))
      .as[(Int, Long, Long, Long)].collect()
    assert(bins.nonEmpty)
    bins.foreach { case (k, b, t, nd) =>
      assert(t <= 512L, s"bin (k=$k,$b) total $t exceeds budget 512")
      assert(nd <= (1L << k), s"bin (k=$k,$b) holds $nd docs > 2^$k")
      if (nd == (1L << k)) // full bin: every doc > budget >> (k+1)
        assert(t > 256L, s"full bin (k=$k,$b) at $t is under half-utilized")
    }
    // determinism: a reshuffled input packs identically
    val again = SequencePacking.packByLengthBucket(docs.repartition(7),
        Seq("grp"), Seq(col("doc_id")), "n_tokens", 512L)
      .filter(col("bin").isNotNull)
      .select("doc_id", "len_bucket", "bin").as[(Long, Int, Long)].collect().toSet
    val first = out.filter(col("bin").isNotNull)
      .select("doc_id", "len_bucket", "bin").as[(Long, Int, Long)].collect().toSet
    assert(again === first)
  }

  test("gopherGate: each rule fires on its planted violation, clean text keeps") {
    import graft.operators.QualitySignals
    val clean = ("the cat sat with a dog and that was fine because " +
      "everyone there liked honest sentences about small things ") * 3
    val docs = Seq(
      (1L, clean),                                     // keep
      (2L, "the and a"),                               // too short -> bit 0
      (3L, ("xx " * 40) + "the a and"),                // mean len < 3 -> bit 1
      (4L, Seq.fill(40)("wonderful").mkString(" ")),   // no stopwords -> bit 2
      (5L, (1 to 30).map(i => s"- item$i the a of and item item item")
        .mkString("\n")),                              // all bullet lines -> bit 3
      (6L, (1 to 30).map(i => s"the a of and teaser number $i goes on...")
        .mkString("\n")),                              // all ellipsis lines -> bit 4
      (7L, null.asInstanceOf[String]))                 // unknown -> null mask
      .toDF("doc_id", "text")
    val out = QualitySignals.gopherGate(docs, "doc_id", "text", minTokens = 20)
      .orderBy("doc_id").collect()
    def mask(i: Int) = if (out(i).isNullAt(2)) -1L else out(i).getLong(2)
    assert(mask(0) === 0L, s"clean doc flagged: ${mask(0)}")
    assert(out(0).getBoolean(3))
    assert((mask(1) & 1L) !== 0L, "short doc must trip the token-count bit")
    assert((mask(2) & 2L) !== 0L, s"xx-doc must trip mean-word-length, got ${mask(2)}")
    assert((mask(3) & 4L) !== 0L, "stopword-free doc must trip the stopword bit")
    assert((mask(4) & 8L) !== 0L, "bullet doc must trip the bullet-share bit")
    assert((mask(5) & 16L) !== 0L, "ellipsis doc must trip the ellipsis-share bit")
    assert(out(6).isNullAt(1) && out(6).isNullAt(2) && out(6).isNullAt(3),
      "null text must null-propagate, not pass or fail")
  }

  test("intervalOverlapJoin equals the brute-force overlap join, each pair once") {
    import graft.operators.TemporalJoins
    val rnd = new scala.util.Random(17)
    def ivs(idName: String, sName: String, eName: String) =
      (1 to 300).map { i =>
        val s = rnd.nextInt(10000).toLong
        (s"k${rnd.nextInt(5)}", i.toLong, s, s + rnd.nextInt(500))
      }.toDF("k", idName, sName, eName)
    val left = ivs("lid", "ls", "le")
    val right = ivs("rid", "rs", "re")

    val out = TemporalJoins.intervalOverlapJoin(left, right, Seq("k"),
        "ls", "le", "rs", "re", binTicks = 256)
      .select("k", "lid", "rid").as[(String, Long, Long)].collect()
    assert(out.length === out.toSet.size, "a pair must be emitted exactly once")
    val brute = left.join(right, "k")
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("k", "lid", "rid").as[(String, Long, Long)].collect().toSet
    assert(out.toSet === brute)

    // unknown/malformed spans cannot conflict: null endpoint and
    // inverted interval rows are dropped, not raised, not matched
    val weird = Seq(("k0", 900L, Some(10L), None: Option[Long]),
      ("k0", 901L, Some(100L), Some(50L)))
      .toDF("k", "lid", "ls", "le")
    assert(TemporalJoins.intervalOverlapJoin(weird, right, Seq("k"),
      "ls", "le", "rs", "re", 256).count() === 0)

    // one wild interval fails loudly instead of exploding a task
    val wild = Seq(("k0", 1L, 0L, Long.MaxValue / 2)).toDF("k", "lid", "ls", "le")
    val e = intercept[Exception] {
      TemporalJoins.intervalOverlapJoin(wild, right, Seq("k"),
        "ls", "le", "rs", "re", 256).count()
    }
    assert(e.getMessage != null)
  }

  test("quantizeInt8: range, zero-vector guard, bounded dequantization error") {
    import graft.functions.VectorFunctions
    val vecs = Seq(
      (1L, Seq(0.5f, -1.5f, 3.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),   // all-zero -> q all zero, scale 0
      (3L, Seq(-0.001f, 0.001f, 0.0005f, -0.0002f)))
      .toDF("id", "v")
    val out = vecs.select(col("id"),
        VectorFunctions.quantizeInt8(col("v")).as("q"),
        VectorFunctions.quantizeScale(col("v")).as("s"))
      .as[(Long, Seq[Int], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // scale = 127/3; -1.5*scale = -63.5 -> floor(-63.5 + 0.5) = -63
    // (half rounds toward +inf — the documented floor(x+0.5) rule)
    assert(out(1L)._1 === Seq(21, -63, 127, 0))
    assert(out(2L)._1 === Seq(0, 0, 0, 0) && out(2L)._2 === 0.0)
    out.foreach { case (_, (q, _)) =>
      assert(q.forall(x => x >= -127 && x <= 127)) }
    // dequantization error <= half a quantization step per component
    val (q3, s3) = out(3L)
    val orig = Seq(-0.001f, 0.001f, 0.0005f, -0.0002f)
    q3.zip(orig).foreach { case (qi, x) =>
      assert(math.abs(qi / s3 - x) <= 0.5 / s3 + 1e-12) }

    // null elements survive as null (a missing dimension must not become a
    // legitimate zero weight) and don't perturb the scale
    val withNull = Seq((9L, Seq[Option[Float]](Some(1.0f), None, Some(-2.0f))))
      .toDF("id", "v")
      .select(VectorFunctions.quantizeInt8(col("v")).as("q"))
      .as[Seq[Option[Int]]].head()
    assert(withNull === Seq(Some(64), None, Some(-127))) // scale = 127/2
  }

  test("sampling: deterministic, quota-exact per group, rate-proportional") {
    import graft.operators.Sampling
    val df = (0 until 300).map(i => (s"g${i % 3}", i.toLong)).toDF("grp", "id")
    val s1 = Sampling.quotaPerGroup(df, Seq("grp"), "id", 10)
      .as[(String, Long)].collect().toSet
    val s2 = Sampling.quotaPerGroup(df, Seq("grp"), "id", 10)
      .as[(String, Long)].collect().toSet
    assert(s1 === s2, "quota sample must be reproducible")
    assert(s1.groupBy(_._1).forall(_._2.size == 10), "exactly quota rows per group")
    val r = Sampling.sampleByRate(df, "id", 0.2).count()
    assert(r > 20 && r < 100, s"rate 0.2 of 300 rows sampled $r — far off proportion")
    assert(Sampling.sampleByRate(df, "id", 0.2).as[(String, Long)].collect().toSet
      === Sampling.sampleByRate(df, "id", 0.2).as[(String, Long)].collect().toSet)
  }

  test("contiguousIds: row_number semantics without the single-task window") {
    import graft.operators.Reindex
    val df = (0 until 1000).map(i => ((i * 37) % 1000, s"r$i")).toDF("k", "v")
      .repartition(7)
    val out = Reindex.contiguousIds(df, Seq(col("k"), col("v")))
    val got = out.orderBy("new_id").as[(Int, String, Long)].collect().toSeq
    assert(got.map(_._3) == (0L until 1000L), "ids are contiguous 0..n-1")
    assert(got.map(_._1) == got.map(_._1).sorted, "ids follow the order columns")
    // Parallelism contract: an explicit partition count is honored end to
    // end (the default call lets AQE size the range shuffle, which on a
    // 1000-row fixture may legitimately coalesce to one tiny partition —
    // the point is the operator never FORCES a single-task global window).
    val par = Reindex.contiguousIds(df, Seq(col("k"), col("v")),
      numPartitions = Some(5))
    assert(par.rdd.getNumPartitions === 5,
      "reindex must stay parallel end to end when parallelism is requested")
    assert(par.orderBy("new_id").as[(Int, String, Long)].collect().toSeq == got,
      "ids are independent of partitioning")
    val naive = df.withColumn("new_id", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("v"))))
    assert(naive.rdd.getNumPartitions === 1,
      "(the naive global window this replaces degenerates to one partition)")
    val again = Reindex.contiguousIds(df, Seq(col("k"), col("v")))
      .orderBy("new_id").as[(Int, String, Long)].collect().toSeq
    assert(got == again, "reindex is deterministic run over run")
  }

  test("upsample: deterministic fractional repetition with dense copy_idx") {
    import graft.operators.Sampling
    val df = (0 until 200).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val wt = when(col("grp") === "a", 2.5).otherwise(0.5)
    def run() = Sampling.upsample(df, "id", wt)
      .as[(Long, String, Int)].collect().sortBy(t => (t._1, t._3)).toSeq
    val u1 = run()
    assert(u1 == run(), "upsample must be reproducible")
    val groups = u1.groupBy(_._1).values.toSeq
    assert(groups.forall(g => g.map(_._3).sorted == (0 until g.size)),
      "copy_idx must be dense 0..n-1 per source row")
    assert(u1.filter(_._2 == "a").groupBy(_._1).values
      .forall(g => g.size == 2 || g.size == 3), "weight 2.5 -> 2 or 3 copies")
    assert(u1.filter(_._2 == "b").groupBy(_._1).values.forall(_.size == 1),
      "weight 0.5 -> kept rows appear exactly once")
    val aCopies = u1.count(_._2 == "a") / 100.0
    val bKept = u1.count(_._2 == "b") / 100.0
    assert(aCopies > 2.2 && aCopies < 2.8, s"expected ~2.5 copies, got $aCopies")
    assert(bKept > 0.3 && bKept < 0.7, s"expected ~0.5 kept, got $bKept")
    assert(Sampling.upsample(df, "id", lit(0.0)).count() == 0, "weight 0 drops all")
    assert(Sampling.upsample(df.limit(1), "id", lit(1e9), maxCopies = 4).count() == 4,
      "maxCopies bounds the fan-out")
  }

  test("mixtureToTarget: explicit shares, saturation, absent-group drop") {
    import graft.operators.Sampling
    val df = ((0 until 800).map(i => ("web", i.toLong)) ++
      (1000 until 1050).map(i => ("books", i.toLong)) ++
      (2000 until 2100).map(i => ("junk", i.toLong))).toDF("grp", "id")
    val tgt = Map("web" -> 500000L, "books" -> 500000L)
    val out = Sampling.mixtureToTarget(df, "grp", "id", tgt, budgetRows = 200L)
      .as[(String, Long)].collect()
    assert(!out.exists(_._1 == "junk"), "no target share -> dropped")
    assert(out.count(_._1 == "books") === 50,
      "rate saturates at 1e6: undersized group kept whole, never upsampled")
    val web = out.count(_._1 == "web")
    assert(web > 50 && web < 160, s"expected ~100 of 800 web rows, got $web")
    val again = Sampling.mixtureToTarget(df, "grp", "id", tgt, 200L)
      .as[(String, Long)].collect()
    assert(out.toSet === again.toSet, "mixture sample must be reproducible")
    intercept[IllegalArgumentException] {
      Sampling.mixtureToTarget(df, "grp", "id",
        Map("a" -> 600000L, "b" -> 600000L), 10L)
    }
  }

  test("temperatureSample: deterministic, flattens the mix toward rare groups") {
    import graft.operators.Sampling
    // skewed mix: 800 common rows, 80 rare
    val df = ((0 until 800).map(i => ("common", i.toLong)) ++
      (1000 until 1080).map(i => ("rare", i.toLong))).toDF("grp", "id")
    val s1 = Sampling.temperatureSample(df, Seq("grp"), "id", fraction = 0.3, alpha = 0.5)
      .as[(String, Long)].collect().toSet
    val s2 = Sampling.temperatureSample(df, Seq("grp"), "id", fraction = 0.3, alpha = 0.5)
      .as[(String, Long)].collect().toSet
    assert(s1 === s2, "temperature sample must be reproducible")
    val byGrp = s1.groupBy(_._1).view.mapValues(_.size).toMap
    val commonRate = byGrp.getOrElse("common", 0) / 800.0
    val rareRate = byGrp.getOrElse("rare", 0) / 80.0
    assert(rareRate > commonRate,
      f"alpha<1 must keep rare groups at a higher rate (rare $rareRate%.2f vs common $commonRate%.2f)")
    // expected total is fraction * n (binomial-ish tolerance)
    assert(s1.size > 880 * 0.15 && s1.size < 880 * 0.45,
      s"sampled ${s1.size} of 880 at fraction 0.3 — far off expectation")
    // alpha = 1 reduces to a uniform per-group rate: thresholds identical
    val uni = Sampling.temperatureSample(df, Seq("grp"), "id", fraction = 0.3, alpha = 1.0)
      .as[(String, Long)].collect().toSet
    val uniCommon = uni.count(_._1 == "common") / 800.0
    val uniRare = uni.count(_._1 == "rare") / 80.0
    assert(math.abs(uniCommon - uniRare) < 0.1,
      f"alpha=1 should sample both groups at ~the same rate ($uniCommon%.2f vs $uniRare%.2f)")
    // alpha = 0 targets EQUAL expected rows per group (fraction*n/G = 132
    // each): the 80-row rare group caps at rate 1 and is kept whole
    val eq = Sampling.temperatureSample(df, Seq("grp"), "id", fraction = 0.3, alpha = 0.0)
      .as[(String, Long)].collect()
    assert(eq.count(_._1 == "rare") === 80,
      "alpha=0: rare group should cap at keep-rate 1 and survive entirely")
    val eqCommon = eq.count(_._1 == "common")
    assert(math.abs(eqCommon - 132) <= 40,
      s"alpha=0: common group expected ~132 rows, got $eqCommon")
  }

  test("tokenWindows: fixed-size non-overlapping passages, ragged tail kept") {
    import graft.functions.TextFunctions
    val rows = Seq(
      (1L, (0 until 7).map(i => s"w$i").mkString(" ")), // 7 toks / win 3 -> 3,3,1
      (2L, "one two"),                                  // shorter than one window
      (3L, "   "),                                      // whitespace-only -> no passages
      (4L, "a  b\tc d")                                 // mixed whitespace collapses
    ).toDF("id", "text")
    val got = rows.select($"id", TextFunctions.tokenWindows($"text", 3).as("p"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("w0 w1 w2", "w3 w4 w5", "w6"))
    assert(got(2L) === Seq("one two"))
    assert(got(3L) === Seq.empty)
    assert(got(4L) === Seq("a b c", "d"))
  }

  test("repetition signals: hand-computed TTR and bigram concentration") {
    import graft.operators.QualitySignals
    val docs = Seq(
      (1L, "a a a a b"),     // toks 5, dist 2; bigrams: "a a"x3, "a b" -> total 4
      (2L, "w x y z"),       // all distinct
      (3L, "solo"),          // no bigrams -> null fractions
      (4L, "")               // no tokens -> ttr 0 (guarded denominator)
    ).toDF("doc_id", "text")
    val got = QualitySignals.repetition(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Double, Option[Double], Option[Double])].collect()
    assert(got(0) === ((1L, 0.4, Some(0.75), Some(0.5))))
    assert(got(1) === ((2L, 1.0, Some(1.0 / 3).map(x => math.rint(x * 1e6) / 1e6), Some(0.0))))
    assert(got(2) === ((3L, 1.0, None, None)))
    assert(got(3) === ((4L, 0.0, None, None)))
  }

  test("noveltyByDf: df-1 shingle share, hand-computed; shingle-less docs absent") {
    import graft.operators.QualitySignals
    val docs = Seq(
      (1L, "a b c d"),  // shingles {a b c, b c d}; "a b c" shared with doc 2
      (2L, "a b c x"),
      (3L, "z z z z"),  // distinct-shingle set is just {z z z}
      (4L, "q w"))      // too short for 3-shingles
      .toDF("doc_id", "text")
    val got = QualitySignals.noveltyByDf(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").as[(Long, Double, Long)].collect().toSeq
    assert(got === Seq((1L, 0.5, 2L), (2L, 0.5, 2L), (3L, 1.0, 1L)))
  }

  test("percentileGate: rank-based per-group cutoff, singleton groups gate out") {
    import graft.operators.QualitySignals
    val df = ((1L to 8L).map(i => (i, "a", i * 10)) :+ ((9L, "b", 999L)))
      .toDF("id", "grp", "score")
    val got = QualitySignals.percentileGate(df, Seq("grp"), "score", "id", 0.75)
      .select("id").as[Long].collect().toSet
    // group a: percent_rank = (rank-1)/7 >= 0.75 -> ranks 7 and 8;
    // group b: single row has percent_rank 0 -> gated out
    assert(got === Set(7L, 8L))
  }

  test("epochOrder: a distinct deterministic permutation per epoch, no copies") {
    import graft.operators.Sampling
    val df = (0L until 500L).toDF("id")
    def run() = Sampling.epochOrder(df, "id", epochs = 3)
      .as[(Long, Int, Long)].collect().toSeq
    val out = run()
    assert(out === run(), "manifest must be retry-stable")
    val byEpoch = out.groupBy(_._2).view.mapValues(
      _.sortBy(r => (r._3, r._1)).map(_._1)).toMap
    assert(byEpoch.keySet === Set(0, 1, 2))
    byEpoch.values.foreach(p =>
      assert(p.sorted == (0L until 500L), "each epoch is a full permutation"))
    assert(byEpoch(0) != byEpoch(1) && byEpoch(1) != byEpoch(2),
      "epochs must order differently")
  }

  test("funnel: first-completion ordering, prefix counting, one shuffle") {
    import graft.operators.Funnel
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val ev = Seq(
      ("a", ts(1), "signup"), ("a", ts(2), "view"), ("a", ts(3), "purchase"),
      // b: the view BEFORE signup must not count; the one after does
      ("b", ts(1), "view"), ("b", ts(2), "signup"), ("b", ts(3), "view"),
      ("b", ts(5), "purchase"),
      // c: purchase exists but precedes any view -> funnel stops at signup
      ("c", ts(5), "signup"), ("c", ts(1), "purchase"),
      // d: never enters the funnel but has events -> all-null row
      ("d", ts(1), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.firstCompletion(ev, "user_id", "ts", "event_type",
      Seq("signup", "view", "purchase"))
    val got = out.orderBy("user_id")
      .select(col("user_id"), unix_micros(col("t_signup")),
        unix_micros(col("t_view")), unix_micros(col("t_purchase")),
        col("steps_completed"))
      .as[(String, Option[Long], Option[Long], Option[Long], Int)]
      .collect().toSeq
    def us(min: Int) = Some(min * 60000000L)
    assert(got === Seq(
      ("a", us(1), us(2), us(3), 3),
      ("b", us(2), us(3), us(5), 3),
      ("c", us(5), None, None, 1),
      ("d", None, None, None, 0)))
    // all k window passes + the collapse ride ONE hash exchange
    val shuffles = out.queryExecution.executedPlan.toString
      .linesIterator.count(l => l.contains("Exchange hashpartitioning"))
    assert(shuffles === 1, s"funnel must shuffle once, saw $shuffles")
  }

  test("rangeJoin matches the naive inequality join, including bin boundaries") {
    import graft.operators.TemporalJoins
    // timestamps straddling day-bin boundaries at second precision
    val rnd = new scala.util.Random(11)
    val base = ts("2021-01-01 00:00:00").getTime
    val left = (0 until 40).map(i =>
        (i % 3, new java.sql.Timestamp(base + rnd.nextInt(400000) * 1000L), i.toLong))
      .toDF("k", "lt", "lid")
    val right = (0 until 80).map(i =>
        (i % 3, new java.sql.Timestamp(base + rnd.nextInt(400000) * 1000L), i.toLong))
      .toDF("k", "rt", "rid")
    val got = TemporalJoins.rangeJoin(left, right, Seq("k"), "lt", "rt",
        lowerSec = -86400L, upperSec = 0L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = left.join(right, Seq("k"))
      .filter(col("rt") >= col("lt") - expr("INTERVAL '86400' SECOND") &&
        col("rt") <= col("lt"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty, "vacuous fixture")
  }

  test("tokenBudgetPerGroup: hash-order prefix per group, first doc always admitted") {
    import graft.operators.Sampling
    val df = (1L to 40L).map(id => (if (id % 2 == 0) "a" else "b", id, 10L + id % 7))
      .toDF("grp", "id", "toks")
    val got = Sampling.tokenBudgetPerGroup(df, Seq("grp"), "id", "toks", budget = 60L)
      .select("grp", "id").as[(String, Long)].collect().toSet
    // replay the admission rule with the same hash, per group
    def h(id: Long): Long = (id % 1000000007L) * 2654435761L % 4294967296L
    val want = (1L to 40L).map(id => (if (id % 2 == 0) "a" else "b", id, 10L + id % 7))
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        var cum = 0L
        rows.sortBy(r => (h(r._2), r._2)).flatMap { r =>
          val admit = cum < 60L; cum += r._3
          if (admit) Some((g, r._2)) else None
        }
      }.toSet
    assert(got === want)
    assert(got.size < 40 && got.size > 2, "vacuous budget: admits all or ~none")
    // a budget smaller than any doc still ships exactly one doc per group
    val tiny = Sampling.tokenBudgetPerGroup(df, Seq("grp"), "id", "toks", budget = 1L)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(tiny === Map("a" -> 1L, "b" -> 1L))
  }

  test("representatives: best score wins, ties to min id, singletons survive") {
    import graft.dedup.Clusters
    val docs = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.2), (5L, 0.1), (6L, 0.1))
      .toDF("doc_id", "quality")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "cluster_id")
    val got = Clusters.representatives(docs, "doc_id", clusters, "quality")
      .orderBy("cluster_id")
      .as[(Long, Long, Double, Long)].collect().toSeq
    // cluster 1: 2 and 3 tie at 0.9 -> min id 2; cluster 5: tie at 0.1 -> 5;
    // doc 4 is unclustered -> survives as its own cluster
    assert(got === Seq((1L, 2L, 0.9, 3L), (4L, 4L, 0.2, 1L), (5L, 5L, 0.1, 2L)))
  }

  test("keySkewProfile: integer ratios match hand computation, top-k plan") {
    import graft.operators.Profiling
    // 60 rows: key 0 hot (39 rows), keys 1..21 one row each
    val df = (Seq.fill(39)(0) ++ (1 to 21)).zipWithIndex
      .map { case (k, i) => (k.toLong, i.toLong) }.toDF("k", "v")
    val out = Profiling.keySkewProfile(df, Seq("k"), topN = 5)
    val rows = out.as[(Long, Long, Long, Long)].collect().toSeq
    // total=60, nkeys=22; hot key: share = 39*1e6/60 = 650000 ppm,
    // skew = 39*22*100/60 = 1430; singleton keys: 16666 ppm, skew 36
    assert(rows.head === (0L, 39L, 650000L, 1430L))
    assert(rows.length == 5)
    assert(rows.tail.forall { case (_, n, ppm, sk) => n == 1L && ppm == 16666L && sk == 36L })
    assert(rows.tail.map(_._1) === Seq(1L, 2L, 3L, 4L), "tie-break by key asc")
    // top-k must plan as TakeOrderedAndProject, not a global sort shuffle
    assert(out.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("heavyHitters: exact under sketch pressure (distinct >> width)") {
    import graft.operators.Sketches
    // 1000 distinct "tail" items once each + 3 hot items well above a
    // 1/20 share, spread over 8 partitions so the MG merge path runs.
    // width=20 << 1003 distinct: the sketch CANNOT hold the tail, yet
    // the output must equal the exact GROUP BY + HAVING result.
    val rows = (0 until 1000).map(i => s"tail_$i") ++
      Seq.fill(200)("hot_a") ++ Seq.fill(150)("hot_b") ++ Seq.fill(90)("hot_c")
    val df = spark.sparkContext.parallelize(rows, 8).toDF("item")
    val out = Sketches.heavyHitters(df, "item", minShareDenom = 20, width = 20)
      .orderBy(col("cnt").desc)
      .as[(String, Long, Long)].collect().toSeq
    // n = 1440; threshold cnt*20 > 1440 => cnt > 72: hot_a, hot_b, hot_c
    assert(out === Seq(
      ("hot_a", 200L, 200L * 1000000L / 1440L),
      ("hot_b", 150L, 150L * 1000000L / 1440L),
      ("hot_c", 90L, 90L * 1000000L / 1440L)))
  }

  test("heavyHitters: empty result when nothing crosses the share") {
    import graft.operators.Sketches
    val df = (0 until 300).map(i => s"u_${i % 100}").toDF("item")
    // uniform 1% shares, threshold 1/20 -> nothing qualifies
    assert(Sketches.heavyHitters(df, "item", minShareDenom = 20, width = 32).count() === 0L)
  }

  test("misraGries purge subtracts the cut: the no-decrement counterexample keeps its heavy key") {
    import graft.operators.Sketches
    // width=4 (purge at 8 entries): 4 stable keys at 10, then 4 cycles of
    // [h x5 + 3 fresh fillers]. n=72, h's true count 20 > n/(width+1)=14.4,
    // so the guarantee REQUIRES h among the candidates. A purge that drops
    // below the cut without decrementing survivors evicts h at every
    // purge (the stable keys witness each purge at full strength and the
    // cut never drains) — this sequence is the regression pin for that.
    val rows = Seq("x", "y", "z", "w").flatMap(Seq.fill(10)(_)) ++
      (0 until 4).flatMap(c => Seq.fill(5)("h") ++ Seq(s"f${c}a", s"f${c}b", s"f${c}c"))
    val agg = new Sketches.MisraGries(4)
    var buf = agg.zero
    rows.foreach(v => buf = agg.reduce(buf, v))
    val cands = agg.finish(buf).items
    assert(cands.contains("h"),
      s"true-heavy key h (20/72 > 1/5) must survive the purges, got $cands")
    assert(cands.size <= 4, "finish must honor the width bound")
  }

  test("misraGries sketch alone: superset guarantee, bounded size") {
    import graft.operators.Sketches
    val rows = (0 until 500).map(i => s"t_$i") ++ Seq.fill(100)("hot")
    val df = spark.sparkContext.parallelize(rows, 4).toDF("item")
    val items = df.agg(Sketches.misraGries(col("item"), 16).as("mg"))
      .select("mg.items").head().getSeq[String](0)
    assert(items.contains("hot"), "item above n/(width+1) must survive any merge order")
    assert(items.size <= 16)
  }

  test("kmvDistinct: exact below k, estimate within KMV error above, partition-invariant") {
    import graft.operators.Sketches
    import graft.functions.expr.Fnv64.fnv64
    def estimate(nDistinct: Int, parts: Int): (Long, Long) = {
      // duplicate every value 3x so distinct-tracking (not row count) is tested
      val rows = (0 until nDistinct).flatMap(i => Seq.fill(3)(s"v_$i"))
      val df = spark.sparkContext.parallelize(rows, parts).toDF("v")
        .select(fnv64(col("v")).as("h"))
      val r = df.agg(Sketches.kmvDistinct(col("h"), 256).as("s"))
        .select("s.estDistinct", "s.sketchFilled").head()
      (r.getLong(0), r.getLong(1))
    }
    assert(estimate(100, 4) === ((100L, 100L)), "below k the count is exact")
    val (est1, filled1) = estimate(20000, 4)
    assert(filled1 === 256L)
    assert(math.abs(est1 - 20000L) < 20000L * 0.2,
      s"KMV(256) estimate $est1 should be within ~3/sqrt(256)=19% of 20000")
    // sketch state is a set function: any partitioning → identical output
    assert(estimate(20000, 13) === ((est1, filled1)))
  }

  test("hllDistinct: estimate within HLL error, partition-invariant") {
    import graft.operators.Sketches
    import graft.functions.expr.Fnv64.fnv64
    def estimate(parts: Int): (Long, Long, Long) = {
      val rows = (0 until 30000).flatMap(i => Seq.fill(2)(s"doc_$i"))
      val df = spark.sparkContext.parallelize(rows, parts).toDF("v")
        .select(fnv64(col("v")).as("h"))
      val r = df.agg(Sketches.hllDistinct(col("h"), 12).as("s"))
        .select("s.estDistinct", "s.filled", "s.maxRank").head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val (est, filled, maxRank) = estimate(4)
    assert(math.abs(est - 30000L) < 30000L * 0.1,
      s"HLL(p=12) estimate $est should be within ~3*1.04/sqrt(4096)=5% of 30000")
    assert(filled > 0L && filled <= 4096L && maxRank >= 1L)
    assert(estimate(13) === ((est, filled, maxRank)), "register state is partition-invariant")
  }

  test("hllState/hllMergeState: merged increments equal the single-pass sketch exactly") {
    import graft.operators.Sketches
    import graft.functions.expr.Fnv64.fnv64
    // 3 overlapping increments (overlap is the point: a re-ingested key
    // must not double-count) over 9000 distinct keys
    val all = (0 until 9000).map(i => (i % 3, s"k_$i"))
    val df = all.toDF("inc", "v").select(col("inc"), fnv64(col("v")).as("h"))
    val direct = df.agg(Sketches.hllDistinct(col("h"), 8).as("s"))
      .select("s.estDistinct").head().getLong(0)
    val increments = (0 until 3).map { i =>
      // each increment sees its third PLUS a slice of the next (overlap)
      df.filter(col("inc") === i || col("h") % 7 === i)
        .agg(Sketches.hllState(col("h"), 8).as("st"))
    }.reduce(_ unionByName _)
    val merged = increments.agg(Sketches.hllMergeState(col("st"), 8).as("m"))
      .select("m.estDistinct").head().getLong(0)
    assert(merged === direct,
      "estimate(merge(increment states)) must equal the single-pass estimate bit-for-bit")
    assert(math.abs(merged - 9000L) < 9000L * 0.25, s"p=8 estimate sanity: $merged")
  }

  test("kmvState/kmvMergeState: merged increments equal the single-pass sketch, parquet round-trip") {
    import graft.operators.Sketches
    import graft.functions.expr.Fnv64.fnv64
    val all = (0 until 9000).map(i => (i % 3, s"k_$i"))
    val df = all.toDF("inc", "v").select(col("inc"), fnv64(col("v")).as("h"))
    val direct = df.agg(Sketches.kmvDistinct(col("h"), 256).as("s"))
      .select("s.estDistinct").head().getLong(0)
    val increments = (0 until 3).map { i =>
      // overlapping increments: a re-ingested key must not double-count
      df.filter(col("inc") === i || col("h") % 7 === i)
        .agg(Sketches.kmvState(col("h"), 256).as("st"))
    }.reduce(_ unionByName _)
    // the BINARY state must survive a real sink/scan, not just stay on heap
    val dir = java.nio.file.Files.createTempDirectory("kmv_state").toString
    increments.write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(Sketches.kmvMergeState(col("st"), 256).as("m"))
      .select(col("m.estDistinct"), col("m.sketchFilled"))
      .head()
    assert(merged.getLong(0) === direct,
      "estimate(merge(persisted increment states)) must equal the single-pass estimate bit-for-bit")
    assert(merged.getLong(1) === 256L)
    assert(math.abs(merged.getLong(0) - 9000L) < 9000L * 0.15,
      s"k=256 estimate sanity: ${merged.getLong(0)}")
    // merge output state re-merges: carry the merged state forward as the
    // next increment's base and the estimate is unchanged
    val carried = spark.read.parquet(dir)
      .agg(Sketches.kmvMergeState(col("st"), 256).as("m"))
      .select(col("m.state").as("st"))
      .agg(Sketches.kmvMergeState(col("st"), 256).as("m2"))
      .select("m2.estDistinct").head().getLong(0)
    assert(carried === direct, "re-merging the merged state must be idempotent")
  }

  test("histCounts state: parquet round-trip + merge equals one-pass histQuantiles") {
    import graft.operators.Quantiles
    val xs = (0 until 3000).map(i => ("g", (i.toLong * 37) % 50000))
    val df = xs.toDF("g", "x").withColumn("half", col("x") % 2)
    val onePass = Quantiles.histQuantiles(xs.toDF("g", "x"), "g", "x", Seq(500, 990))
      .select("q_permille", "est", "n").as[(Long, Long, Long)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("hist_state").toString
    // two increments, states through a real sink/scan
    Quantiles.histCounts(df.filter(col("half") === 0), "g", "x")
      .unionByName(Quantiles.histCounts(df.filter(col("half") =!= 0), "g", "x"))
      .write.mode("overwrite").parquet(dir)
    val merged = Quantiles.histQuantilesFromCounts(
        Quantiles.mergeHistCounts(spark.read.parquet(dir), "g"), "g", Seq(500, 990))
      .select("q_permille", "est", "n").as[(Long, Long, Long)].collect().toSet
    assert(merged === onePass,
      "readout from merged persisted states must equal the one-pass readout")
  }

  test("histQuantiles: within 2^-5 of exact percentiles, exact below 32, partition-invariant") {
    import graft.operators.Quantiles
    val xs = (0 until 5000).map(i => (i.toLong * i * 31) % 100000)
    def run(parts: Int) = {
      val df = spark.sparkContext.parallelize(xs.map(("g", _)), parts).toDF("g", "x")
      Quantiles.histQuantiles(df, "g", "x", Seq(500, 900, 990))
        .orderBy("q_permille")
        .select("q_permille", "est").as[(Long, Long)].collect().toSeq
    }
    val out = run(7)
    val sorted = xs.sorted
    for ((q, est) <- out) {
      val exact = sorted(((xs.size * q + 999) / 1000 - 1).toInt)
      assert(est <= exact, s"p$q: bucket lower bound $est must not exceed exact $exact")
      assert(exact <= est + est / 32 + 1,
        s"p$q: exact $exact outside the 2^-5 relative band of $est")
    }
    assert(run(13) === out, "histogram counts are partition-invariant")
    // identity buckets: all values below 32 reproduce percentiles exactly
    val small = (0 until 900).map(i => ("g", (i % 30).toLong)).toDF("g", "x")
    val exactSmall = Quantiles.histQuantiles(small, "g", "x", Seq(500, 990))
      .select("q_permille", "est").as[(Long, Long)].collect().toMap
    val smallSorted = (0 until 900).map(i => (i % 30).toLong).sorted
    assert(exactSmall(500L) === smallSorted((900 * 500 + 999) / 1000 - 1))
    assert(exactSmall(990L) === smallSorted((900 * 990 + 999) / 1000 - 1))
  }

  test("Scd.applySnapshot: close-changed / keep-unchanged / insert-new / soft-delete") {
    import graft.operators.Scd
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // changelog -> dim: k1 a->b (2 versions), k2 a (1), k3 c (1)
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "b"),
      (2L, ts("2024-01-01 00:00:00"), 3L, "a"),
      (3L, ts("2024-01-01 00:00:00"), 4L, "c")
    ).toDF("k", "ts", "id", "attr")
    val dim = Scd.scd2FromChangelog(log, "k", "ts", "id", "attr")
    // snapshot at t: k1 still b (unchanged), k2 now z (changed),
    // k3 absent (delete), k4 new
    val snap = Seq((1L, "b"), (2L, "z"), (4L, "q")).toDF("k", "attr")
    val out = Scd.applySnapshot(dim, snap, "k", "attr", ts("2024-02-01 00:00:00"))
      .orderBy(col("k"), col("version"))
      .select("k", "attr", "version", "is_current")
      .as[(Long, String, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, "a", 1L, false), (1L, "b", 2L, true),   // history kept, current untouched
      (2L, "a", 1L, false), (2L, "z", 2L, true),   // changed: closed + reopened
      (3L, "c", 1L, false),                        // soft delete: closed, no new row
      (4L, "q", 1L, true)))                        // new key at version 1
    // closed rows carry the asOf timestamp as valid_to
    val closed = Scd.applySnapshot(dim, snap, "k", "attr", ts("2024-02-01 00:00:00"))
      .filter(col("k") === 2L && !col("is_current"))
      .select("valid_to").as[java.sql.Timestamp].head()
    assert(closed === ts("2024-02-01 00:00:00"))
  }

  test("Scd.scd2FromChangelog: NULL attrs are values — run boundaries are null-safe") {
    import graft.operators.Scd
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // k1: NULL -> NULL -> a -> NULL  (leading-null run, null-after-null
    // continuation, value->null boundary); k2: a -> NULL -> a
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, null.asInstanceOf[String]),
      (1L, ts("2024-01-02 00:00:00"), 2L, null.asInstanceOf[String]),
      (1L, ts("2024-01-03 00:00:00"), 3L, "a"),
      (1L, ts("2024-01-04 00:00:00"), 4L, null.asInstanceOf[String]),
      (2L, ts("2024-01-01 00:00:00"), 5L, "a"),
      (2L, ts("2024-01-02 00:00:00"), 6L, null.asInstanceOf[String]),
      (2L, ts("2024-01-03 00:00:00"), 7L, "a")
    ).toDF("k", "ts", "id", "attr")
    val out = Scd.scd2FromChangelog(log, "k", "ts", "id", "attr")
      .orderBy(col("k"), col("version"))
      .select("k", "attr", "version", "n_events", "is_current")
      .as[(Long, Option[String], Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, None, 1L, 2L, false),      // leading NULL run EXISTS, spans 2 events
      (1L, Some("a"), 2L, 1L, false),
      (1L, None, 3L, 1L, true),       // value -> NULL starts a run
      (2L, Some("a"), 1L, 1L, false),
      (2L, None, 2L, 1L, false),      // a -> NULL boundary
      (2L, Some("a"), 3L, 1L, true))) // NULL -> a boundary
  }

  test("Scd.applySnapshot: NULL attrs are values, not absence — presence via markers") {
    import graft.operators.Scd
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // dim state: k1 current attr NULL, k2 current attr "a"
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, null.asInstanceOf[String]),
      (2L, ts("2024-01-01 00:00:00"), 2L, "a")
    ).toDF("k", "ts", "id", "attr")
    val dim = Scd.scd2FromChangelog(log, "k", "ts", "id", "attr")
    // snapshot: k1 still NULL (unchanged), k2 -> NULL (update to NULL,
    // NOT a soft delete), k3 arrives with NULL attr (insert)
    val snap = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])).toDF("k", "attr")
    val out = Scd.applySnapshot(dim, snap, "k", "attr", ts("2024-02-01 00:00:00"))
      .orderBy(col("k"), col("version"))
      .select("k", "attr", "version", "is_current")
      .as[(Long, Option[String], Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, None, 1L, true),            // NULL == NULL: stays current, no churn
      (2L, Some("a"), 1L, false),      // closed by the update to NULL...
      (2L, None, 2L, true),            // ...and reopened AS NULL (no delete)
      (3L, None, 1L, true)))           // new key inserts with NULL attr
  }

  test("kmvOverlap: exact set operations below k, estimator + symmetry above") {
    import graft.operators.Sketches
    import graft.functions.expr.Fnv64.fnv64
    def stateOf(vals: Seq[String], k: Int): Array[Byte] =
      vals.toDF("v").select(fnv64(col("v")).as("h"))
        .agg(Sketches.kmvState(col("h"), k).as("st"))
        .head().getAs[Array[Byte]](0)
    // below k: |A|=60, |B|=50, |A∩B|=30, |A∪B|=80 — all exact
    val a = (0 until 60).map(i => s"k_$i")
    val b = (30 until 80).map(i => s"k_$i")
    val small = Sketches.kmvOverlapOf(stateOf(a, 256), stateOf(b, 256), 256)
    assert(small === Sketches.KmvOverlap(80L, 30L, 30L * 1000 / 80, 80L),
      "part-filled sketches must read set ops exactly")
    // above k: 10k per side, 5k shared — estimates within KMV tolerance
    val bigA = (0 until 10000).map(i => s"x_$i")
    val bigB = (5000 until 15000).map(i => s"x_$i")
    val sa = stateOf(bigA, 256)
    val sb = stateOf(bigB, 256)
    val est = Sketches.kmvOverlapOf(sa, sb, 256)
    assert(est.mergedFilled === 256L)
    assert(math.abs(est.unionEst - 15000L) < 15000L * 0.25, s"union est ${est.unionEst}")
    assert(math.abs(est.interEst - 5000L) < 5000L * 0.5, s"inter est ${est.interEst}")
    assert(math.abs(est.jaccardPermille - 333L) < 150L, s"jaccard ${est.jaccardPermille}")
    assert(Sketches.kmvOverlapOf(sb, sa, 256) === est, "overlap is symmetric")
    // a state built with larger k must be rejected, not silently misread
    intercept[IllegalArgumentException] {
      Sketches.kmvOverlapOf(stateOf(bigA, 512), sb, 256)
    }
  }

  test("CountMin: estimates always overcount, partition-invariant state") {
    import graft.operators.CountMin
    import graft.functions.expr.Fnv64.fnv64
    // 2000 keys, key i occurs (i % 7) + 1 times
    val rows = (0 until 2000).flatMap(i => Seq.fill(i % 7 + 1)(s"u_$i"))
    def state(parts: Int): Array[Byte] =
      spark.sparkContext.parallelize(rows, parts).toDF("v")
        .select(fnv64(col("v")).as("h"))
        .agg(CountMin.cmsState(col("h"), 4, 512).as("st"))
        .head().getAs[Array[Byte]](0)
    val st = state(4)
    assert(java.util.Arrays.equals(st, state(11)),
      "the counter matrix is a pure multiset function — partitioning must not change it")
    val fnv = (s: String) => {
      var h = 0xCBF29CE484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xFFL); h *= 0x100000001B3L }
      h
    }
    val overcounts = (0 until 2000).map { i =>
      val est = CountMin.cmsEstimateOf(st, fnv(s"u_$i"), 4, 512)
      val truth = i % 7 + 1L
      assert(est >= truth, s"CMS must never undercount (key u_$i: $est < $truth)")
      est - truth
    }
    // CMS guarantee: P(overcount > e*n/w) < e^-d per probe — with
    // n = sum((i%7)+1) = 8000 rows, e*n/w ~ 42, failure rate < 2%.
    // (Full exactness is RARE here by design: 2000 keys over 512
    // buckets per row means nearly every cell has colliders; only
    // ~(1-1/512)^1999 ~ 2% of keys get a collider-free row, x4 rows.)
    val bound = math.ceil(math.E * rows.size / 512).toLong
    assert(overcounts.count(_ <= bound) > 1960,
      s"CMS epsilon bound violated: ${overcounts.count(_ > bound)}/2000 keys " +
        s"overcount by more than $bound")
    assert(overcounts.exists(_ === 0L), "some collider-free key should read exact")
  }

  test("cmsState/cmsMergeState: merged increments equal one-pass, parquet round-trip") {
    import graft.operators.CountMin
    import graft.functions.expr.Fnv64.fnv64
    val df = (0 until 3000).map(i => (i % 3, s"k_${i % 700}")).toDF("inc", "v")
      .select(col("inc"), fnv64(col("v")).as("h"))
    val direct = df.agg(CountMin.cmsState(col("h"), 4, 512).as("st"))
      .head().getAs[Array[Byte]](0)
    val increments = (0 until 3).map { i =>
      df.filter(col("inc") === i).agg(CountMin.cmsState(col("h"), 4, 512).as("st"))
    }.reduce(_ unionByName _)
    val dir = java.nio.file.Files.createTempDirectory("cms_state").toString
    increments.write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(CountMin.cmsMergeState(col("st"), 4, 512).as("m"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, direct),
      "merge(persisted increment states) must equal the one-pass matrix cell-for-cell")
    // a wrong-shape state fails loudly, not as garbage estimates
    intercept[Exception] {
      spark.read.parquet(dir)
        .agg(CountMin.cmsMergeState(col("st"), 4, 256).as("m")).head()
    }
  }

  test("cmsInnerProduct: join-size estimate overcounts, merged states estimate like one-pass") {
    import graft.operators.CountMin
    import graft.functions.expr.Fnv64.fnv64
    // left: key i occurs i%5+1 times over 400 keys; right: every 2nd key, i%3+1 times
    val leftRows = (0 until 400).flatMap(i => Seq.fill(i % 5 + 1)(s"k_$i"))
    val rightRows = (0 until 400 by 2).flatMap(i => Seq.fill(i % 3 + 1)(s"k_$i"))
    def stateOf(rows: Seq[String], parts: Int): Array[Byte] =
      spark.sparkContext.parallelize(rows, parts).toDF("v")
        .select(fnv64(col("v")).as("h"))
        .agg(CountMin.cmsState(col("h"), 4, 512).as("st"))
        .head().getAs[Array[Byte]](0)
    val sl = stateOf(leftRows, 4)
    val sr = stateOf(rightRows, 7)
    val exact = (0 until 400 by 2).map(i => (i % 5 + 1).toLong * (i % 3 + 1)).sum
    val est = CountMin.cmsInnerProductOf(sl, sr, 4, 512)
    assert(est >= BigInt(exact),
      s"inner-product estimate must never undercount the true join size ($est < $exact)")
    // collision noise bound: each row's dot adds < n_l*n_r/w expected cross terms
    val bound = BigInt(leftRows.size.toLong * rightRows.size / 512 * 8)
    assert(est - exact <= bound, s"excess ${est - BigInt(exact)} implausibly large (> $bound)")
    // a state assembled from increment merges estimates identically to one-pass
    // (matrices are cell-identical, so this is a consistency pin, not a new claim)
    val sl2 = stateOf(leftRows, 13)
    assert(CountMin.cmsInnerProductOf(sl2, sr, 4, 512) === est)
    // disjoint key sets: exact size 0, estimate is pure collision noise >= 0
    val disjoint = stateOf((0 until 400).map(i => s"other_$i"), 3)
    assert(CountMin.cmsInnerProductOf(disjoint, sr, 4, 512) >= BigInt(0))
    intercept[IllegalArgumentException] {
      CountMin.cmsInnerProductOf(sl, sr, 4, 256)
    }
    // >63-bit regime: the COLUMN form must carry the full DECIMAL(38,0)
    // range (an inferred (38,18) udf type would cap at ~1e20 and die in
    // ANSI mode on exactly the corpus-scale joins the gate exists for)
    import graft.operators.Sketches
    val big = Sketches.kmvToBytes(Array.fill(4 * 512)(3000000000000L))
    val est2 = Seq((big, big)).toDF("a", "b")
      .select(CountMin.cmsJoinSize(col("a"), col("b"), 4, 512).as("est"))
      .head().getDecimal(0)
    val expected = BigInt(3000000000000L) * BigInt(3000000000000L) * 512
    assert(BigInt(est2.toBigInteger) === expected,
      s"decimal path truncated the 27-digit inner product: $est2")
  }

  test("duplicateKeys/orphanKeys: planted violations surface, nulls are absent not dangling") {
    import graft.operators.Profiling
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val orphans = Profiling.orphanKeys(child, "fk", parent, "pk")
      .as[Long].collect().toSet
    assert(orphans === Set(9L), s"only the dangling key reports (null is absent): $orphans")
    val dups = Profiling.duplicateKeys(child, Seq("fk"))
      .as[(Option[Long], Long)].collect().toSet
    assert(dups === Set((Some(1L), 2L)), s"only the duplicated key reports: $dups")
  }

  test("clipToQuantiles: clamps into the readout bounds, identity inside them") {
    import graft.operators.Quantiles
    val df = (1L to 1000L).toDF("v")
    val got = Quantiles.clipToQuantiles(df, "v", 100, 900)
      .as[(Long, Long)].collect().toMap
    val lo = got(1L)  // below p10 -> clamped up to the p10 bucket repr
    val hi = got(1000L)
    assert(lo > 1L && hi < 1000L, s"bounds must bite: lo=$lo hi=$hi")
    // inside the bounds the value passes through untouched
    got.foreach { case (v, c) =>
      if (v >= lo && v <= hi) assert(c === v, s"$v clamped to $c inside bounds")
      else assert(c === lo || c === hi, s"$v clamped to $c outside [$lo, $hi]")
    }
    // bucket-representative bounds sit at/below the true quantiles (~3% bucket width)
    assert(math.abs(lo - 100L) <= 8 && math.abs(hi - 900L) <= 32, s"lo=$lo hi=$hi")
    intercept[IllegalArgumentException] {
      Quantiles.clipToQuantiles(df, "v", 900, 100)
    }
  }

  test("robustOutliers: planted wild rows flag, the bulk does not, outliers don't move the gate") {
    import graft.operators.Quantiles
    // bulk: 200 values tightly around 100; planted: two wild rows
    val bulk = (0L until 200L).map(i => 90L + i % 21)
    val df = (bulk ++ Seq(5000L, 0L)).toDF("v")
    val got = Quantiles.robustOutliers(df, "v", kx100 = 300L)
      .as[(Long, Boolean)].collect()
    assert(got.filter(_._1 == 5000L).forall(_._2), "wild high row must flag")
    assert(got.filter(_._1 == 0L).forall(_._2), "wild low row must flag")
    assert(!got.exists(r => r._1 >= 90L && r._1 <= 110L && r._2),
      s"bulk rows must not flag: ${got.filter(_._2).toSeq}")
    // robustness: the gate is unchanged when MORE outliers pile on (the
    // property a mean/stddev z-score lacks — breakdown point 1/2)
    val more = (bulk ++ Seq.fill(20)(5000L)).toDF("v")
    val flags = Quantiles.robustOutliers(more, "v", kx100 = 300L)
      .as[(Long, Boolean)].collect()
    assert(flags.count(r => r._1 == 5000L && r._2) === 20,
      "piling on outliers must not drag the median/MAD gate open")
    // the distributed per-group form gates each group like the global
    // form gates that group alone (groups have distinct scales)
    val grouped = ((bulk :+ 5000L).map(("a", _)) ++
      (0L until 100L).map(i => ("b", 100000L + i * 7)) :+ (("b", 5L)))
      .toDF("g", "v")
    val byGroup = Quantiles.robustOutliersByGroup(grouped, "g", "v", kx100 = 300L)
      .as[(String, Long, Boolean)].collect().toSet
    Quantiles.releaseFrames()
    for (g <- Seq("a", "b")) {
      val global = Quantiles.robustOutliers(
          grouped.filter(col("g") === g).select("v"), "v", kx100 = 300L)
        .as[(Long, Boolean)].collect().toSet
      Quantiles.releaseFrames()
      assert(byGroup.filter(_._1 == g).map(r => (r._2, r._3)) === global,
        s"group $g must gate exactly like the global form on its own rows")
    }
    // a NULL group is a group, not a delete: its rows are gated in place
    val withNullGroup = (Seq(("a", 10L), ("a", 11L), ("a", 12L)) ++
      Seq((null.asInstanceOf[String], 20L), (null.asInstanceOf[String], 21L),
        (null.asInstanceOf[String], 9000L))).toDF("g", "v")
    val nullGated = Quantiles.robustOutliersByGroup(withNullGroup, "g", "v", kx100 = 300L)
      .as[(Option[String], Long, Boolean)].collect()
    Quantiles.releaseFrames()
    assert(nullGated.length === 6, s"no row may be dropped: ${nullGated.toSeq}")
    assert(nullGated.filter(_._1.isEmpty).count(_._3) === 1,
      s"the null group's wild row must flag within its own group: ${nullGated.toSeq}")
    // NULL values don't NPE the global readout; their clip null-propagates
    val withNullVal = Seq(Some(1L), Some(2L), Some(3L), None).toDF("v")
    val clipped = Quantiles.clipToQuantiles(withNullVal, "v", 100, 900)
      .as[(Option[Long], Option[Long])].collect().toSet
    assert(clipped.contains((None, None)), s"null value must clip to null: $clipped")
  }

  test("Retraction: count states subtract to the survivors' state exactly, negatives fail loudly") {
    import graft.dedup.LineDedup
    import graft.operators.CountMin
    import graft.search.Lexical
    val docs = Seq(
      (1L, "alpha beta gamma\nshared line"),
      (2L, "beta gamma delta\nshared line"),
      (3L, "alpha alpha epsilon\nshared line"),
      (4L, "zeta beta\nshared line")).toDF("doc_id", "text")
    val removed = docs.filter(col("doc_id") >= 3)
    val survivors = docs.filter(col("doc_id") < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // vocab term counts
    val vGot = Lexical.retractTermCounts(
      Lexical.termCounts(docs, "doc_id", "text"), removed, "doc_id", "text")
    assert(rows(vGot) === rows(Lexical.termCounts(survivors, "doc_id", "text")),
      "retract(all, removed) must equal the survivors' one-pass term counts")
    // line document frequencies
    val lGot = LineDedup.retractLineState(
      LineDedup.lineState(docs, "doc_id", "text"), removed, "doc_id", "text")
    assert(rows(lGot) === rows(LineDedup.lineState(survivors, "doc_id", "text")))
    // CMS matrix: cell-exact
    import graft.functions.expr.Fnv64.fnv64
    def cms(df: org.apache.spark.sql.DataFrame): Array[Byte] = df
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .select(fnv64(col("t")).as("h"))
      .agg(CountMin.cmsState(col("h"), 4, 512).as("st"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(
      CountMin.cmsRetractOf(cms(docs), cms(removed), 4, 512), cms(survivors)))
    // removing never-ingested rows fails loudly, not silently clamps —
    // INCLUDING under column pruning (the guard is a filter predicate;
    // a consumer that never reads the count must still hit it)
    val alien = Seq((9L, "omega omega")).toDF("doc_id", "text")
    intercept[Exception] {
      Lexical.retractTermCounts(
        Lexical.termCounts(docs, "doc_id", "text"), alien, "doc_id", "text")
        .select("term").collect()
    }
    intercept[IllegalArgumentException] {
      CountMin.cmsRetractOf(cms(docs), cms(alien), 4, 512)
    }
  }

  test("embeddingDriftQuantized: identical halves read 1.0, opposed halves read -1.0, empty side null") {
    import graft.operators.Profiling
    val v = Seq(0.5f, -0.25f, 0.75f, 0.1f)
    // label 0: both halves identical direction; label 1: new side negated;
    // label 2: old side only
    val rows = Seq(
      (0L, 0, v), (1L, 0, v.map(_ * 2)),
      (2L, 1, v), (3L, 1, v.map(x => -x)),
      (4L, 2, v))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Profiling.embeddingDriftQuantized(df, "label",
        pmod(col("vec_id"), lit(2)) === 1, "embedding")
      .orderBy("label")
      .as[(Int, Long, Long, Option[Double])].collect().toSeq
    assert(got(0) === ((0, 1L, 1L, Some(1.0))),
      s"same direction (quantize is scale-invariant here) must read 1.0: ${got(0)}")
    assert(got(1) === ((1, 1L, 1L, Some(-1.0))), s"negated increment reads -1.0: ${got(1)}")
    assert(got(2) === ((2, 1L, 0L, None)), s"missing side reads null, not 0: ${got(2)}")
  }

  test("densifyAndFill: complete grid, leading gaps stay null, fill repeats last observation") {
    import graft.operators.Windows
    // key a: ticks 3,6,7 observed; key b: single tick 10
    val df = Seq(("a", 3L, 30.0), ("a", 6L, 60.0), ("a", 7L, 70.0), ("b", 10L, 1.0))
      .toDF("k", "tick", "v")
    val got = Windows.densifyAndFill(df, "k", "tick", Seq("v"))
      .orderBy("k", "tick")
      .as[(String, Long, Option[Double], Option[Double])].collect()
    val a = got.filter(_._1 == "a")
    assert(a.map(_._2).toSeq === (3L to 7L), s"grid must be complete: ${a.toSeq}")
    // observed ticks carry the value; gap ticks null; fill carries last
    assert(a.map(_._4).toSeq === Seq(Some(30.0), Some(30.0), Some(30.0), Some(60.0), Some(70.0)))
    assert(a.map(_._3).toSeq === Seq(Some(30.0), None, None, Some(60.0), Some(70.0)))
    assert(got.filter(_._1 == "b").toSeq === Seq(("b", 10L, Some(1.0), Some(1.0))))
    // a wild key span fails loudly instead of detonating a task
    val wild = Seq(("w", 0L, 1.0), ("w", 99L, 2.0)).toDF("k", "tick", "v")
    intercept[Exception] {
      Windows.densifyAndFill(wild, "k", "tick", Seq("v"), maxSpanTicks = 10L).count()
    }
  }

  test("uniformSampleState/mergeSampleStates: merged disjoint increments equal one-pass") {
    import graft.operators.Sampling
    val df = spark.sparkContext.parallelize(0L until 5000L, 9).toDF("id")
      .withColumn("payload", col("id") * 10)
    val onePass = Sampling.uniformSampleState(df, "id", 50)
      .as[(Long, Long)].collect().sorted.toSeq
    val incs = (0 until 4).map(i => Sampling.uniformSampleState(
      df.filter(pmod(col("id"), lit(4)) === i), "id", 50))
    val merged = Sampling.mergeSampleStates(incs, "id", 50)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(merged === onePass,
      "union + re-top-k over increment states must equal the one-pass sample row-for-row")
    assert(onePass.size === 50)
    // fewer rows than k: the sample is the whole input
    assert(Sampling.uniformSampleState(df.filter(col("id") < 7), "id", 50).count() === 7)
    // takedown: dropping removed ids == the survivors' own min-(k-m) sample
    val removed = df.filter(pmod(col("id"), lit(5)) === 0).select("id")
    val retracted = Sampling.retractSample(
        Sampling.uniformSampleState(df, "id", 50), removed, "id")
      .as[(Long, Long)].collect().sorted.toSeq
    val m = 50 - retracted.size
    assert(m > 0, "fixture should have removed ids inside the sample")
    val direct = Sampling.uniformSampleState(
        df.join(removed, Seq("id"), "left_anti"), "id", 50 - m)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(retracted === direct,
      "retracted sample must BE the survivors' min-(k-m) sample, row-for-row")
  }

  test("joinFanoutProfile: per-key products match the real join, no join executed on data") {
    import graft.operators.Profiling
    val left = (Seq.fill(3)("a") ++ Seq("b") ++ Seq.fill(2)("c")).toDF("k")
    val right = (Seq.fill(2)("a") ++ Seq.fill(5)("b") ++ Seq.fill(7)("d")).toDF("k")
    val prof = Profiling.joinFanoutProfile(left, right, Seq("k"))
      .orderBy("k")
      .as[(String, Long, Long, Long, Long)].collect()
    // only keys on BOTH sides appear; out_n = left_n * right_n; total = 11
    assert(prof.toSeq === Seq(
      ("a", 3L, 2L, 6L, 6L * 1000000 / 11),
      ("b", 1L, 5L, 5L, 5L * 1000000 / 11)))
    // the profile's out_n IS the inner join's per-key output cardinality
    val real = left.join(right, "k").groupBy("k").count()
      .orderBy("k").as[(String, Long)].collect()
    assert(real.toSeq === prof.map(p => (p._1, p._4)).toSeq)
  }

  test("compactionPlan: prefix-sum bins, per-bin bound target + largest item") {
    import graft.sources.Layout
    val files = Seq(
      ("g1", 1L, 10L), ("g1", 2L, 20L), ("g1", 3L, 30L), ("g1", 4L, 40L),
      ("g2", 1L, 100L), ("g2", 2L, 1L))
      .toDF("grp", "fid", "bytes")
    val planned = Layout.compactionPlan(files, Seq("grp"), "fid", "bytes", 35L)
      .orderBy("grp", "fid")
      .select("grp", "fid", "bin").as[(String, Long, Long)].collect()
    // g1 prefix bytes-before: 0,10,30,60 -> bins 0,0,0,1
    // g2: 0,100 -> bins 0,2 (the 100-byte file fills bins 0-1's range alone)
    assert(planned.toSeq === Seq(
      ("g1", 1L, 0L), ("g1", 2L, 0L), ("g1", 3L, 0L), ("g1", 4L, 1L),
      ("g2", 1L, 0L), ("g2", 2L, 2L)))
    // bound: every bin's total < target + the group's largest single item
    val bins = Layout.compactionPlan(files, Seq("grp"), "fid", "bytes", 35L)
      .groupBy("grp", "bin").agg(sum("bytes").as("b"))
      .join(files.groupBy("grp").agg(max("bytes").as("mx")), Seq("grp"))
      .as[(String, Long, Long, Long)].collect()
    bins.foreach { case (g, bin, b, mx) =>
      assert(b < 35L + mx, s"bin ($g, $bin) holds $b bytes >= 35 + $mx")
    }
  }

  test("writeCompacted: one file per bin, deterministic layout, lossless") {
    import graft.sources.Layout
    val df = (0 until 100).map(i => (s"g${i % 2}", i.toLong, 1L)).toDF("grp", "id", "bytes")
    val dir = java.nio.file.Files.createTempDirectory("compacted").toString
    // 50 one-byte rows per group at target 10 -> 5 bins per group
    Layout.writeCompacted(df, dir, Seq("grp"), "id", "bytes", 10L)
    val binDirs = new java.io.File(dir).listFiles().filter(_.isDirectory).flatMap(
      _.listFiles().filter(_.isDirectory))
    assert(binDirs.length === 10, s"expected 2 groups x 5 bins, got ${binDirs.length}")
    binDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"${d.getPath}: one bin must be ONE file, got ${parts.length}")
    }
    val back = spark.read.parquet(dir)
    assert(back.count() === 100)
    assert(back.select("id").as[Long].collect().sorted.toSeq === (0L until 100L).toSeq)
    // every bin holds exactly target/rowbytes = 10 rows (uniform sizes)
    val perBin = back.groupBy("grp", "bin").count().select("count").as[Long].collect()
    assert(perBin.forall(_ === 10L), s"uniform 1-byte rows at target 10: ${perBin.toSeq}")
  }

  test("langMixProfile: per-line lang ID, majority with lexical tie, segment-free docs absent") {
    import graft.operators.QualitySignals
    val docs = Seq(
      (1L, "the cat is on the mat\nthe dog is with a bone\nder hund ist nicht ein"),
      (2L, "qqq zzz"),             // no stopword hits -> und
      (3L, ""),                    // no non-empty segments -> absent
      (4L, "  \n   "),             // ditto
      (5L, "the der"))             // en/de tie on 1 hit each -> code order: de
      .toDF("doc_id", "text")
    val out = QualitySignals.langMixProfile(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String, Long)].collect()
    assert(out.toSeq === Seq(
      (1L, 3L, 2L, "en", 666L),
      (2L, 1L, 1L, "und", 1000L),
      (5L, 1L, 1L, "de", 1000L)))
  }

  test("bigramSurprise: hand-computed integer scores, short docs absent") {
    import graft.operators.QualitySignals
    val docs = Seq(
      (1L, "aaaa"),   // bigrams aa,aa,aa
      (2L, " AAb"),   // trim+lower -> "aab": bigrams aa, ab
      (3L, "x"),      // no bigrams
      (4L, ""))       // no bigrams
      .toDF("doc_id", "text")
    val out = QualitySignals.bigramSurprise(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    // counts: aa -> 4 (surprise 64 - len(bin(4)) = 61), ab -> 1 (surprise 63)
    // d1: 61*3*100 div 3 = 6100; d2: (61+63)*100 div 2 = 6200
    assert(out.toSeq === Seq((1L, 6100L, 3L), (2L, 6200L, 2L)))
  }

  test("bigramCounts state: merged increments equal one-pass; unseen bigrams score 64 against a fixed model") {
    import graft.operators.QualitySignals
    val yesterday = Seq((1L, "aaaa"), (2L, "aab")).toDF("doc_id", "text")
    val today = Seq((10L, "aaxy")).toDF("doc_id", "text")
    // merge(increment counts) == counts over the union, hash for hash
    val merged = QualitySignals.mergeBigramCounts(Seq(
        QualitySignals.bigramCounts(yesterday, "text"),
        QualitySignals.bigramCounts(today, "text")))
      .orderBy("h").as[(Long, Long)].collect()
    val onePass = QualitySignals.bigramCounts(
        yesterday.unionByName(today), "text")
      .orderBy("h").as[(Long, Long)].collect()
    assert(merged.toSeq === onePass.toSeq)
    // serving form: yesterday's model scores today's batch — "aa" seen
    // (n=4 -> 61), "ax"/"xy" unseen -> 64; mean = (61+64+64)*100 div 3
    val scored = QualitySignals.bigramSurpriseAgainst(today, "doc_id", "text",
        QualitySignals.bigramCounts(yesterday, "text"))
      .as[(Long, Long, Long)].collect()
    assert(scored.toSeq === Seq((10L, 6300L, 3L)))
    // self-trained Against == the one-shot operator (n >= 1 everywhere)
    val self = QualitySignals.bigramSurpriseAgainst(yesterday, "doc_id", "text",
        QualitySignals.bigramCounts(yesterday, "text"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    val oneShot = QualitySignals.bigramSurprise(yesterday, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(self.toSeq === oneShot.toSeq)
  }

  test("psiDrift: zero on identical distributions, fires on a planted shift, contributions nonnegative") {
    import graft.operators.Profiling
    val ref = (1L to 400L).map(i => Tuple1((i % 20) + 1)).toDF("v")
    // identical distribution -> every share matches -> psi exactly 0
    val same = Profiling.psiDrift(ref, ref, "v")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(same.forall(_._6 == 0L) && same.forall(_._7 == 0L))
    // planted shift: current values 8x larger -> mass moves up 3 octaves
    val cur = (1L to 400L).map(i => Tuple1(((i % 20) + 1) * 8)).toDF("v")
    val drift = Profiling.psiDrift(ref, cur, "v")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(drift.forall(_._6 >= 0L), "monotone L: every contribution >= 0")
    assert(drift.head._7 > 500000L * 65536L / 1000L,
      s"a 3-octave shift must register, got psi=${drift.head._7}")
    // deterministic under repartitioning
    val again = Profiling.psiDrift(ref.repartition(7), cur.repartition(3), "v")
      .orderBy("bucket").as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(again.toSeq === drift.sortBy(_._1).toSeq)
    // zero in a bucket absent on one side stays finite (smoothing) and
    // the v=0 sentinel bucket is its own octave
    val z = Profiling.psiDrift(
        Seq(0L, 0L, 1L, 2L).map(Tuple1(_)).toDF("v"),
        Seq(1L, 2L, 4L, 8L).map(Tuple1(_)).toDF("v"), "v")
      .orderBy("bucket").as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(z.map(_._1).toSeq === Seq(-1L, 0L, 1L, 2L, 3L))
    assert(z.forall(r => r._6 >= 0L))
  }

  test("weightedPrioritySample: inclusion tracks weight, deterministic, loud on bad weights") {
    import graft.operators.Sampling
    // two weight classes: ids 1..1000 at w=9, 1001..2000 at w=1
    val df = (1L to 2000L).map(i => (i, if (i <= 1000L) 9L else 1L)).toDF("id", "w")
    val got = Sampling.weightedPrioritySample(df, "id", "w", 400)
      .as[(Long, Long, Long)].collect()
    assert(got.length === 400)
    assert(got.map(_._1).distinct.length === 400, "without replacement")
    val heavy = got.count(_._2 == 9L)
    // ES with w-ratio 9:1 puts ~90% of the draw in the heavy class
    assert(heavy > 320 && heavy < 400, s"heavy-class share off: $heavy/400")
    // deterministic under repartitioning — same SET, same keys
    val again = Sampling.weightedPrioritySample(df.repartition(13), "id", "w", 400)
      .as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq)
    // at fixed hash, a larger weight can only shrink the key (monotone)
    val k1 = df.select(Sampling.priorityKey("id", "w").as("k"))
    val k9 = df.withColumn("w", lit(81L))
      .select(Sampling.priorityKey("id", "w").as("k"))
    val pairs = k1.as[Long].collect().zip(k9.as[Long].collect())
    assert(pairs.forall { case (a, b) => b <= a })
    // null / nonpositive weights fail loudly, never bias silently
    val bad = Seq((1L, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedPrioritySample(bad, "id", "w", 1).collect()
    }
    assert(e.getMessage.contains("positive"))
  }

  test("fitLinearByGroup: exact on a planted line, null on degenerate groups, partition-stable") {
    import graft.operators.Regression
    val rows =
      (1L to 50L).map(x => ("line", x, 3L * x + 7L)) ++     // exact y = 3x + 7
      (1L to 30L).map(x => ("noisy", x, 2L * x + (x % 3))) ++ // near-linear
      Seq(("const_x", 5L, 1L), ("const_x", 5L, 9L),          // constant x: no slope
          ("single", 4L, 4L))                                 // n = 1: no fit
    val df = rows.toDF("g", "x", "y")
    val got = Regression.fitLinearByGroup(df, Seq("g"), "x", "y")
      .orderBy("g")
      .as[(String, Long, Option[Long], Option[Long])].collect().toSeq
    assert(got.find(_._1 == "line").get === ("line", 50L, Some(3000000L), Some(7000000L)))
    val noisy = got.find(_._1 == "noisy").get
    assert(noisy._3.exists(s => s > 1900000L && s < 2100000L))
    assert(got.find(_._1 == "const_x").get._3.isEmpty, "constant x -> null slope")
    assert(got.find(_._1 == "single").get._3.isEmpty, "n=1 -> null fit")
    // bit-identical under repartitioning (the decimal-sum contract)
    val again = Regression.fitLinearByGroup(df.repartition(7), Seq("g"), "x", "y")
      .orderBy("g").as[(String, Long, Option[Long], Option[Long])].collect().toSeq
    assert(again === got)
  }

  test("sentences + sentenceChunks: punctuation stays attached, no sentence ever splits") {
    import graft.functions.TextFunctions
    import graft.operators.SequencePacking
    val split = Seq(Tuple1("Dr. Smith went. Home now! Really?  yes"))
      .toDF("t").select(TextFunctions.sentences(col("t")))
      .as[Seq[String]].head()
    assert(split === Seq("Dr.", "Smith went.", "Home now!", "Really?", "yes"))
    // doc: sentences of 3,3,3,5,1 tokens; budget 6 -> prefix-rule chunks
    // before: 0,3,6,9,14 -> chunk 0,0,1,1,2
    val doc = Seq((1L, "a b c. d e f. g h i. j k l m n. o"))
      .toDF("id", "t")
    val got = SequencePacking.sentenceChunks(doc, "id", "t", budgetTokens = 6L)
      .orderBy("chunk").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L, 2L, 6L, 0L), (1L, 1L, 2L, 8L, 2L), (1L, 2L, 1L, 1L, 4L)))
    // an over-budget leading sentence fills its own chunk, never splits;
    // later sentences land by the prefix rule (sparse chunk ids are fine)
    val big = Seq((2L, "a b c d e f g h i j. one two. tail"))
      .toDF("id", "t")
    val g2 = SequencePacking.sentenceChunks(big, "id", "t", budgetTokens = 4L)
      .orderBy("chunk").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(g2 === Seq((2L, 0L, 1L, 10L, 0L), (2L, 2L, 1L, 2L, 1L), (2L, 3L, 1L, 1L, 2L)))
  }

  test("hygieneAudit: special tokens, mojibake, control chars each flag; tab/LF stay clean") {
    import graft.operators.QualitySignals
    val docs = Seq(
      (1L, "plain text with a tab\tand\nnewline"),
      (2L, "model echo <|endoftext|> and <s>seq</s> [INST] x"),
      (3L, "double-encoded caf\u00C3\u00A9 and \u00E2\u20AC\u2122quote\u00E2\u20AC\u2122 plus \uFFFD"),
      (4L, "binary\u0001spill\u0007here"),
      (5L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val got = QualitySignals.hygieneAudit(docs, "id", "t")
      .orderBy("id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Boolean])]
      .collect().toSeq
    assert(got(0) === ((1L, Some(0L), Some(0L), Some(0L), Some(true))))
    assert(got(1) === ((2L, Some(4L), Some(0L), Some(0L), Some(false))))
    // Ã + two â€-pairs + replacement char = 4 mojibake hits
    assert(got(2) === ((3L, Some(0L), Some(4L), Some(0L), Some(false))))
    assert(got(3) === ((4L, Some(0L), Some(0L), Some(2L), Some(false))))
    assert(got(4) === ((5L, None, None, None, None)), "null text is unknown, not clean")
  }

  test("octave-count state: merge == one-pass, retract == rescan of survivors") {
    import graft.operators.{Profiling, Retraction}
    val vals = (1L to 900L).map(i => Tuple1((i * i * 7) % 5000)).toDF("v")
    val onePass = Profiling.octaveCounts(vals, "v")
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    val incs = Seq(0, 1, 2).map(r =>
      Profiling.octaveCounts(vals.filter(col("v") % 3 === r), "v"))
    val merged = Profiling.mergeOctaveCounts(incs)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(merged === onePass)
    // takedown: subtracting the removed rows' own state == survivors' state
    val removed = vals.filter(col("v") % 7 === 0)
    val retracted = Retraction.subtract(
        Profiling.mergeOctaveCounts(incs),
        Profiling.octaveCounts(removed, "v"), Seq("bucket"), "cnt")
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    val rescan = Profiling.octaveCounts(vals.filter(col("v") % 7 =!= 0), "v")
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(retracted === rescan)
  }

  test("timeRangeAgg: frame is time-bounded and timestamp ties are peers") {
    import graft.operators.Windows
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // key 1: events at 0, 30, 30, 100, 5000 s with a 60 s window
    val df = Seq((1L, 10L, ts(0)), (1L, 11L, ts(30)), (1L, 12L, ts(30)),
        (1L, 13L, ts(100)), (1L, 14L, ts(5000)))
      .toDF("k", "id", "ts")
    val got = Windows.timeRangeAgg(df, Seq("k"), "ts", windowSec = 60L,
        Map("n" -> count(lit(1)), "s" -> sum(col("id"))))
      .orderBy("id").as[(Long, Long, java.sql.Timestamp, Long, Long)]
      .collect().map(r => (r._2, r._4, r._5)).toSeq
    assert(got === Seq(
      (10L, 1L, 10L),
      (11L, 3L, 33L),   // tie at t=30: BOTH peers in each other's frame
      (12L, 3L, 33L),
      (13L, 1L, 13L),   // t=100: frame [40,100] — the 30 s pair aged out
      (14L, 1L, 14L)))  // far future: alone
  }

  test("vectorHygiene: NaN/Inf, wrong dim, all-zeros, and null vectors all fail ok") {
    import graft.functions.VectorFunctions
    val docs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(1.0f, Float.NaN, Float.PositiveInfinity, 4.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (4L, Seq(1.0f, 2.0f)),
      (5L, null.asInstanceOf[Seq[Float]])
    ).toDF("id", "v")
    val got = VectorFunctions.vectorHygiene(docs, "id", "v", expectedDim = 4)
      .orderBy("id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Boolean)]
      .collect().toSeq
    assert(got === Seq(
      (1L, Some(4L), Some(0L), Some(0L), true),
      (2L, Some(4L), Some(2L), Some(0L), false),
      (3L, Some(4L), Some(0L), Some(4L), false),
      (4L, Some(2L), Some(0L), Some(0L), false),
      (5L, None, None, None, false)))
  }

  test("sourceQualityState: merged increments with retraction serve the rescan verdicts") {
    import graft.pipeline.Curation
    import graft.operators.Retraction
    val docs = (
      (1L to 8L).map(i => (i, "w" + i + " x" + i + " y" + i, "a")) ++
      (9L to 16L).map(i => (i, "dup dup dup dup", "b"))
    ).toDF("doc_id", "text", "source")
    val incs = Seq(0L, 1L).map(r =>
      Curation.sourceQualityState(docs.filter(col("doc_id") % 2 === r),
        "doc_id", "text", "source"))
    val removed = docs.filter(col("doc_id") >= 13)  // retracts half of b
    val state = Retraction.subtract(Curation.mergeSourceStates(incs),
      Curation.sourceQualityState(removed, "doc_id", "text", "source"),
      Seq("source", "metric"), "cnt")
    val served = Curation.sourceVerdictsFromState(state, 600000L, 5L)
      .orderBy("source").as[(String, Long, Long, Boolean)].collect().toSeq
    // a: 8 diverse docs keep; b: 4 boilerplate docs -> low mean AND n<5
    assert(served === Seq(("a", 8L, 1000000L, true), ("b", 4L, 250000L, false)))
    // a source retracted away entirely leaves no verdict row
    val allGone = Retraction.subtract(Curation.mergeSourceStates(incs),
      Curation.sourceQualityState(docs.filter(col("source") === "b"),
        "doc_id", "text", "source"),
      Seq("source", "metric"), "cnt")
    assert(Curation.sourceVerdictsFromState(allGone, 600000L, 5L)
      .select("source").as[String].collect().toSeq === Seq("a"))
  }

  test("weightedQuotaPerGroup: exact quota per group, heavy weights dominate within each") {
    import graft.operators.Sampling
    // two groups of 500; in each, ids with a heavy weight (w=9) are 50%
    val df = (1L to 1000L).map { i =>
      val g = if (i <= 500) "a" else "b"
      (i, g, if (i % 2 == 0) 9L else 1L)
    }.toDF("id", "g", "w")
    val got = Sampling.weightedQuotaPerGroup(df, Seq("g"), "id", "w", quota = 100)
      .as[(Long, String, Long, Long)].collect()
    assert(got.count(_._2 == "a") === 100 && got.count(_._2 == "b") === 100)
    // ES with 9:1 weights puts ~90% of each group's draw on the heavy class
    for (g <- Seq("a", "b")) {
      val heavy = got.count(r => r._2 == g && r._3 == 9L)
      assert(heavy > 75 && heavy < 100, s"group $g heavy share off: $heavy/100")
    }
    // deterministic under repartitioning
    val again = Sampling.weightedQuotaPerGroup(df.repartition(9), Seq("g"),
        "id", "w", quota = 100)
      .as[(Long, String, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq)
  }

  test("rankedEval: hand-checked metrics; a query the system never answers scores zero") {
    import graft.search.Metrics
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (3L, 30L))
      .toDF("query_id", "doc_id")
    val system = Seq(
      (1L, 99L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),  // first hit at rank 2
      (2L, 98L, 1L), (2L, 97L, 2L))                  // nothing relevant
      .toDF("query_id", "doc_id", "rank")            // query 3: no rows at all
    val got = Metrics.rankedEval(system, truth)
      .orderBy("query_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 2L, 3L, 500000L, 666666L),
      (2L, 2L, 0L, 1L, 0L, 0L),
      (3L, 0L, 0L, 1L, 0L, 0L)), s"got $got")
    // bad ranks fail loudly
    val e = intercept[Exception] {
      Metrics.rankedEval(Seq((1L, 10L, 0L)).toDF("query_id", "doc_id", "rank"),
        truth).collect()
    }
    assert(e.getMessage.contains("1-based"))
  }
}
