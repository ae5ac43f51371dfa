package graft

import graft.functions.{TextFunctions, VectorFunctions}
import graft.functions.expr.{MinHashBuckets, SimHash64, WordShingles}
import org.apache.spark.sql.functions._

/** Native Catalyst expressions: semantics and the statistical properties
  * the dedup operators rely on.
  */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("WordShingles: distinct consecutive n-grams, normalized") {
    val out = Seq("The  quick Quick brown fox", "a b", "", "x y z x y z")
      .toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 2).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("the quick", "quick quick", "quick brown", "brown fox"))
    assert(out(1) === Seq("a b")) // exactly n tokens -> one shingle
    assert(out(2) === Nil)
    assert(out(3) === Seq("x y", "y z", "z x")) // distinct, first-occurrence order
  }

  test("WordShingles: null text -> empty, unicode preserved") {
    val out = Seq((1, null: String), (2, "héllo wörld héllo wörld"))
      .toDF("id", "t")
      .select(TextFunctions.wordShingles(col("t"), 2).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) === Nil)
    assert(out(1) === Seq("héllo wörld", "wörld héllo"))
  }

  test("CharShingles: distinct char n-grams of normalized text") {
    val out = Seq("AB  cd", "x", "", (null: String))
      .toDF("t")
      .select(TextFunctions.charShingles(col("t"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("ab ", "b c", " cd")) // whitespace collapsed, lowercased
    assert(out(1) === Seq("x")) // shorter than n -> the whole string
    assert(out(2) === Nil)
    assert(out(3) === Nil)
  }

  test("MinHashBuckets: identical sets share all buckets, disjoint share none") {
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")),
      (3L, Seq("x y z", "y z w", "z w v")))
      .toDF("id", "features")
      .select(col("id"), MinHashBuckets.minhash_buckets(col("features"), 64, 16).as("bb"))
      .select(col("id"), explode(col("bb")).as("b"))
      .select(col("id"), col("b.band"), col("b.bucket"))
    val buckets = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val b1 = buckets.filter(_._1 == 1L).map(x => (x._2, x._3)).toSet
    val b2 = buckets.filter(_._1 == 2L).map(x => (x._2, x._3)).toSet
    val b3 = buckets.filter(_._1 == 3L).map(x => (x._2, x._3)).toSet
    assert(b1 === b2)
    assert(b1.intersect(b3).isEmpty)
    assert(b1.size === 16)
  }

  test("MinHash band collision tracks Jaccard similarity") {
    // ~90% overlapping sets must collide in at least one of 16 bands
    // (p = 1-(1-j^4)^16 ≈ 1.0); ~5% overlap should rarely collide.
    val hi = (0 until 20).map(i => s"tok$i")
    val hiB = hi.drop(2) ++ Seq("x1", "x2") // jaccard ≈ 18/22 ≈ 0.82
    val lo = (0 until 20).map(i => s"other$i")
    val df = Seq((1L, hi), (2L, hiB), (3L, lo)).toDF("id", "f")
      .select(col("id"), explode(MinHashBuckets.minhash_buckets(col("f"), 64, 16)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bucket").as("bucket"))
    val pairs = df.as("a").join(df.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" && $"a.id" < $"b.id")
      .select($"a.id", $"b.id").distinct().as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
    assert(!pairs.contains((2L, 3L)))
  }

  test("LangId: classifies stopword-bearing text, und on no signal") {
    val out = Seq(
      "the cat sat on the mat and it was happy",
      "le chat est dans la maison avec le chien",
      "der Hund und die Katze sind nicht im Haus",
      "el perro y el gato en la casa como siempre",
      "qwerty zxcvb 12345",
      "这是一个中文句子我们都在这里").toDF("t")
      .select(TextFunctions.langId(col("t")).as("l")).as[String].collect()
    assert(out === Seq("en", "fr", "de", "es", "und", "zh"))
  }

  test("LangId: null -> und") {
    val out = Seq((1, null: String)).toDF("id", "t")
      .select(TextFunctions.langId(col("t")).as("l")).as[String].collect()
    assert(out === Seq("und"))
  }

  test("Sentiment: pos/neg/n-a domain incl. null and tie") {
    val out = Seq(
      "the room was great and clean, we loved it",
      "terrible dirty room, awful noisy night",
      "the room had a bed",          // no signal -> n/a
      "great but awful",             // tie -> n/a
      null.asInstanceOf[String],
      "  ").toDF("t")
      .select(TextFunctions.sentiment(col("t")).as("s")).as[String].collect()
    assert(out === Seq("pos", "neg", "n/a", "n/a", "n/a", "n/a"))
  }

  test("SimHash64: hamming distance small for near-identical, large for unrelated") {
    val base = (0 until 40).map(i => s"w$i")
    val near = base.updated(3, "changed")
    val far = (0 until 40).map(i => s"v$i")
    val out = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "toks")
      .select(col("id"), SimHash64.simhash64(col("toks")).as("sig"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(out(1L), out(2L)) <= 8)
    assert(ham(out(1L), out(3L)) > 16)
  }

  test("TokenCount native expression agrees with size(tokens(_)) incl. edges") {
    val texts = Seq(
      "the quick brown fox",
      "  leading and trailing  ",
      "tabs\tand\nnewlines\r\nmixed",
      "one",
      "",
      "   ",
      "unicode 多字节 tokens ümlaut",
      "\u0001 control at boundary",   // SQL trim strips spaces only: still a token
      "inner\u0001control stays one token",
      "\u0002\u0003",                 // non-\\s controls form one token
      null.asInstanceOf[String])
    val df = texts.toDF("t").select(
      TextFunctions.tokenCount(col("t")).as("fast"),
      size(filter(split(lower(trim(col("t"))), "\\s+"), x => length(x) > 0)).as("ref"))
    df.collect().foreach { r =>
      val fast = if (r.isNullAt(0)) null else r.getInt(0)
      val ref = if (r.isNullAt(1)) null else r.getInt(1)
      assert(fast === ref, s"native $fast != composed $ref")
    }
  }

  test("CosineSim native expression agrees with the built-in composition") {
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      (Seq(1f, 2f, 0f), Seq(-1f, 1f, 3f)))
      .toDF("a", "b")
      .select(
        VectorFunctions.cosine(col("a"), col("b")).as("fast"),
        VectorFunctions.cosineBuiltin(col("a"), col("b")).as("ref"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("zero vector cosine is 0, not NaN") {
    val out = Seq((Seq(0f, 0f), Seq(1f, 2f))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .as[Double].collect()
    assert(out(0) === 0.0)
  }

  test("HyperplaneSig native expression is bit-identical to the composed form") {
    val dim = 16; val nBits = 12
    // the composed reference the oracles replay: per plane
    // aggregate(zip_with(v, lits, _*_), 0.0, _+_) >= 0, OR-reduced
    def composed(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      VectorFunctions.hyperplanes(dim, nBits).zipWithIndex.map { case (p, i) =>
        val d = aggregate(zip_with(vec, array(p.map(lit): _*),
          (x, y) => x.cast("double") * y), lit(0.0), (acc, x) => acc + x)
        when(d >= 0, lit(1L << i)).otherwise(0L)
      }.reduce(_.bitwiseOR(_))
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 200).map(_ => Seq.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = vecs.toDF("v")
      .select(
        VectorFunctions.hyperplaneSignature(col("v"), dim, nBits).as("fast"),
        composed(col("v")).as("ref"))
      .as[(Long, Long)].collect()
    rows.foreach { case (fast, ref) => assert(fast === ref) }
    assert(rows.map(_._1).distinct.length > 1, "vacuous: all signatures equal")
  }

  test("HyperplaneSig: length mismatch fails loudly, null element zeroes the signature") {
    val err = intercept[Exception] {
      Seq(Seq(1f, 2f)).toDF("v")
        .select(VectorFunctions.hyperplaneSignature(col("v"), 3, 8))
        .collect()
    }
    assert(err.getMessage != null)
    // composed-form parity: a null element nulls every dot -> all bits 0
    val sig = Seq(Seq[Option[Float]](Some(1f), None, Some(2f))).toDF("v")
      .select(VectorFunctions.hyperplaneSignature(col("v"), 3, 8).as("s"))
      .as[Long].collect()
    assert(sig(0) === 0L)
    // a NULL vector (corrupt embedding row) must fail loudly, not silently
    // hash into no LSH bucket and pass dedup unexamined
    val nullErr = intercept[Exception] {
      Seq((1L, Some(Seq(1f, 2f, 3f))), (2L, None: Option[Seq[Float]])).toDF("id", "v")
        .select(VectorFunctions.hyperplaneSignature(col("v"), 3, 8))
        .collect()
    }
    assert(nullErr.getMessage.contains("null vector") ||
      Option(nullErr.getCause).exists(_.getMessage.contains("null vector")))
  }

  test("TokenWindowHashes: rolling update equals direct per-window recompute") {
    // independent reimplementation of the documented hash (FNV-1a 64 per
    // token, degree-(k-1) polynomial in base 1000003): the rolling
    // subtract-multiply-add in the expression must be EXACT, not a drift
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach(b => h = (h ^ (b & 0xffL)) * 0x100000001b3L)
      h
    }
    def direct(toks: Seq[String], k: Int): Seq[Long] =
      if (toks.length < k) Nil
      else toks.sliding(k).map(_.foldLeft(0L)((acc, t) => acc * 1000003L + fnv(t))).toSeq
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "bb", "héllo", "wörld", "日本語", "x1", "zz", "émoji")
    val arrays = (0 until 40).map(_ => Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length))))
    for (k <- Seq(1, 3, 8)) {
      val got = arrays.toDF("toks")
        .select(graft.functions.expr.TokenWindowHashes.token_window_hashes(col("toks"), k).as("h"))
        .as[Seq[Long]].collect().toSeq
      assert(got === arrays.map(direct(_, k)), s"k=$k")
    }
    assert(arrays.exists(a => a.length >= 8 && direct(a, 8).distinct.length > 1),
      "vacuous: fixtures never produce multiple distinct window hashes")
  }

  test("TokenWindowHashes: shared windows collide, short and null inputs degrade") {
    // equal k-windows in different docs map to equal keys (the SpanDedup
    // contract) and the surrounding context does not leak into the hash
    val rows = Seq(
      (1L, Seq("p", "q", "alpha", "bravo", "charlie", "tail")),
      (2L, Seq("alpha", "bravo", "charlie", "other", "words")),
      (3L, Seq("alpha", "bravo")), // shorter than k -> []
      (4L, null: Seq[String]))
      .toDF("id", "toks")
      .select(col("id"), graft.functions.expr.TokenWindowHashes.token_window_hashes(col("toks"), 3).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(rows(1L)(2) === rows(2L)(0)) // the shared (alpha bravo charlie) window
    assert(rows(1L).length === 4 && rows(2L).length === 3)
    assert(rows(3L) === Nil)
    assert(rows(4L) === null) // null-intolerant, posexplode drops it
  }

  test("NfcNormalize: decomposed composes, idempotent, null propagates; canonicalizeText chain") {
    val s = spark
    import s.implicits._
    import graft.functions.expr.NfcNormalize.nfc_normalize
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    val rows = Seq((1L, decomposed), (2L, composed), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(col("id"), nfc_normalize(col("t")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(rows(1L) === composed && rows(1L).length === 4)
    assert(rows(2L) === composed)
    assert(rows(3L) === null)
    // the two variants hash identically after canonicalization — the
    // point of running it before any fingerprint operator
    assert(rows(1L) === rows(2L))

    val canon = Seq((1L, " a\u200Bb  " + decomposed + " x\u00A0y\u3000z  "))
      .toDF("id", "t")
      .select(graft.functions.TextFunctions.canonicalizeText(col("t")))
      .head().getString(0)
    assert(canon === "ab " + composed + " x y z", s"got '$canon'")

    // SQL registration serves the same expression
    val viaSql = spark.sql("SELECT nfc_normalize('cafe\u0301')").head().getString(0)
    assert(viaSql === composed)
  }

  test("htmlToText: blocks to lines, tags stripped, entities single-decode, scripts die whole") {
    import graft.functions.TextFunctions
    def x(html: String): String =
      Seq(Tuple1(html)).toDF("h")
        .select(TextFunctions.htmlToText(col("h"))).head().getString(0)
    assert(x("<html><body><h1>Title</h1><p>one</p><p>two</p></body></html>") ===
      "Title\none\ntwo")
    // script/style bodies vanish whole, even with tags inside
    assert(x("<script>if (a<b) { x('<p>not text</p>'); }</script>after") === "after")
    assert(x("<STYLE>p { color: red }</STYLE>kept") === "kept")
    // comments vanish; inline tags become spaces, not line breaks
    assert(x("a <b>bold</b><!-- note --> c") === "a bold c")
    // entity decode is single-pass with &amp; last: &amp;lt; -> &lt;
    assert(x("x &amp;lt; y &lt;tag&gt; &quot;q&#39; &nbsp;z") ===
      "x &lt; y <tag> \"q'  z".replaceAll(" +", " "))
    // uppercase/attribute-laden block tags still break lines
    assert(x("<DIV class='a'>one</DIV><BR/>two") === "one\ntwo")
    // line structure survives for line-based ops: 3 lines, no blank runs
    assert(x("<ul><li>a</li><li>b</li><li>c</li></ul>").split("\n").toSeq ===
      Seq("a", "b", "c"))
  }

  test("asofBackwardWithin: stale matches null out, in-tolerance keep age, ties match asofBackward") {
    import graft.operators.TemporalJoins
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val left = Seq((1L, 10L, ts(10000)), (1L, 11L, ts(20000)), (2L, 20L, ts(500)))
      .toDF("k", "lid", "ts")
    val right = Seq((1L, 100L, ts(9990)), (1L, 101L, ts(5000)), (2L, 200L, ts(400)))
      .toDF("k", "rid", "ts")
    val got = TemporalJoins.asofBackwardWithin(left, right, Seq("k"),
        "ts", "ts", Seq("rid"), "rid", toleranceSec = 100L)
      .select(col("k"), col("lid"), col("asof.rid").as("m"), col("asof_age_us"))
      .orderBy("k", "lid")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(got === Seq(
      (1L, 10L, Some(100L), Some(10L * 1000000L)),   // 10 s old: in tolerance
      (1L, 11L, None, None),                          // best match 10010 s old: stale
      (2L, 20L, Some(200L), Some(100L * 1000000L)))) // exactly at the bound: inclusive
    // with an unbounded tolerance the operator degenerates to asofBackward
    val loose = TemporalJoins.asofBackwardWithin(left, right, Seq("k"),
        "ts", "ts", Seq("rid"), "rid", toleranceSec = 1000000L)
      .select(col("k"), col("lid"), col("asof.rid").as("m"))
      .orderBy("k", "lid").as[(Long, Long, Option[Long])].collect().toSeq
    val base = TemporalJoins.asofBackward(left, right, Seq("k"),
        "ts", "ts", Seq("rid"), "rid")
      .select(col("k"), col("lid"), col("asof.rid").as("m"))
      .orderBy("k", "lid").as[(Long, Long, Option[Long])].collect().toSeq
    assert(loose === base)
  }

  test("hammingChunkValsJvm mirrors the Column slicing bit-for-bit at every radius") {
    import graft.functions.HashFunctions
    val rnd = new scala.util.Random(42)
    val sigs = Seq.fill(50)(rnd.nextLong()) ++ Seq(0L, -1L, Long.MinValue, Long.MaxValue)
    for (mh <- Seq(0, 3, 6, 14)) {
      val df = sigs.toDF("sig")
      val fromCols = df.select(col("sig"),
          array(HashFunctions.hammingChunkVals(col("sig"), mh): _*).as("a"))
        .as[(Long, Seq[Long])].collect()
      fromCols.foreach { case (s, a) =>
        assert(a === HashFunctions.hammingChunkValsJvm(s, mh).toSeq,
          s"chunk mismatch at sig=$s maxHamming=$mh")
      }
    }
  }
}
