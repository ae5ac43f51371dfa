package graft

import graft.search.{Unigram, WordPiece}

/** Pins [[graft.search.Unigram]]: the Viterbi likelihood argmax (where
  * it genuinely diverges from WordPiece's greedy longest-match), the
  * packed-key tie-break, UNK quarantine, seed counting, the hard-EM
  * refit arithmetic (hand-computed Q16 values), and the per-doc encode
  * report.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val Q = 65536L

  test("segmentWords: Viterbi global optimum diverges from greedy longest-match") {
    // same vocabulary, three different tokenizers: for "abc" with a rare
    // "ab" and a common "bc", Viterbi picks a|bc (sum -2Q) over greedy's
    // ab|c (sum -11Q)
    val scores = Map("a" -> -Q, "b" -> -Q, "c" -> -Q, "ab" -> -10 * Q, "bc" -> -Q)
    val words = Seq(Tuple1("abc")).toDF("word")
    val got = Unigram.segmentWords(words, "word", scores, maxPieceLen = 2,
        wantPieces = true)
      .as[(String, Boolean, Long, Long, Seq[String])].collect().head
    assert(got === (("abc", false, 2L, -2 * Q, Seq("a", "bc"))))
    // WordPiece greedy on the same vocab takes the longest prefix: ab|c
    val wp = WordPiece.segmentWords(words, "word", scores.keys.toSeq)
      .as[(String, Boolean, Long, Long)].collect().head
    assert(wp === (("abc", false, 2L, 5L)), "greedy must cut ab|c (l2 = 4+1)")
  }

  test("segmentWords: exact likelihood ties break to fewer pieces") {
    // "aa": piece (aa) and path a|a both score -4Q; the packed key
    // subtracts n_pieces, so the single piece wins
    val scores = Map("a" -> -2 * Q, "aa" -> -4 * Q)
    val got = Unigram.segmentWords(Seq(Tuple1("aa")).toDF("word"), "word",
        scores, maxPieceLen = 2, wantPieces = true)
      .as[(String, Boolean, Long, Long, Seq[String])].collect().head
    assert(got === (("aa", false, 1L, -4 * Q, Seq("aa"))))
  }

  test("segmentWords: any unmatched position quarantines the whole word") {
    val scores = Map("a" -> -Q)
    val got = Unigram.segmentWords(Seq("ax", "a", "xa").map(Tuple1(_)).toDF("word"),
        "word", scores, maxPieceLen = 2)
      .drop("pieces").as[(String, Boolean, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") === ((false, 1L, -Q)))
    assert(got("ax") === ((true, 0L, 0L)))
    assert(got("xa") === ((true, 0L, 0L)))
  }

  test("seedCandidates: freq-weighted substring counts, singles always kept") {
    // "ab ab b": words ab(freq 2), b(freq 1) — a=2, b=2+1, ab=2
    val docs = Seq(Tuple1("ab ab b")).toDF("text")
    val got = Unigram.seedCandidates(docs, "text", maxPieceLen = 2, topV = 10)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L, "b" -> 3L, "ab" -> 2L))
    // topV = 0 still keeps every single char
    val noMulti = Unigram.seedCandidates(docs, "text", maxPieceLen = 2, topV = 0)
      .as[(String, Long)].collect().toMap
    assert(noMulti === Map("a" -> 2L, "b" -> 3L))
  }

  test("fitVocab: hand-computed seed -> Viterbi usage -> refit Q16 scores") {
    // corpus "ab ab b": seed a=2 b=3 ab=2, T=7
    //   L(2)=65536 L(3)=98304 L(7)=180224
    //   s(a)=-114688 s(b)=-81920 s(ab)=-114688
    // Viterbi-1: "ab" -> (ab) [-114688 beats a|b = -196608]; "b" -> (b)
    // usage: ab=2, b=1, T1=3; a unused -> dropped
    //   score(ab)=L(2)-L(3)=-32768, score(b)=L(1)-L(3)=-98304
    val docs = Seq(Tuple1("ab ab b")).toDF("text")
    val got = Unigram.fitVocab(docs, "text", maxPieceLen = 2, topV = 10)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      "ab" -> ((2L, 2L, -32768L)),
      "b" -> ((3L, 1L, -98304L))))
  }

  test("encode: per-doc report, UNK word counts one piece and no likelihood") {
    val docs = Seq((1L, "ab b §x"), (2L, "ab ab")).toDF("doc_id", "text")
    val scores = Map("ab" -> -32768L, "b" -> -98304L)
    val got = Unigram.encode(docs, "doc_id", "text", scores, maxPieceLen = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) === ((3L, 1L, 3L, -131072L)))
    assert(got(2L) === ((2L, 0L, 2L, -65536L)))
  }

  test("score table persists through parquet; stored-score encode == fresh-fit encode") {
    val docs = Seq((1L, "ab ab b"), (2L, "b ab")).toDF("doc_id", "text")
    val scores = Unigram.fitScores(docs, "text", maxPieceLen = 2, topV = 10)
    val dir = java.nio.file.Files.createTempDirectory("uni_model").toString
    Unigram.scoresToDF(spark, scores).write.mode("overwrite").parquet(dir + "/scores")
    val loaded = Unigram.scoresFromDF(spark.read.parquet(dir + "/scores"))
    assert(loaded === scores)
    val fresh = Unigram.encode(docs, "doc_id", "text", scores, maxPieceLen = 2)
      .orderBy("id").collect().toSeq
    val served = Unigram.encode(docs, "doc_id", "text", loaded, maxPieceLen = 2)
      .orderBy("id").collect().toSeq
    assert(served === fresh)
  }

  test("scoreDrift: identical corpus is drift-free; vocabulary churn classifies") {
    val base = Seq(Tuple1("ab ab b")).toDF("text")
    val stored = Unigram.fitScores(base, "text", maxPieceLen = 2, topV = 10)
    val same = Unigram.scoreDrift(base, "text", stored, maxPieceLen = 2, topV = 10)
      .as[(String, Option[Long], Option[Long], String)].collect()
    assert(same.forall(r => r._4 == "both" && r._2 == r._3),
      s"identical corpus must be drift-free: ${same.toSeq}")
    // today's corpus drops 'ab' usage and introduces 'cd'
    val shifted = Seq(Tuple1("cd cd b")).toDF("text")
    val drift = Unigram.scoreDrift(shifted, "text", stored, maxPieceLen = 2, topV = 10)
      .as[(String, Option[Long], Option[Long], String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(drift("ab") === "stored_only", s"dropped piece must classify: $drift")
    assert(drift("cd") === "new_only", s"new piece must classify: $drift")
    assert(drift("b") === "both")
  }

  test("encode: deterministic under repartitioning") {
    val docs = (1L to 60L).map(i => (i, s"ab${"b" * (i % 3).toInt} b ab"))
      .toDF("doc_id", "text")
    val scores = Map("a" -> -Q, "b" -> -Q, "ab" -> -Q, "bb" -> -2 * Q)
    val a = Unigram.encode(docs, "doc_id", "text", scores).orderBy("id")
      .collect().toSeq
    val b = Unigram.encode(docs.repartition(7), "doc_id", "text", scores)
      .orderBy("id").collect().toSeq
    assert(a === b)
  }
}
