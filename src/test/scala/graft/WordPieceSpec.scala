package graft

import graft.search.{BpeVocab, WordPiece}

/** Pins [[graft.search.WordPiece]]: the likelihood argmax (where it
  * genuinely diverges from BPE's count argmax), the Q18 score
  * arithmetic, greedy longest-match segmentation with piece_l2 cut-point
  * checksums, whole-word UNK semantics, and the per-doc encode report.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: likelihood argmax diverges from BPE's count argmax") {
    // corpus "aa aa ab": pair counts (a,a)=2, (a,b)=1; symbol counts
    // a=5, b=1. score(a,a) = 2e18/25 = 8e16 < score(a,b) = 1e18/5 =
    // 2e17 — WordPiece merges the rare-but-cohesive (a,b); BPE the
    // frequent (a,a).
    val docs = Seq(Tuple1("aa aa ab")).toDF("text")
    val (wp, w1) = WordPiece.learnMerges(docs, "text", 1)
    BpeVocab.release(w1)
    assert(wp.map(m => (m.left, m.right)) === Seq(("a", "b")))
    assert(wp.head.n === 1L && wp.head.cl === 5L && wp.head.cr === 1L)
    assert(wp.head.scoreQ18 === 200000000000000000L)
    val (bpe, w2) = BpeVocab.learnMerges(docs, "text", 1)
    BpeVocab.release(w2)
    assert(bpe.map(m => (m.left, m.right)) === Seq(("a", "a")))
  }

  test("learnMerges: multi-step chain merges products, stops when no pair remains") {
    // "ab" alone: step 1 must merge (a,b) — the only pair — and step 2
    // has no adjacent pair left (every word is one symbol)
    val docs = Seq(Tuple1("ab ab")).toDF("text")
    val (wp, w) = WordPiece.learnMerges(docs, "text", 5)
    BpeVocab.release(w)
    assert(wp.map(m => (m.left, m.right)) === Seq(("a", "b")))
    assert(wp.head.n === 2L && wp.head.cl === 2L && wp.head.cr === 2L)
  }

  test("vocabulary: alphabet union merge products, sorted distinct") {
    val docs = Seq(Tuple1("ab ba")).toDF("text")
    val merges = Seq(WordPiece.WpMerge(1, "a", "b", 1L, 2L, 2L, 0L))
    val vocab = WordPiece.vocabulary(docs, "text", merges)
    assert(vocab === Seq("a", "ab", "b"))
  }

  test("segmentWords: longest-match-first, piece_l2 pins cut points, whole-word UNK") {
    val vocab = Seq("a", "b", "c", "ab", "bc")
    val words = Seq("abc", "abab", "cc", "xa", "abx")
      .map(Tuple1(_)).toDF("word")
    val got = WordPiece.segmentWords(words, "word", vocab)
      .as[(String, Boolean, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // "abc" → ab|c: the cursor takes the LONGEST prefix (ab, not a);
    // "bc" never fires because position 2 is inside the ab piece
    assert(got("abc") === ((false, 2L, 5L)))
    assert(got("abab") === ((false, 2L, 8L)))
    assert(got("cc") === ((false, 2L, 2L)))
    // unmatched at position 1 → whole word UNK with zeroed counts
    assert(got("xa") === ((true, 0L, 0L)))
    // mid-word UNK after progress resets the counts too
    assert(got("abx") === ((true, 0L, 0L)))
  }

  test("encodeGreedy: per-doc report, UNK word counts one piece and no l2") {
    val docs = Seq((1L, "ab xq ab"), (2L, "abc"))
      .toDF("doc_id", "text")
    val vocab = Seq("a", "b", "c", "ab", "bc")
    val got = WordPiece.encodeGreedy(docs, "doc_id", "text", vocab)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // doc 1: ab (1 piece, l2 4) + xq (UNK → 1 piece, l2 0) + ab
    assert(got(1L) === ((3L, 1L, 3L, 8L)))
    // doc 2: abc → ab|c
    assert(got(2L) === ((1L, 0L, 2L, 5L)))
  }

  test("mergeDrift: identical corpus matches every step; shifted marginals flip the argmax") {
    val base = Seq(Tuple1("aa aa ab")).toDF("text")
    val (stored, w1) = WordPiece.learnMerges(base, "text", 1)
    BpeVocab.release(w1)
    // same corpus → drift-free
    val same = WordPiece.mergeDrift(base, "text", stored)
      .as[(Long, String, String, Long, Option[String], Option[String], Option[Long], Boolean)]
      .collect()
    assert(same.forall(_._8), s"identical corpus must match: ${same.toSeq}")
    // today's corpus holds the (a,b) pair count but floods 'b' marginals:
    // score(a,b) = 1e18/(5·9) collapses below score(a,a) = 2e18/25 —
    // ratio drift with a STABLE stored-pair count, the class raw-count
    // drift misses
    val shifted = Seq(Tuple1("aa aa ab bb bb bb bb")).toDF("text")
    val drift = WordPiece.mergeDrift(shifted, "text", stored)
      .as[(Long, String, String, Long, Option[String], Option[String], Option[Long], Boolean)]
      .collect()
    assert(drift.length === 1 && !drift.head._8,
      s"marginal shift must flip the step-1 argmax: ${drift.toSeq}")
    assert(drift.head._5.contains("a") && drift.head._6.contains("a"),
      s"the shifted corpus learns (a,a) first (2e18/25 beats 4e18/81): ${drift.toSeq}")
  }

  test("merge table and vocabulary persist through parquet exactly") {
    val docs = Seq(Tuple1("ab ab ba b")).toDF("text")
    val (merges, w) = WordPiece.learnMerges(docs, "text", 2)
    BpeVocab.release(w)
    val vocab = WordPiece.vocabulary(docs, "text", merges)
    val dir = java.nio.file.Files.createTempDirectory("wp_model").toString
    WordPiece.mergesToDF(spark, merges).write.mode("overwrite").parquet(s"$dir/merges")
    WordPiece.vocabToDF(spark, vocab).write.mode("overwrite").parquet(s"$dir/vocab")
    assert(WordPiece.mergesFromDF(spark.read.parquet(s"$dir/merges")) === merges)
    assert(WordPiece.vocabFromDF(spark.read.parquet(s"$dir/vocab")) === vocab)
    // a gapped merge table (partial write) must refuse to load
    val gapped = WordPiece.mergesToDF(spark, merges)
      .filter(org.apache.spark.sql.functions.col("step") =!= 1)
    assertThrows[IllegalArgumentException] {
      WordPiece.mergesFromDF(gapped)
    }
  }

  test("encodeGreedy: deterministic under repartitioning") {
    val docs = (1L to 50L).map(i => (i, s"ab${"c" * (i % 3).toInt} abab x${i % 5}"))
      .toDF("doc_id", "text")
    val vocab = Seq("a", "b", "c", "ab", "abc")
    val a = WordPiece.encodeGreedy(docs, "doc_id", "text", vocab)
      .orderBy("id").collect().toSeq
    val b = WordPiece.encodeGreedy(docs.repartition(7), "doc_id", "text", vocab)
      .orderBy("id").collect().toSeq
    assert(a === b)
  }
}
