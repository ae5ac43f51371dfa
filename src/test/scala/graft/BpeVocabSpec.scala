package graft

import graft.search.BpeVocab
import org.apache.spark.sql.functions._

/** BPE vocabulary induction: classic merge order, greedy non-overlap,
  * encode-vs-train consistency, early stop. */
class BpeVocabSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("id", "txt")
  }

  test("learns the classic low/lower/lowest merge sequence with deterministic ties") {
    val corpus = docs((1L, "low low low lower lowest"))
    val (merges, words) = BpeVocab.learnMerges(corpus, "txt", 3)
    words.unpersist()
    assert(merges.map(m => (m.step, m.left, m.right, m.n)) === Seq(
      (1, "l", "o", 5L),   // ties (l,o)=(o,w)=5 break to the lexically smaller left
      (2, "lo", "w", 5L),
      (3, "low", "e", 2L)))
  }

  test("merge application is greedy left-to-right non-overlapping") {
    val corpus = docs((1L, "aaaa"))
    val (merges, words) = BpeVocab.learnMerges(corpus, "txt", 2)
    val syms = words.select("syms").head().getSeq[String](0)
    words.unpersist()
    assert(merges.map(m => (m.step, m.left, m.right, m.n)) === Seq(
      (1, "a", "a", 3L),   // three overlapping (a,a) positions count 3...
      (2, "aa", "aa", 1L)  // ...but only TWO non-overlapping merges apply
    ))
    assert(syms === Seq("aaaa"))
  }

  test("encode applies the learned table to unseen text; compression reported") {
    val corpus = docs((1L, "low low low lower lowest"))
    val (merges, words) = BpeVocab.learnMerges(corpus, "txt", 3)
    words.unpersist()
    val out = BpeVocab.encode(docs((9L, "low lower")), "id", "txt", merges)
      .head()
    // low -> [low] (1), lower -> [lowe, r] (2) after the (low,e) merge
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) === ((2L, 8L, 3L)))
  }

  test("encode raises on duplicate ids even when one row has null or empty text") {
    val corpus = docs((1L, "low low lower"))
    val (merges, words) = BpeVocab.learnMerges(corpus, "txt", 2)
    BpeVocab.release(words)
    // the regression case: the old token-count guard short-circuited into
    // the null/zero branch for the degenerate row and emitted TWO rows
    // for the id instead of raising
    for (degenerate <- Seq(null.asInstanceOf[String], "", "low")) {
      val s = spark
      import s.implicits._
      val dup = Seq((9L, "low lower"), (9L, degenerate)).toDF("id", "txt")
      val e = intercept[Exception] {
        BpeVocab.encode(dup, "id", "txt", merges).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("duplicate")),
        s"degenerate=$degenerate must raise the duplicate-id error, got $e")
    }
    // non-duplicate null/empty rows keep the documented semantics
    val s = spark
    import s.implicits._
    val ok = BpeVocab.encode(
        Seq((1L, "low"), (2L, null.asInstanceOf[String]), (3L, "")).toDF("id", "txt"),
        "id", "txt", merges)
      .orderBy("id").collect()
    assert(ok.length === 3)
    assert(!ok(0).isNullAt(3) && ok(0).getLong(3) > 0L)
    assert(ok(1).isNullAt(3), "null text yields null n_bpe_syms")
    assert(ok(2).getLong(3) === 0L, "token-less text yields zero n_bpe_syms")
    // null ids are ids (null-safe joins): one null-id row is EMITTED,
    // two null-id rows are a duplicate and RAISE — an equi-join would
    // silently delete both
    def nid(rows: (java.lang.Long, String)*) = rows.toDF("id", "txt")
    val one = BpeVocab.encode(nid((null, "low"), (7L, "lower")), "id", "txt", merges)
      .collect()
    assert(one.length === 2)
    assert(one.exists(_.isNullAt(0)), "the null-id row must survive")
    val dupNull = intercept[Exception] {
      BpeVocab.encode(nid((null, "low"), (null, "lower")), "id", "txt", merges)
        .collect()
    }
    def msgs2(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs2(t.getCause)
    assert(msgs2(dupNull).exists(_.contains("duplicate")), s"got $dupNull")
    // the guard must survive column pruning: a downstream select that
    // DROPS n_bpe_syms (where the raise used to live) must still raise —
    // the guard is a Filter now, which no projection can prune away
    val pruned = intercept[Exception] {
      BpeVocab.encode(Seq((9L, "low lower"), (9L, "low")).toDF("id", "txt"),
          "id", "txt", merges)
        .select("id").collect()
    }
    assert(msgs2(pruned).exists(_.contains("duplicate")),
      s"pruned select must still raise, got $pruned")
  }

  test("merge table persists through parquet; encode vs stored == encode vs fresh") {
    val corpus = docs((1L, "low low low lower lowest"))
    val (merges, words) = BpeVocab.learnMerges(corpus, "txt", 3)
    words.unpersist()
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    BpeVocab.mergesToDF(spark, merges).write.mode("overwrite").parquet(s"$dir/merges")
    val loaded = BpeVocab.mergesFromDF(spark.read.parquet(s"$dir/merges"))
    assert(loaded === merges, "merge table must round-trip parquet exactly")
    val unseen = docs((9L, "slower lowlands"))
    val a = BpeVocab.encode(unseen, "id", "txt", merges).collect().toSeq
    val b = BpeVocab.encode(unseen, "id", "txt", loaded).collect().toSeq
    assert(a === b)
    intercept[IllegalArgumentException] {
      BpeVocab.mergesFromDF(spark.read.parquet(s"$dir/merges").filter(col("step") =!= 2))
    }
  }

  test("encodeByLookup equals fold-encode on the training corpus") {
    val corpus = docs((1L, "low low lower"), (2L, "lowest low"))
    val (merges, words) = BpeVocab.learnMerges(corpus, "txt", 4)
    val byLookup = BpeVocab.encodeByLookup(corpus, "id", "txt", words)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val byFold = BpeVocab.encode(corpus, "id", "txt", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    words.unpersist()
    assert(byLookup === byFold,
      "lookup against trained words must equal re-applying the merges per token")
  }

  test("mergeDrift: identical corpus matches; a shifted corpus flags the diverged steps") {
    val base = docs((1L, "low low low lower lowest"))
    val (stored, w) = BpeVocab.learnMerges(base, "txt", 3)
    w.unpersist(blocking = false)
    // same corpus -> every step matches, counts equal
    val same = BpeVocab.mergeDrift(base, "txt", stored)
      .orderBy("step").collect()
    assert(same.forall(_.getBoolean(7)), "identical corpus must match all steps")
    assert(same.map(_.getLong(3)).toSeq === same.map(_.getLong(6)).toSeq)
    // shifted corpus: 'heehee' pushes (e,e)/(h,e) pairs to the top ->
    // early steps diverge and are flagged
    val shifted = docs((1L, "heehee heehee heehee heehee low"))
    val drift = BpeVocab.mergeDrift(shifted, "txt", stored)
      .orderBy("step").collect()
    assert(drift.exists(!_.getBoolean(7)), "shifted corpus must flag a mismatch")
    // degenerate new corpus (single chars, no pairs): new_* null, no match
    val empty = BpeVocab.mergeDrift(docs((1L, "a b c")), "txt", stored)
      .orderBy("step").collect()
    assert(empty.forall(r => r.isNullAt(4) && !r.getBoolean(7)),
      "a corpus with no learnable merges must report null fresh steps")
  }

  test("batched == sequential at k=64 (realistic-vocabulary scale, not toy k)") {
    // deterministic corpus with hundreds of learnable merges: 120
    // distinct 8-char words over a 12-letter alphabet, Zipf-ish freqs
    // via repetition — enough pair diversity that 64 merges never run
    // dry, with shared hot symbols so the batched acceptance rule's
    // symbol-disjointness keeps mattering at depth (PropertySpec covers
    // k<=6 exhaustively; this pins the equality where production
    // vocabularies live)
    val alpha = "abcdefghijklmnop"
    val words = (0 until 300).map { i =>
      (0 until 10).map(j => alpha((i * 31 + j * 7 + i * j) % 16)).mkString
    }
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(1 + (i % 7)) { w } }.mkString(" ")
    val corpus = docs((1L, text))
    val (seqM, w1) = BpeVocab.learnMerges(corpus, "txt", 64)
    val (batM, w2) = BpeVocab.learnMergesBatched(corpus, "txt", 64)
    assert(seqM.size === 64, "fixture must support a full 64-merge run")
    assert(seqM === batM)
    assert(w1.orderBy("word").collect().toSeq === w2.orderBy("word").collect().toSeq)
    BpeVocab.release(w1); BpeVocab.release(w2)
  }

  test("batched merge APPLICATION (k > 64) equals the single projection and a Scala reference") {
    // r13: encodeBytes at k=256 used to die in Catalyst Resolution (the
    // single-projection fold of k nested mergeOnce HOFs outgrows the
    // analyzer's iteration cap) — foldMergesBatched cuts the plan every
    // 64 merges with a checkpoint. The production k=4096 row lives in
    // SCALE.md; this pins VALUE equality of the two paths at a k that
    // forces multiple batches, against an independent Scala fold.
    import graft.search.BpeVocab
    import graft.search.BpeVocab.Merge
    // 80 chained merges growing one long prefix: batch boundaries land
    // MID-CHAIN (symbol "a..." spans checkpoints), the worst case for a
    // batching bug. Words: the full 81-char word, a prefix that stops
    // merging at step 39, and one untouched word.
    // 81 DISTINCT printable-ASCII symbols ('!'..'q'): a repeating
    // alphabet would stall the chain at the period (the prefix symbol
    // meets another prefix symbol, not the next char) and the full-word
    // collapse assertion below would be vacuous
    val alpha = (0 until 81).map(i => ('!' + i).toChar.toString)
    val full = alpha.mkString
    val merges = (1 to 80).map { i =>
      Merge(i, alpha.take(i).mkString, alpha(i), 1000L - i)
    }
    val words = { val s = spark; import s.implicits._
      Seq(full, full.take(40), "zz").toDF("word") }
    def rows(mergeBatch: Int): Map[String, Seq[String]] =
      BpeVocab.foldMergesBatched(words, expr("transform(split(word, ''), x -> x)"),
          merges, mergeBatch)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    // independent reference: greedy left-to-right non-overlapping pass
    def ref(word: String): Seq[String] = {
      var syms = word.map(_.toString).toList
      for (m <- merges) {
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == m.left && syms(i + 1) == m.right) {
            out += m.left + m.right; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toList
      }
      syms
    }
    val single = rows(mergeBatch = 1000) // one projection, the pre-r13 shape
    val batched = rows(mergeBatch = 16)  // five checkpointed batches
    assert(single === batched, "batched fold must equal the single projection")
    for (w <- Seq(full, full.take(40), "zz"))
      assert(batched(w) === ref(w), s"engine fold must match the Scala reference on '$w'")
    assert(batched(full) === Seq(full), "80 chained merges must collapse the full word")
    assert(batched("zz") === Seq("z", "z"), "untouched word keeps its char split")
  }

  test("stops early when no adjacent pair remains") {
    val corpus = docs((1L, "a b c a"))
    val (merges, words) = BpeVocab.learnMerges(corpus, "txt", 5)
    words.unpersist()
    assert(merges.isEmpty)
  }

  test("byte-level training is the char-level table transliterated to hex on ASCII text") {
    // on pure-ASCII text every char is one byte, so the byte trainer must
    // learn exactly the char trainer's merges with symbols hex-encoded
    val corpus = docs((1L, "low low low lower lowest"))
    val (charM, w1) = BpeVocab.learnMerges(corpus, "txt", 3)
    val (byteM, w2) = BpeVocab.learnMergesBytes(corpus, "txt", 3)
    BpeVocab.release(w1); BpeVocab.release(w2)
    def hexOf(t: String) = t.getBytes("UTF-8").map("%02X".format(_)).mkString
    assert(byteM.map(m => (m.step, m.left, m.right, m.n)) ===
      charM.map(m => (m.step, hexOf(m.left), hexOf(m.right), m.n)))
  }

  test("byteSplit decomposes multi-byte UTF-8 and encodeBytes is lossless with no UNK") {
    val s = spark
    import s.implicits._
    val syms = Seq("caf\u00e9").toDF("w")
      .select(BpeVocab.byteSplit(col("w"))).head().getSeq[String](0)
    assert(syms === Seq("63", "61", "66", "C3", "A9"))
    // train on ASCII-only text; serve a doc whose every word has bytes
    // OUTSIDE the training alphabet — the char families would UNK it,
    // byte fallback encodes it losslessly, merges simply never apply
    val corpus = docs((1L, "low low low lower lowest"))
    val (merges, w) = BpeVocab.learnMergesBytes(corpus, "txt", 3)
    BpeVocab.release(w)
    val alphabet = BpeVocab.byteAlphabet(corpus, "txt")
    assert(alphabet.forall(_.length == 2))
    val out = BpeVocab.encodeBytes(
      docs((9L, "caf\u00e9 \u6771\u4eac"), (10L, "low lower"), (11L, null.asInstanceOf[String]), (12L, "")),
      "id", "txt", merges, alphabet).collect().map(r => r.getLong(0) -> r).toMap
    // doc 9: 2 words, 5+6 bytes, no merges apply (all bytes OOV), lossless
    assert(out(9L).getLong(1) === 2L)
    assert(out(9L).getLong(2) === 11L)
    assert(out(9L).getLong(3) === 11L)
    assert(out(9L).getLong(4) === 2L)
    assert(out(9L).getBoolean(5))
    // doc 10: in-alphabet, merges compress (low -> 1 sym, lower -> 2)
    assert(out(10L).getLong(3) === 3L)
    assert(out(10L).getLong(4) === 0L)
    assert(out(10L).getBoolean(5))
    // null text -> null counts; empty text -> zeros, vacuous lossless
    assert(out(11L).isNullAt(3) && out(11L).isNullAt(5))
    assert(out(12L).getLong(3) === 0L && out(12L).getBoolean(5))
  }
}
