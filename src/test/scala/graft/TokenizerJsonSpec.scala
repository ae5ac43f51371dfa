package graft

import graft.search.{BpeVocab, TokenizerJson, Unigram, WordPiece}

/** Round-trip faithfulness of the Hugging Face tokenizer.json interop:
  * export → import must reproduce the exact serving model, and encoding
  * from the imported form must be bit-identical to encoding from the
  * trained one (the r13 VERDICT #6 contract). Also pins the schema
  * shape an external consumer parses and the loud-failure behavior on
  * files this engine did not write.
  */
class TokenizerJsonSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog the quick brown fox"),
    (2L, "pack my box with five dozen liquor jugs the quick brown fox"),
    (3L, "sphinx of black quartz judge my vow the lazy dog"),
    (4L, "the five boxing wizards jump quickly over the lazy dog"))
    .toDF("doc_id", "text")

  test("BPE: export → import reproduces (step, left, right); encode is identical") {
    val (merges, words) = BpeVocab.learnMerges(docs, "text", 5)
    BpeVocab.release(words)
    assert(merges.nonEmpty)
    val json = TokenizerJson.exportBpe(merges, TokenizerJson.charAlphabet(docs, "text"))
    val back = TokenizerJson.importBpeMerges(json)
    assert(back.map(m => (m.step, m.left, m.right)) ===
      merges.map(m => (m.step, m.left, m.right)))
    assert(back.forall(_.n == 0L), "schema carries no counts; import documents n=0")
    val direct = BpeVocab.encode(docs, "doc_id", "text", merges)
      .orderBy("id").collect().toSeq
    val viaJson = BpeVocab.encode(docs, "doc_id", "text", back)
      .orderBy("id").collect().toSeq
    assert(viaJson === direct, "encode from the imported model must be bit-identical")
  }

  test("BPE: exported file has the HF schema shape (ids, merges, envelope)") {
    val (merges, words) = BpeVocab.learnMerges(docs, "text", 4)
    BpeVocab.release(words)
    val alphabet = TokenizerJson.charAlphabet(docs, "text")
    val json = TokenizerJson.exportBpe(merges, alphabet)
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(root.path("version").asText() === "1.0")
    assert(root.path("model").path("type").asText() === "BPE")
    assert(root.path("normalizer").path("type").asText() === "Lowercase")
    assert(root.path("pre_tokenizer").path("type").asText() === "WhitespaceSplit")
    val vocab = root.path("model").path("vocab")
    // ids are 0..V-1 with the alphabet first, merge products after
    val ids = scala.collection.mutable.ArrayBuffer.empty[Int]
    vocab.properties().forEach(e => ids += e.getValue.asInt())
    assert(ids.toSeq === (0 until ids.size))
    alphabet.zipWithIndex.foreach { case (ch, i) =>
      assert(vocab.path(ch).asInt(-1) === i, s"alphabet symbol '$ch' at id $i")
    }
    val ms = root.path("model").path("merges")
    assert(ms.size() === merges.size)
    assert(ms.get(0).asText() === s"${merges.head.left} ${merges.head.right}")
  }

  test("WordPiece: vocabulary round-trips (unk at id 0, dropped on import); greedy encode identical") {
    val (merges, words) = WordPiece.learnMerges(docs, "text", 5)
    BpeVocab.release(words)
    val vocab = WordPiece.vocabulary(docs, "text", merges)
    val json = TokenizerJson.exportWordPiece(vocab)
    val back = TokenizerJson.importWordPieceVocab(json)
    assert(back === vocab)
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(root.path("model").path("vocab").path("[UNK]").asInt(-1) === 0)
    assert(root.path("model").path("unk_token").asText() === "[UNK]")
    val direct = WordPiece.encodeGreedy(docs, "doc_id", "text", vocab)
      .orderBy("id").collect().toSeq
    val viaJson = WordPiece.encodeGreedy(docs, "doc_id", "text", back)
      .orderBy("id").collect().toSeq
    assert(viaJson === direct)
  }

  test("Unigram: Q16 score map round-trips losslessly; encode identical") {
    val scores = Unigram.fitScores(docs, "text", maxPieceLen = 4, topV = 50)
    val json = TokenizerJson.exportUnigram(scores)
    val back = TokenizerJson.importUnigramScores(json)
    assert(back === scores)
    val direct = Unigram.encode(docs, "doc_id", "text", scores, maxPieceLen = 4)
      .orderBy("id").collect().toSeq
    val viaJson = Unigram.encode(docs, "doc_id", "text", back, maxPieceLen = 4)
      .orderBy("id").collect().toSeq
    assert(viaJson === direct)
  }

  test("importers fail loud on wrong model type, malformed JSON, foreign scores") {
    val (merges, words) = BpeVocab.learnMerges(docs, "text", 3)
    BpeVocab.release(words)
    val bpeJson = TokenizerJson.exportBpe(merges, TokenizerJson.charAlphabet(docs, "text"))
    intercept[IllegalArgumentException] {
      TokenizerJson.importWordPieceVocab(bpeJson)
    }
    intercept[IllegalArgumentException] {
      TokenizerJson.importBpeMerges("""{"not": "a tokenizer"}""")
    }
    intercept[IllegalArgumentException] {
      TokenizerJson.importBpeMerges("{ definitely not json")
    }
    // a Unigram file with non-integer scores is some other trainer's —
    // importing it as exact Q16 integers would corrupt silently
    intercept[IllegalArgumentException] {
      TokenizerJson.importUnigramScores(
        """{"model": {"type": "Unigram", "vocab": [["a", -2.5]]}}""")
    }
  }
}
