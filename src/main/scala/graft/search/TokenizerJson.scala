package graft.search

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Interop with the Hugging Face `tokenizer.json` serialization (the
  * public, documented schema of huggingface/tokenizers — one JSON file
  * carrying normalizer / pre-tokenizer / model; the `model` object is
  * `{"type": "BPE", "vocab": {...}, "merges": [...]}`,
  * `{"type": "WordPiece", "vocab": {...}}`, or
  * `{"type": "Unigram", "vocab": [[piece, logprob], ...]}`).
  *
  * Until now the trained artifacts persisted only as parquet
  * ([[BpeVocab.mergesToDF]] and friends) — consumable by this engine,
  * by DuckDB oracles, and by nothing else. These exporters emit the
  * schema an external tokenizer runtime loads, and the importers
  * reconstruct the exact serving model from such a file, so a
  * vocabulary trained here ships to a training stack (or one trained
  * elsewhere serves here) without a bespoke converter.
  *
  * Faithfulness contract (what the round-trip specs pin):
  *  - **BPE**: `merges` carries the learned ranking as the classic
  *    `"left right"` strings, in merge order; import rebuilds the
  *    [[BpeVocab.Merge]] list with identical (step, left, right) —
  *    [[BpeVocab.encode]] depends on nothing else. The schema has no
  *    slot for corpus pair counts, so `n` exports into nothing and
  *    imports as 0 (drift monitors need the parquet form; encode is
  *    bit-identical). Symbols never contain spaces (house tokenization
  *    is whitespace-split; byte-level symbols are hex pairs), so the
  *    space-joined merge string is unambiguous.
  *  - **WordPiece**: `vocab` maps token -> id in vocabulary order
  *    (insertion-ordered ids, the HF convention), with the mandatory
  *    `unk_token` "[UNK]" at id 0 — our serving encoder whole-word-UNKs
  *    rather than emitting the token, so import drops it again.
  *    `continuing_subword_prefix` exports as "" (this trainer learns
  *    whole-word pieces without the "##" convention — a documented
  *    divergence an external consumer sees in the file itself).
  *  - **Unigram**: `vocab` is `[piece, score]` pairs where the score is
  *    the engine's Q16 fixed-point log2 integer written as an
  *    integer-valued JSON number (exact in a double far beyond any real
  *    score's magnitude, so the round trip is lossless). For an
  *    external Viterbi consumer the values are log-probabilities scaled
  *    by the positive constant 2^16/ln 2 — and Viterbi argmax is
  *    invariant under any positive scaling of all scores, so segmenting
  *    with them verbatim reproduces this engine's segmentation (ties
  *    aside). Imports back to the exact score map.
  *
  * All importers fail loud on a wrong `model.type` or a structurally
  * malformed file — a silent partial model would serve garbage.
  */
object TokenizerJson {

  private def mapper = new ObjectMapper()

  /** The shared envelope: version + the honest description of the house
    * text pipeline (lowercase, then pure whitespace split — HF's
    * `Lowercase` normalizer and `WhitespaceSplit` pre-tokenizer). */
  private def envelope(m: ObjectMapper): ObjectNode = {
    val root = m.createObjectNode()
    root.put("version", "1.0")
    root.putNull("truncation")
    root.putNull("padding")
    root.putArray("added_tokens")
    root.putObject("normalizer").put("type", "Lowercase")
    root.putObject("pre_tokenizer").put("type", "WhitespaceSplit")
    root.putNull("post_processor")
    root.putNull("decoder")
    root
  }

  private def modelOf(json: String, wantType: String): JsonNode = {
    val root =
      try mapper.readTree(json)
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"TokenizerJson: not parseable JSON: ${e.getMessage}")
      }
    val model = root.path("model")
    require(model.isObject, "TokenizerJson: no `model` object")
    val t = model.path("type").asText("")
    require(t == wantType,
      s"TokenizerJson: model.type is '$t', expected '$wantType'")
    model
  }

  // ---- BPE ----

  /** Serialize a learned BPE to tokenizer.json. `alphabet` is the base
    * symbol set (character or hex-byte); ids are alphabet order first,
    * then merge products in merge order — the HF insertion-order
    * convention. */
  def exportBpe(merges: Seq[BpeVocab.Merge], alphabet: Seq[String]): String = {
    require(alphabet.nonEmpty, "TokenizerJson.exportBpe: empty alphabet")
    require(merges.map(_.step) == (1 to merges.size),
      "TokenizerJson.exportBpe: merges must be step-ordered 1..k")
    val m = mapper
    val root = envelope(m)
    val model = root.putObject("model")
    model.put("type", "BPE")
    model.putNull("dropout")
    model.putNull("unk_token")
    model.putNull("continuing_subword_prefix")
    model.putNull("end_of_word_suffix")
    model.put("fuse_unk", false)
    val vocab = model.putObject("vocab")
    var id = 0
    // distinct preserves first occurrence, so a merge product equal to
    // an alphabet symbol (impossible for chars, cheap to guard anyway)
    // never double-assigns an id
    (alphabet ++ merges.map(mg => mg.left + mg.right)).distinct.foreach { t =>
      vocab.put(t, id); id += 1
    }
    val ms = model.putArray("merges")
    merges.foreach(mg => ms.add(s"${mg.left} ${mg.right}"))
    m.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Rebuild the serving merge list from a BPE tokenizer.json. `n` is 0
    * (the schema carries no corpus counts); (step, left, right) — all
    * that [[BpeVocab.encode]]/[[BpeVocab.encodeBytes]] consume — are
    * exact. */
  def importBpeMerges(json: String): Seq[BpeVocab.Merge] = {
    val model = modelOf(json, "BPE")
    val ms = model.path("merges")
    require(ms.isArray, "TokenizerJson.importBpeMerges: no `merges` array")
    (0 until ms.size()).map { i =>
      val parts = ms.get(i).asText().split(" ", -1)
      require(parts.length == 2 && parts(0).nonEmpty && parts(1).nonEmpty,
        s"TokenizerJson.importBpeMerges: malformed merge '${ms.get(i).asText()}' at $i")
      BpeVocab.Merge(i + 1, parts(0), parts(1), 0L)
    }
  }

  /** The BPE base alphabet of a words frame — the distinct single-char
    * symbols, sorted; the `alphabet` argument [[exportBpe]] wants for a
    * char-level model (byte-level models pass their
    * [[BpeVocab.byteAlphabet]]). */
  def charAlphabet(docs: org.apache.spark.sql.DataFrame, textCol: String): Seq[String] = {
    import org.apache.spark.sql.functions._
    docs.select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .select(explode(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as("ch"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
  }

  // ---- WordPiece ----

  /** Serialize a WordPiece vocabulary. "[UNK]" takes id 0 (mandatory
    * `unk_token`); the engine's pieces follow in the given order. */
  def exportWordPiece(vocab: Seq[String]): String = {
    require(vocab.nonEmpty, "TokenizerJson.exportWordPiece: empty vocabulary")
    require(!vocab.contains("[UNK]"),
      "TokenizerJson.exportWordPiece: vocabulary must not already contain [UNK]")
    val m = mapper
    val root = envelope(m)
    val model = root.putObject("model")
    model.put("type", "WordPiece")
    model.put("unk_token", "[UNK]")
    model.put("continuing_subword_prefix", "")
    model.put("max_input_chars_per_word", 100)
    val v = model.putObject("vocab")
    v.put("[UNK]", 0)
    vocab.zipWithIndex.foreach { case (t, i) => v.put(t, i + 1) }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Rebuild the vocabulary (id order, unk_token dropped) from a
    * WordPiece tokenizer.json — the exact input
    * [[WordPiece.encodeGreedy]] serves from. */
  def importWordPieceVocab(json: String): Seq[String] = {
    val model = modelOf(json, "WordPiece")
    val v = model.path("vocab")
    require(v.isObject, "TokenizerJson.importWordPieceVocab: no `vocab` object")
    val unk = model.path("unk_token").asText("[UNK]")
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    v.properties().forEach(e => entries += ((e.getKey, e.getValue.asInt())))
    entries.sortBy(_._2).map(_._1).filterNot(_ == unk).toSeq
  }

  // ---- Unigram ----

  /** Serialize a Unigram score map. Entries sort by (score desc, piece)
    * — a deterministic file for a map input; scores are the Q16 log2
    * integers written as integer-valued JSON numbers (see the class
    * scaladoc for why that is both lossless and externally usable). */
  def exportUnigram(scores: Map[String, Long]): String = {
    require(scores.nonEmpty, "TokenizerJson.exportUnigram: empty score map")
    val m = mapper
    val root = envelope(m)
    val model = root.putObject("model")
    model.put("type", "Unigram")
    model.putNull("unk_id")
    model.put("byte_fallback", false)
    val v = model.putArray("vocab")
    scores.toSeq.sortBy { case (p, s) => (-s, p) }.foreach { case (p, s) =>
      val pair = v.addArray()
      pair.add(p)
      pair.add(s.toDouble)
    }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Rebuild the Q16 score map from a Unigram tokenizer.json. */
  def importUnigramScores(json: String): Map[String, Long] = {
    val model = modelOf(json, "Unigram")
    val v = model.path("vocab")
    require(v.isArray, "TokenizerJson.importUnigramScores: no `vocab` array")
    (0 until v.size()).map { i =>
      val pair = v.get(i)
      require(pair.isArray && pair.size() == 2 && pair.get(0).isTextual,
        s"TokenizerJson.importUnigramScores: malformed vocab entry at $i")
      val d = pair.get(1).asDouble()
      require(d == math.rint(d) && math.abs(d) < (1L << 53).toDouble,
        s"TokenizerJson.importUnigramScores: score at $i is not an exact " +
          s"integer ($d) — not a file this engine exported")
      pair.get(0).asText() -> d.toLong
    }.toMap
  }
}
