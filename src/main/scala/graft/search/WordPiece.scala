package graft.search

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed WordPiece vocabulary induction + greedy longest-match
  * encoding — the SECOND member of the tokenizer family next to
  * [[BpeVocab]] (Schuster & Nakajima 2012; the BERT tokenizer). Both
  * trainers repeatedly merge an adjacent symbol pair, but WordPiece
  * maximizes the LIKELIHOOD GAIN of the merge rather than its raw
  * count: score(l, r) = count(lr) / (count(l) · count(r)) — a pair of
  * rare symbols that almost always co-occur beats a pair of frequent
  * symbols that collide by chance (BPE's argmax). And WordPiece SERVES
  * with greedy longest-match-first segmentation against the final
  * vocabulary, not by replaying merges in learned order — the two
  * encoders genuinely differ ("abc" with vocab {ab, bc, abc-less}
  * segments ab|c under longest-match regardless of which merge was
  * learned first).
  *
  * Integer-exact scoring: ratios are compared through the Q18
  * fixed-point floor quotient `score_q18 = n·10¹⁸ div (c_l·c_r)`
  * computed in DECIMAL(38,0) (n ≤ ~1e15 at 100 TB keeps n·10¹⁸ under
  * 38 digits; the quotient is ≤ 10¹⁸ because n ≤ min(c_l, c_r), so it
  * reads back as BIGINT) — bit-identical to DuckDB's HUGEINT `//`, so
  * the training chain is oracle-replayable like BPE's (q191). Argmax
  * order (score desc, n desc, l, r) is total. A Q18 floor can in
  * principle tie two pairs whose true ratios differ by < 1e-18 — at
  * realistic counts (c_l·c_r ≪ 10¹⁸) the floor is exact, and the
  * n/l/r tie-break keeps even that case deterministic.
  *
  * Scale shape: identical to [[BpeVocab.learnMerges]] — every pass runs
  * at distinct-word cardinality, pair AND symbol counts are map-side-
  * combinable integer sums bounded by type cardinality (the symbol
  * count is the one extra aggregation per step), the per-step argmax is
  * a 1-row TakeOrdered readout, and merge application is the same
  * zero-shuffle greedy fold ([[BpeVocab.mergeOnce]]). Lineage is
  * checkpoint-truncated per step (the r9 O(k²)-analysis lesson).
  * Measured (Scratch r11, the BPE worst-case corpus — 100k docs, ~30k
  * distinct words, dense alphabet): k=16 in 11.7 s, k=64 in 21.4 s —
  * ~0.20 s/merge marginal, linear, the BPE per-step pace despite the
  * extra aggregation (no batched variant exists because the likelihood
  * score of EVERY pair changes with every merge's symbol counts);
  * [[encodeGreedy]] serves the same 100k docs in 7.0 s (|vocab|=75).
  *
  * Known oracle residual (the CharShingles class, documented there):
  * substring positions count UTF-16 units in the JVM and code points in
  * DuckDB, so non-BMP characters (emoji) would segment differently
  * across engines — BMP scripts including CJK are exact.
  *
  * Departures from the paper, documented like BpeVocab's: no
  * end-of-word marker and no "##" continuation-piece distinction — the
  * house whitespace tokenization already delimits words, so the marker
  * would be a constant symbol and the "##" split doubles the vocab
  * space without changing the segmentation mechanics under test.
  * UNK semantics follow the reference implementation: a word with ANY
  * unmatchable position is emitted as one UNK token, not partially
  * segmented.
  */
object WordPiece {

  /** One learned merge: at `step`, `(left, right)` won the likelihood
    * argmax with pair count `n`, symbol counts `cl`/`cr`, and Q18 score
    * `scoreQ18 = n·10¹⁸ div (cl·cr)`. */
  final case class WpMerge(step: Int, left: String, right: String,
                           n: Long, cl: Long, cr: Long, scoreQ18: Long)

  /** Learn `k` WordPiece merges. Returns the merge table and the final
    * (word, freq, syms) frame (caller releases via [[BpeVocab.release]]);
    * stops early when no adjacent pair remains. */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): (Seq[WpMerge], DataFrame) = {
    require(k >= 1 && k <= 4096, s"WordPiece.learnMerges: k in [1, 4096], got $k")
    // Deferred checkpoint cadence (r15, guide "remove jobs" tier): the
    // r14 loop materialized the merged words frame EVERY step (one
    // checkpoint job per merge on top of the argmax job). Accepted merges
    // now apply LAZILY on top of the checkpointed anchor and the anchor
    // advances every `ReanchorEvery` steps — the argmax job re-applies at
    // most that many pending merges on the fly (a linear native kernel
    // since r15, see BpeSymbols), plan depth stays bounded (the r9 O(k²)
    // analysis lesson), and the per-step job count drops from 2 to
    // ~1 + 1/ReanchorEvery. The merge SEQUENCE is unchanged — each argmax
    // still sees exactly the post-merge symbol state.
    var anchor = BpeVocab.wordCounts(docs, textCol).localCheckpoint(true)
    var words = anchor
    var pending = 0
    def reanchor(): Unit = {
      val out = words.localCheckpoint(true)
      BpeVocab.release(anchor)
      anchor = out
      words = out
      pending = 0
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[WpMerge]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val pairCounts = words
        .select(col("freq"), explode(BpeVocab.pairsOf(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("n"))
      val symCounts = words
        .select(col("freq"), explode(col("syms")).as("s"))
        .groupBy("s").agg(sum("freq").as("c"))
      val top = pairCounts
        .join(symCounts.select(col("s").as("l"), col("c").as("cl")), Seq("l"))
        .join(symCounts.select(col("s").as("r"), col("c").as("cr")), Seq("r"))
        .select(col("l"), col("r"), col("n"), col("cl"), col("cr"),
          // DECIMAL(38,0) keeps n·10^18 exact; div yields BIGINT floor
          expr("cast(n as decimal(38,0)) * 1000000000000000000 div " +
            "(cast(cl as decimal(38,0)) * cast(cr as decimal(38,0)))")
            .as("score_q18"))
        .orderBy(col("score_q18").desc, col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val t = top(0)
        merges += WpMerge(step, t.getString(0), t.getString(1),
          t.getLong(2), t.getLong(3), t.getLong(4), t.getLong(5))
        words = words.withColumn("syms",
          BpeVocab.mergeOnce(col("syms"), t.getString(0), t.getString(1)))
        pending += 1
        if (pending >= WordPiece.ReanchorEvery) reanchor()
        step += 1
      }
    }
    // the returned frame must be checkpoint-backed: callers release it via
    // BpeVocab.release, and a lazy tail would re-run its pending merges on
    // every downstream action
    if (pending > 0) reanchor()
    (merges.toSeq, words)
  }

  /** Steps between training-loop re-anchors (see [[learnMerges]]):
    * bounds both the lazy merge-fold depth the argmax job re-applies and
    * Catalyst's per-step analysis work. */
  private val ReanchorEvery = 8

  /** The serving vocabulary a trained WordPiece model ships: the
    * corpus's initial alphabet (every distinct character — single-char
    * fallbacks, so trained-corpus text never UNKs) plus every merge
    * product. Bounded by |alphabet| + k — a driver-side model artifact
    * like the BPE merge table. */
  def vocabulary(docs: DataFrame, textCol: String, merges: Seq[WpMerge]): Seq[String] = {
    val alphabet = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .select(explode(transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1)))).as("ch"))
      .distinct().collect().map(_.getString(0))
    (alphabet ++ merges.map(m => m.left + m.right)).distinct.sorted
  }

  /** TOKENIZER DRIFT monitor for the WordPiece trainer — the
    * [[BpeVocab.mergeDrift]] analog, completing the drift family across
    * both merge-based tokenizers: given the STORED merge table a
    * production WordPiece was trained with, re-derive what the CURRENT
    * corpus would learn and compare step by step. Because WordPiece's
    * argmax is a RATIO, drift here catches distribution changes BPE's
    * raw-count drift can miss (a pair's count can hold steady while its
    * symbols' marginals shift, moving the likelihood score). Output one
    * row per stored step: `(step, stored_l, stored_r, stored_score_q18,
    * new_l, new_r, new_score_q18, is_match)`; `new_*` are NULL when the
    * current corpus runs out of pairs first. Cost: one [[learnMerges]]
    * run on the current corpus; the compare is k-row driver arithmetic.
    */
  def mergeDrift(newDocs: DataFrame, textCol: String,
                 stored: Seq[WpMerge]): DataFrame = {
    val k = stored.length
    require(k >= 1 && k <= 4096, s"WordPiece.mergeDrift: stored size in [1, 4096], got $k")
    require(stored.map(_.step) == (1 to k),
      s"WordPiece.mergeDrift: stored steps must be exactly 1..$k (mergesFromDF contract)")
    val (fresh, words) = learnMerges(newDocs, textCol, k)
    BpeVocab.release(words)
    val freshBy = fresh.map(m => m.step -> m).toMap
    val spark = newDocs.sparkSession
    import spark.implicits._
    stored.map { s =>
      val b = freshBy.get(s.step)
      (s.step.toLong, s.left, s.right, s.scoreQ18,
        b.map(_.left), b.map(_.right), b.map(_.scoreQ18),
        b.exists(m => m.left == s.left && m.right == s.right))
    }.toDF("step", "stored_l", "stored_r", "stored_score_q18",
      "new_l", "new_r", "new_score_q18", "is_match")
  }

  /** The WordPiece model artifacts as persistable DataFrames — the
    * [[BpeVocab.mergesToDF]] convention: train once per corpus snapshot,
    * write parquet, serve later sessions without retraining. The merge
    * table carries the training evidence (counts + score); the
    * vocabulary is what [[segmentWords]]/[[encodeGreedy]] actually
    * consume. */
  def mergesToDF(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[WpMerge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.step, m.left, m.right, m.n, m.cl, m.cr, m.scoreQ18))
      .toDF("step", "left_sym", "right_sym", "n", "cl", "cr", "score_q18")
  }

  /** Inverse of [[mergesToDF]]; steps must be exactly 1..k (a gap means
    * a partial write — the [[BpeVocab.mergesFromDF]] contract). */
  def mergesFromDF(df: DataFrame): Seq[WpMerge] = {
    val rows = df.select(col("step").cast("int"), col("left_sym"),
        col("right_sym"), col("n").cast("long"), col("cl").cast("long"),
        col("cr").cast("long"), col("score_q18").cast("long"))
      .collect()
      .map(r => WpMerge(r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_.step)
    require(rows.map(_.step).toSeq == (1 to rows.length),
      s"WordPiece.mergesFromDF: steps must be exactly 1..${rows.length}, got ${rows.map(_.step).toSeq}")
    rows.toSeq
  }

  /** The serving vocabulary as a one-column frame (strings round-trip
    * any format exactly). */
  def vocabToDF(spark: org.apache.spark.sql.SparkSession,
                vocab: Seq[String]): DataFrame = {
    import spark.implicits._
    vocab.toDF("token")
  }

  /** Inverse of [[vocabToDF]] — re-sorted (the [[vocabulary]] order).
    * Duplicate tokens mean a corrupt (duplicated/partial) write — the
    * [[mergesFromDF]] contract: refuse loudly rather than silently
    * repairing the stored artifact. */
  def vocabFromDF(df: DataFrame): Seq[String] = {
    val toks = df.select(col("token")).collect().map(_.getString(0)).toSeq
    require(toks.distinct.length == toks.length,
      "WordPiece.vocabFromDF: duplicate tokens in the stored vocabulary")
    toks.sorted
  }

  /** Greedy longest-match-first segmentation of each distinct word
    * against `vocab` — the WordPiece SERVING encoder. Output: one row
    * per input word — `(word, unk, n_pieces, piece_l2)` where
    * `piece_l2 = Σ len(piece)²` pins the actual split points (two
    * segmentations with the same piece COUNT differ in l2 unless they
    * cut identically), and `unk = true` (with zeroed counts) when any
    * reached position has no vocab match — the whole word is one UNK
    * token, the reference behavior.
    *
    * Scale shape: `vocab` is a bounded model artifact (alphabet + k),
    * broadcast; candidate matches are |word| × maxPieceLen substrings
    * per DISTINCT word (explode + one broadcast join + one (word, pos)
    * max); the greedy walk itself is a zero-shuffle fold over the
    * per-word match-length map — corpus text never shuffles.
    */
  def segmentWords(words: DataFrame, wordCol: String, vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty, "WordPiece.segmentWords: empty vocabulary")
    val maxLen = vocab.map(_.length).max
    val spark = words.sparkSession
    import spark.implicits._
    val vocabDF = vocab.toDF("__tok")
    val w = words.select(col(wordCol).as("word")).distinct()
    // every vocab-matching (pos, len) substring; keep the longest per pos
    val matches = w
      .select(col("word"), explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("pos"),
        explode(sequence(lit(1),
          least(lit(maxLen), length(col("word")) - col("pos") + 1))).as("len"))
      .select(col("word"), col("pos"), col("len"),
        col("word").substr(col("pos"), col("len")).as("__tok"))
      .join(broadcast(vocabDF), Seq("__tok"))
      .groupBy(col("word"), col("pos")).agg(max(col("len")).as("mlen"))
    val withMap = w.join(
      matches.groupBy("word")
        .agg(map_from_entries(collect_list(struct(col("pos"), col("mlen")))).as("__ml")),
      Seq("word"), "left")
    // greedy fold: state (pos, np, l2, unk); element i acts only when it
    // IS the cursor — a skipped i sits inside the previous piece
    def st(pos: Column, np: Column, l2: Column, unk: Column): Column =
      struct(pos.cast("int").as("pos"), np.cast("long").as("np"),
        l2.cast("long").as("l2"), unk.cast("boolean").as("unk"))
    val folded = aggregate(
      sequence(lit(1), length(col("word"))),
      st(lit(1), lit(0L), lit(0L), lit(false)),
      (s, i) => {
        val m = coalesce(element_at(col("__ml"), i.cast("int")), lit(0))
        when(s.getField("unk") || i =!= s.getField("pos"), s)
          .otherwise(when(m === 0, st(s.getField("pos"), lit(0L), lit(0L), lit(true)))
            .otherwise(st(s.getField("pos") + m,
              s.getField("np") + 1L,
              s.getField("l2") + m.cast("long") * m.cast("long"),
              lit(false))))
      })
    withMap.select(col("word"), folded.as("__st"))
      .select(col("word"),
        col("__st.unk").as("unk"),
        col("__st.np").as("n_pieces"),
        col("__st.l2").as("piece_l2"))
  }

  /** Per-document greedy-encode report — the [[BpeVocab.encodeByLookup]]
    * shape for the longest-match encoder: segment the DISTINCT words
    * once, then one explode + word join + pre-combined per-doc sum.
    * An UNK word counts as ONE piece (the UNK token) in `n_pieces` and
    * contributes nothing to `piece_l2`. Returns
    * `(id, n_tokens, n_unk_words, n_pieces, piece_l2)`. */
  def encodeGreedy(docs: DataFrame, idCol: String, textCol: String,
                   vocab: Seq[String]): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("word"))
    val seg = segmentWords(toks.select("word"), "word", vocab)
    toks.join(seg, Seq("word"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("unk"), 1L).otherwise(0L)).as("n_unk_words"),
        sum(when(col("unk"), 1L).otherwise(col("n_pieces"))).as("n_pieces"),
        sum(when(col("unk"), 0L).otherwise(col("piece_l2"))).as("piece_l2"))
  }
}
