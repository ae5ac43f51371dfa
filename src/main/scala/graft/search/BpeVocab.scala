package graft.search

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{encode => sqlEncode}

/** Distributed BPE (byte-pair-encoding) VOCABULARY INDUCTION — the
  * tokenizer-training stage of an LLM data pipeline (Sennrich et al.
  * 2016): starting from characters, repeatedly merge the globally most
  * frequent adjacent symbol pair, learning the merge table a tokenizer
  * applies at encode time. Complements the vocab-health operators
  * ([[Lexical.oovRate]], `TextFunctions.subwordCount`): those AUDIT a
  * fixed vocabulary; this one LEARNS it from the corpus.
  *
  * Scale shape: the corpus is scanned ONCE into the distinct
  * (word, freq) table — every subsequent pass runs at distinct-word
  * cardinality, orders of magnitude below corpus size. Each merge step
  * is (a) one map-side-combinable pair-count aggregation (shuffle
  * bounded by pair-TYPE cardinality, not occurrences), (b) a 1-row
  * TakeOrdered argmax readout (the bounded per-step driver readout of
  * the q88 Jacobi pattern — BPE's global argmax is inherently
  * sequential), and (c) one zero-shuffle narrow re-projection of the
  * symbol arrays. Each step's words frame persists and the previous
  * unpersists, so step i never re-applies merges 1..i-1.
  *
  * Determinism: counts are exact integers; the argmax order
  * (n desc, left asc, right asc) is total; the merge application is a
  * greedy LEFT-TO-RIGHT non-overlapping fold ("aaaa" + (a,a) →
  * [aa, aa], the reference BPE behavior) — so the learned table is
  * bit-reproducible and SQL-replayable (the oracle re-derives every
  * step with an explode + gaps-and-islands window formulation, proving
  * the two formulations equal; see q145).
  *
  * Departure from Sennrich: no end-of-word marker symbol — merges never
  * cross word boundaries here and the house whitespace tokenization
  * already delimits words, so the marker would be a constant appended
  * symbol. Documented, not configurable.
  */
object BpeVocab {

  /** One learned merge: at `step`, `(left, right) -> left+right` won the
    * argmax with corpus pair count `n`. */
  final case class Merge(step: Int, left: String, right: String, n: Long)

  /** The distinct (word, freq, syms) base: house tokenization, symbols =
    * the word's characters. Everything downstream runs at this
    * cardinality. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", charSplit(col("word")))

  // native since r15 (BpeSymbols.char_split): the composed
  // transform/sequence/substr form was interpreted and re-walked the
  // word prefix per element — O(n²) per word
  private def charSplit(word: Column): Column =
    graft.functions.expr.BpeSymbols.char_split(word)

  /** BYTE-LEVEL symbol decomposition — GPT-2-style byte fallback
    * (Radford et al. 2019 §2.2): the word's UTF-8 bytes as TWO-CHAR HEX
    * symbols ("é" → ["C3","A9"]), so the base alphabet is CLOSED (≤256
    * symbols) and no word can ever be out-of-alphabet — the no-UNK
    * guarantee the char-level families lack (their serving encoders
    * whole-word-UNK on an unseen character). Hex pairs rather than raw
    * bytes keep every symbol a plain string: merges concatenate hex,
    * `unhex(concat(syms))` reassembles the exact original bytes — so
    * losslessness is CHECKABLE per word — and the representation
    * round-trips parquet and replays identically in SQL (q198's oracle
    * derives the same symbols with DuckDB's hex(encode(word))). */
  def byteSplit(word: Column): Column =
    // native since r15 (BpeSymbols.byte_split): one pass over the UTF-8
    // bytes, no intermediate hex string, no interpreted lambda
    graft.functions.expr.BpeSymbols.byte_split(word)

  /** [[wordCounts]] with byte-level initial symbols — the training base
    * for [[learnMergesBytes]]. Same distinct-word cardinality; only the
    * symbol decomposition differs. */
  def wordCountsBytes(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", byteSplit(col("word")))

  /** The training corpus's byte ALPHABET — distinct base symbols, a
    * bounded ≤256-row driver readout (the model artifact that makes
    * "out-of-alphabet" a checkable property at serve time). */
  def byteAlphabet(docs: DataFrame, textCol: String): Seq[String] = {
    val rows = wordCountsBytes(docs, textCol)
      .select(explode(col("syms")).as("b")).distinct()
      .limit(257).collect().map(_.getString(0))
    require(rows.length <= 256,
      s"byteAlphabet: ${rows.length} symbols — a UTF-8 byte alphabet cannot exceed 256")
    rows.toSeq.sorted
  }

  /** Adjacent pair occurrences of one symbol array (with multiplicity —
    * "aaaa" contributes (a,a) three times, the classic count). Shared
    * with [[WordPiece]], whose trainer counts the same pairs under a
    * different argmax objective. Native since r15
    * ([[graft.functions.expr.BpeSymbols]]): the
    * transform/sequence/element_at composition is CodegenFallback —
    * interpreted per element — and every training pass re-enumerates the
    * pairs of every distinct word; same output, including the
    * empty-array result for null/short inputs. */
  private[search] def pairsOf(syms: Column): Column =
    graft.functions.expr.BpeSymbols.sym_pairs(syms)

  /** Greedy left-to-right non-overlapping application of ONE merge to a
    * symbol array — a zero-shuffle fold: the accumulator's last symbol
    * merging with the incoming one exactly reproduces the sequential
    * scan (a just-merged symbol never re-matches `left` within the same
    * step unless it lexically IS `left`, which is impossible for a fresh
    * `left+right`). Native since r15
    * ([[graft.functions.expr.BpeSymbols]]): the aggregate-HOF fold was
    * interpreted AND rebuilt its accumulator array per element —
    * O(len²) allocations per word per merge step, the tokenizer
    * family's profiled hot spot; the kernel is one linear pass with
    * identical semantics (null/empty handling included), and its merge
    * symbols ride codegen reference objects so k-step training loops
    * never recompile the projection. */
  def mergeOnce(syms: Column, left: String, right: String): Column =
    graft.functions.expr.BpeSymbols.merge_once(syms, left, right)

  /** Eagerly checkpoint `next` (which reads `prev`, so order matters),
    * then free `prev`'s checkpoint blocks explicitly: the training loop
    * drops its only reference each step, and waiting for the driver's
    * GC + ContextCleaner to notice would let up to k materialized
    * copies of the words frame pile up in executor storage (the
    * pre-checkpoint code bounded live copies at 2 via per-step
    * unpersist; this keeps that bound). */
  private def checkpointSwap(next: DataFrame, prev: DataFrame): DataFrame = {
    val out = next.localCheckpoint(true)
    release(prev)
    out
  }

  /** Free the executor storage behind the checkpoint-backed words frame
    * [[learnMerges]]/[[learnMergesBatched]] return — a plain
    * `frame.unpersist` is a no-op on checkpoint blocks, so without this
    * a long-lived session training repeatedly (the Verify/Bench driver
    * running q145/q174/q176/q177 back-to-back) accumulates one corpus
    * copy per training until GC. Delegates to the shared
    * [[graft.CheckpointBlocks.release]] (the mechanism is not
    * BPE-specific; this alias keeps the tokenizer API self-contained). */
  def release(frame: DataFrame): Unit = graft.CheckpointBlocks.release(frame)

  /** Learn `k` merges over the corpus. Returns the merge table plus the
    * final (word, freq, syms) frame (lineage-truncated and materialized;
    * each step's predecessor blocks are freed explicitly — see
    * [[checkpointSwap]] — so live copies stay bounded at 2; the
    * RETURNED frame's blocks are freed by [[release]] once the caller
    * is done with it — a plain `unpersist` call is a no-op on
    * checkpoint blocks); stops early if no adjacent pair remains.
    *
    * Lineage is truncated per step with an eager `localCheckpoint`, not
    * `persist`: with persist, step i's UNEXECUTED plan still stacks i
    * nested [[mergeOnce]] higher-order-function trees over w0, so
    * analysis+optimization work grows O(k²) even though execution reads
    * the cache — measured as the k-scaling cliff (k=6 in 9.8 s but k=24
    * still unfinished after 8 min, at 100k docs / 30k distinct words).
    * Checkpointed, each step plans against a flat LogicalRDD and the
    * cost is 2 bounded actions/step: measured (Scratch, r9) 6.97 s at
    * k=6, 10.07 s at k=24 — ~0.17 s/step marginal, linear — so
    * practical k is (job budget / ~0.2 s): a 4096-merge vocabulary is a
    * ~15 min sequential job whose per-step argmax is inherent to
    * classic BPE, not a planning pathology. localCheckpoint blocks are
    * executor-local (not fault-tolerant); a multi-tenant cluster run
    * that must survive executor loss should swap in reliable
    * `checkpoint()` — same truncation, plus an HDFS write per step. */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): (Seq[Merge], DataFrame) = {
    require(k >= 1 && k <= 4096, s"learnMerges: k in [1, 4096], got $k")
    // Deferred checkpoint cadence (r15): merges apply LAZILY on the
    // checkpointed anchor and the anchor advances every ReanchorEvery
    // steps, dropping the per-step job count from 2 (argmax + checkpoint)
    // to ~1 — the argmax job re-applies at most ReanchorEvery pending
    // merges through the linear native kernel (BpeSymbols), and the
    // bounded window keeps the r9 O(k²)-analysis cliff away. The merge
    // sequence is unchanged; BpeVocabSpec pins batched == sequential on
    // top of this loop.
    var anchor = wordCounts(docs, textCol).localCheckpoint(true)
    var words = anchor
    var pending = 0
    def reanchor(): Unit = {
      val out = words.localCheckpoint(true)
      release(anchor)
      anchor = out
      words = out
      pending = 0
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val top = words
        .select(col("freq"), explode(pairsOf(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step, l, r, n)
        words = words.withColumn("syms", mergeOnce(col("syms"), l, r))
        pending += 1
        if (pending >= ReanchorEvery) reanchor()
        step += 1
      }
    }
    // callers release the returned frame (checkpoint-backed by contract)
    if (pending > 0) reanchor()
    (merges.toSeq, words)
  }

  /** Steps between training-loop re-anchors — bounds the lazy merge-fold
    * depth and Catalyst's per-step analysis work (see [[learnMerges]]). */
  private val ReanchorEvery = 8

  /** [[learnMerges]] with a BATCHED argmax readout: per pass, read the
    * top `batchTop` pair counts ONCE and accept a PREFIX of them as
    * merges, cutting the sequential-action count from 2k to ~2·(passes)
    * while producing the IDENTICAL merge table as classic one-at-a-time
    * BPE (BpeVocabSpec pins equality; q176 gates it against q145's
    * oracle, which replays the one-at-a-time formulation).
    *
    * Exactness argument for the acceptance rule — from the sorted
    * candidate list (n desc, l, r) accept P1..Pj while (a) every Pi is
    * SYMBOL-DISJOINT from all earlier accepted pairs, stopping at the
    * first conflict, and (b) the batch is truncated so that
    * n(last accepted) > n(first non-accepted) STRICTLY:
    *  - applying a merge (l,r)→lr changes only the counts of pairs with
    *    a member in {l, r, lr}: pairs touching l/r shrink, and created
    *    pairs (lr,x)/(x,lr) have count ≤ the OLD count of (r,x)/(x,l) —
    *    a pair sharing a symbol with the applied merge;
    *  - every sharing pair sorts AFTER the accepted prefix (it would
    *    have been the first conflict otherwise), so its count is ≤
    *    n(first non-accepted) < n(every accepted pair) — strictly, so a
    *    created pair can never beat (or tie into, via lexicographic
    *    order) any accepted pair;
    *  - accepted pairs are mutually disjoint, so their applications
    *    commute and none changes another's count: the true sequential
    *    argmax sequence IS the accepted prefix, in list order.
    * Ties inside the accepted prefix are fine (disjointness makes the
    * order immaterial to the result, and the recorded order matches the
    * sort). Worst case (every top pair sharing a symbol, e.g. one hot
    * character) degrades to batch size 1 — classic BPE's pace, never
    * wrong. Measured (Scratch r10, 100k docs / 30k distinct words over
    * an 11-char alphabet — dense symbol sharing, so batches stay small
    * and this is close to the worst case): k=6 2.59 s vs 5.87 s
    * one-at-a-time, k=24 5.59 s vs 8.43 s, and at REALISTIC vocabulary
    * depth k=64 12.73 s / k=256 59.3 s — ~0.24 s/merge marginal, linear
    * in k. The full production-vocabulary run is MEASURED, not
    * extrapolated (Scratch r11, same worst-case corpus): k=4096 in
    * 1070.15 s ≈ 17.8 min, ~0.261 s/merge — the linear model held to
    * within 9% over a 16x extrapolation (the small tail drift is the
    * growing per-pass fold depth as accepted merges accumulate);
    * broader alphabets batch better and run faster. The k=4096 merge
    * table round-trips parquet exactly in 2.45 s (k=256: 0.4 s) —
    * mergesToDF/FromDF, the model artifact at production size;
    * batched == sequential is spec-pinned at k=64 (BpeVocabSpec) on
    * top of PropertySpec's randomized k<=6 coverage.
    */
  def learnMergesBatched(docs: DataFrame, textCol: String, k: Int,
                         batchTop: Int = 64): (Seq[Merge], DataFrame) =
    learnMergesBatchedFrom(wordCounts(docs, textCol), k, batchTop)

  /** [[learnMergesBatched]] over BYTE-level initial symbols
    * ([[byteSplit]]) — the GPT-2-style byte-fallback trainer: identical
    * batched-argmax machinery, but the base alphabet is the corpus's
    * UTF-8 bytes (≤256 hex-pair symbols), so the learned table plus the
    * closed byte alphabet can encode ANY later text with no UNK. Scale
    * shape unchanged: byte decomposition only lengthens the symbol
    * arrays (×1 for ASCII, ×2-3 for accented/CJK words) at
    * distinct-word cardinality. */
  def learnMergesBytes(docs: DataFrame, textCol: String, k: Int,
                       batchTop: Int = 64): (Seq[Merge], DataFrame) =
    learnMergesBatchedFrom(wordCountsBytes(docs, textCol), k, batchTop)

  private def learnMergesBatchedFrom(words0: DataFrame, k: Int,
                                     batchTop: Int): (Seq[Merge], DataFrame) = {
    require(k >= 1 && k <= 4096, s"learnMergesBatched: k in [1, 4096], got $k")
    require(batchTop >= 2 && batchTop <= 4096,
      s"learnMergesBatched: batchTop in [2, 4096], got $batchTop")
    var words = words0.localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.size < k && !done) {
      val top = words
        .select(col("freq"), explode(pairsOf(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(batchTop).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) done = true
      else {
        // longest symbol-disjoint prefix, cut at the first conflict
        val used = scala.collection.mutable.Set.empty[String]
        val prefix = top.takeWhile { case (l, r, _) =>
          val ok = !used(l) && !used(r)
          if (ok) { used += l; used += r }
          ok
        }.toSeq
        // strict-count-drop truncation: drop accepted tail entries that
        // TIE the best non-accepted count (they could be beaten
        // lexicographically by a pair the batch creates). The bound is
        // the first conflict's count — or, when the candidate list was
        // cut by the LIMIT rather than exhausted, the last visible count
        // (unseen pairs below the limit may tie it).
        val bound: Option[Long] = top.lift(prefix.size).map(_._3)
          .orElse(if (top.length == batchTop) Some(top.last._3) else None)
        val accepted0 = bound match {
          case Some(b) => prefix.takeWhile(_._3 > b)
          case None => prefix // the candidate list was exhausted: no pair
          // below the prefix exists at all, so nothing can intervene
        }
        // a batch can only be empty via the tie-truncation, in which case
        // fall back to the classic single argmax to guarantee progress
        val accepted = (if (accepted0.nonEmpty) accepted0 else prefix.take(1))
          .take(k - merges.size)
        accepted.foreach { case (l, r, n) =>
          merges += Merge(merges.size + 1, l, r, n)
        }
        words = checkpointSwap(
          accepted.foldLeft(words) { case (w, (l, r, _)) =>
            w.withColumn("syms", mergeOnce(col("syms"), l, r))
          }, words)
      }
    }
    (merges.toSeq, words)
  }

  /** TOKENIZER DRIFT monitor — the merge-table analog of the engine's
    * other drift instruments ([[graft.operators.Profiling]] PSI,
    * [[graft.similarity.Pca.directionDrift]], centroid drift): given
    * the STORED merge table a production tokenizer was trained with,
    * re-derive what the CURRENT corpus would learn and compare step by
    * step. The first non-matching step is where the vocabularies
    * diverge — merges after it cascade, so `is_match` is a prefix
    * property in practice: a long matching prefix means the stored
    * tokenizer still fits the data; an early mismatch is the
    * "retrain/re-encode" signal (corpus distribution shifted enough to
    * change subword statistics — new language mix, new domain, encoder
    * change upstream of a text field).
    *
    * Output: one row per step 1..stored.length —
    * `(step, stored_l, stored_r, stored_n, new_l, new_r, new_n,
    * is_match)`, where the `new_*` columns are NULL when the current
    * corpus ran out of adjacent pairs before that step (fewer learnable
    * merges than the stored table — itself a drift verdict) and
    * `stored_n`/`new_n` carry the pair counts whose ratio measures HOW
    * decisive each merge still is. Cost: one [[learnMergesBatched]]
    * run on the current corpus (distinct-word cardinality per pass) —
    * the compare itself is k-row driver arithmetic.
    */
  def mergeDrift(newDocs: DataFrame, textCol: String,
                 stored: Seq[Merge]): DataFrame = {
    val k = stored.length
    require(k >= 1 && k <= 4096, s"mergeDrift: stored table size in [1, 4096], got $k")
    require(stored.map(_.step) == (1 to k),
      s"mergeDrift: stored steps must be exactly 1..$k (mergesFromDF contract)")
    val (fresh, words) = learnMergesBatched(newDocs, textCol, k)
    release(words)
    val freshBy = fresh.map(m => m.step -> m).toMap
    val spark = newDocs.sparkSession
    import spark.implicits._
    stored.map { s =>
      val b = freshBy.get(s.step)
      (s.step.toLong, s.left, s.right, s.n,
        b.map(_.left), b.map(_.right), b.map(_.n),
        b.exists(m => m.left == s.left && m.right == s.right))
    }.toDF("step", "stored_l", "stored_r", "stored_n",
      "new_l", "new_r", "new_n", "is_match")
  }

  /** The merge table as a persistable DataFrame — the tokenizer MODEL
    * artifact a serving session loads ([[graft.similarity.Pca
    * .directionToDF]] convention): train once per corpus snapshot, write
    * parquet, and [[encode]] later batches against the stored table
    * without retraining. Strings and longs round-trip any format
    * exactly. */
  def mergesToDF(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.step, m.left, m.right, m.n))
      .toDF("step", "left_sym", "right_sym", "n")
  }

  /** Load a persisted merge table; inverse of [[mergesToDF]]. Steps must
    * be exactly 1..k — a gap means a partial write, and applying merges
    * out of learned order changes the encoding. */
  def mergesFromDF(df: DataFrame): Seq[Merge] = {
    val rows = df.select(col("step").cast("int"), col("left_sym"),
        col("right_sym"), col("n").cast("long"))
      .collect().map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.step)
    require(rows.map(_.step).toSeq == (1 to rows.length),
      s"mergesFromDF: steps must be exactly 1..${rows.length}, got ${rows.map(_.step).toSeq}")
    rows.toSeq
  }

  /** ENCODE the corpus by LOOKUP against the trained (word, syms) frame
    * — the right form when the text's vocabulary is (mostly) the
    * training vocabulary: the k-fold merge work was already paid ONCE at
    * distinct-word cardinality during training, so re-deriving it per
    * token occurrence ([[encode]]) multiplies it by corpus length for
    * nothing. One explode + one word join (AQE broadcasts the word side
    * when small) + one pre-combined per-doc sum. Same output columns as
    * [[encode]]; out-of-vocabulary words are DROPPED from the counts
    * (inner join) — use [[encode]] for genuinely unseen text. */
  def encodeByLookup(docs: DataFrame, idCol: String, textCol: String,
                     trainedWords: DataFrame): DataFrame = {
    val w = trainedWords.select(col("word"),
      length(col("word")).cast("long").as("__nc"),
      size(col("syms")).cast("long").as("__ns"))
    docs.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .join(w, Seq("word"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("__nc").as("n_chars"),
        sum("__ns").as("n_bpe_syms"))
  }

  /** ENCODE against a learned merge table — the serving form for text
    * the trainer never saw: every merge applied in learned order as a
    * chained zero-shuffle fold, but at DISTINCT-WORD cardinality, not
    * per token occurrence — the fold is a pure function of the word, so
    * re-running it for every occurrence multiplies the k-merge work by
    * corpus length for nothing (the r9 clean bench caught exactly that:
    * the per-occurrence form was the suite's single most expensive
    * query at 10 s; this form is the q146-lookup shape, one
    * explode+distinct, one word join — AQE broadcasts the folded-vocab
    * side when small — and one pre-combined per-doc sum). Unlike
    * [[encodeByLookup]] nothing is dropped: the vocabulary is built
    * FROM the serving text itself, so OOV words are present by
    * construction and simply stop merging. Returns
    * `(id, n_tokens, n_chars, n_bpe_syms)` — the compression report
    * (n_bpe_syms / n_chars falling is the vocabulary paying for
    * itself). Null text yields null counts; token-less text yields
    * zeros (the direct-projection semantics, preserved through the
    * join). k bound: merges apply via [[foldMergesBatched]] — a single
    * projection at small k, checkpointed 64-merge batches above it, so
    * production vocabularies (k=4096 measured, SCALE.md) work. */
  /** Apply `merges` to the distinct-word frame `words(word)` starting
    * from `firstSplit`, in CHECKPOINTED BATCHES of `mergeBatch` nested
    * [[mergeOnce]] expressions — returns `(word, __syms)`. One folded
    * expression per merge is fine through a few dozen merges, but the
    * single-projection fold hits Catalyst's Resolution iteration cap at
    * k≈256 (measured r13: `encodeBytes` at k=256 died with "Max
    * iterations (100) reached") and plan depth grows with k regardless —
    * the same cliff class as the r9 training-loop lineage blowup, with
    * the same remedy: cut the plan every batch with an eager
    * localCheckpoint of the SMALL distinct-word frame, releasing the
    * previous batch's blocks via [[checkpointSwap]]. k <= mergeBatch
    * keeps the original zero-materialization single-projection shape, so
    * the oracle-gated small-k serving queries are untouched. */
  private[graft] def foldMergesBatched(words: DataFrame, firstSplit: Column,
                                       merges: Seq[Merge],
                                       mergeBatch: Int = 64): DataFrame = {
    def foldGrp(grp: Seq[Merge]): Column =
      grp.foldLeft(col("__syms")) { case (a, m) => mergeOnce(a, m.left, m.right) }
    val init = words.select(col("word"), firstSplit.as("__syms"))
    if (merges.size <= mergeBatch) {
      if (merges.isEmpty) init
      else init.select(col("word"), foldGrp(merges).as("__syms"))
    } else {
      var cur: DataFrame = null
      for (grp <- merges.grouped(mergeBatch)) {
        val next = (if (cur == null) init else cur)
          .select(col("word"), foldGrp(grp).as("__syms"))
        cur = if (cur == null) next.localCheckpoint(true)
              else checkpointSwap(next, cur)
      }
      cur
    }
  }

  /** Fold merges over the distinct-word frame and project the
    * per-word serving columns, WITHOUT leaking the fold's final
    * checkpoint batch (r13 ADVICE): at k > mergeBatch,
    * [[foldMergesBatched]] returns a localCheckpoint-backed frame whose
    * blocks had no release path — intermediate batches free via
    * [[checkpointSwap]], but the LAST one lived until driver GC, one
    * distinct-word corpus copy per encode call in a long-lived session
    * (exactly what [[release]] exists to prevent). Here the small
    * projected vocab (one row per distinct word, counts/flags only) is
    * eagerly checkpointed and the fold frame's blocks are released
    * immediately; the vocab checkpoint itself is visible as a
    * LogicalRDD in the caller's final plan, so the Verify/Bench
    * runners' `CheckpointBlocks.release(result)` — and a library
    * caller's [[release]] — reclaim it. k <= mergeBatch keeps the
    * original zero-materialization lazy shape, so the oracle-gated
    * small-k queries are untouched. */
  private def foldMergesProjected(words: DataFrame, firstSplit: Column,
                                  merges: Seq[Merge], mergeBatch: Int = 64)
                                 (proj: DataFrame => DataFrame): DataFrame = {
    val folded = foldMergesBatched(words, firstSplit, merges, mergeBatch)
    if (merges.size <= mergeBatch) proj(folded)
    else {
      val out = proj(folded).localCheckpoint(true)
      graft.CheckpointBlocks.release(folded)
      out
    }
  }

  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val base = docs.select(col(idCol).as("id"),
      size(toks).cast("long").as("n_tokens"),
      aggregate(toks, lit(0L), (a, t) => a + length(t)).as("n_chars"),
      toks.as("__toks"))
    val vocab = foldMergesProjected(
        base.select(explode(col("__toks")).as("word")).distinct(),
        charSplit(col("word")), merges)(
      _.select(col("word"), size(col("__syms")).cast("long").as("__ns")))
    val perDoc = base.select(col("id"), explode(col("__toks")).as("word"))
      .join(vocab, Seq("word"))
      .groupBy("id").agg(sum(col("__ns")).as("__sum_ns"))
    // duplicate-id guard (the rankedEval fail-loud convention): the
    // per-id aggregate sums across ALL rows sharing the id, so a
    // duplicate would silently inflate every such row's count. Counted
    // over BASE rows, not tokens, and checked BEFORE the null/zero-token
    // branches — a token-count comparison (the previous form) lets a
    // duplicate slip when one of the rows has null or token-less text
    // (it short-circuits into the null/zero branch and emits two rows
    // for the id). The extra aggregate rides the same id-hash shuffle
    // as perDoc. Joins are NULL-SAFE (`<=>`, the q128 convention): a
    // null id is an id — an equi-join would silently DELETE null-id
    // rows from the output (and let two null-id rows, a duplicate this
    // guard exists to catch, vanish instead of raise).
    // join keys renamed (not Column-reference drops): idRows/perDoc share
    // base's lineage, so their `id` attributes collide with stripped's
    // under self-join resolution
    val idRows = base.groupBy("id").agg(count(lit(1)).as("__id_rows"))
      .withColumnRenamed("id", "__idr_id")
    val perDocR = perDoc.withColumnRenamed("id", "__pd_id")
    base.drop("__toks")
      .join(idRows, col("id") <=> col("__idr_id")).drop("__idr_id")
      .join(perDocR, col("id") <=> col("__pd_id"), "left").drop("__pd_id")
      // the raise lives in a FILTER, not the projected column: a guard
      // inside n_bpe_syms would be silently disabled by column pruning
      // the moment a caller selects around it — a Filter survives any
      // downstream projection, so the duplicate raises no matter which
      // columns the caller keeps
      .filter(when(col("__id_rows") > 1,
        raise_error(concat(lit("BpeVocab.encode: duplicate "),
          lit(idCol), lit(" value "),
          // a null id would null the whole concat and raise an
          // empty-message error — name it instead
          coalesce(col("id").cast("string"), lit("NULL")),
          lit(" — per-doc counts would silently merge"))).cast("boolean"))
        .otherwise(lit(true)))
      .select(col("id"), col("n_tokens"), col("n_chars"),
        when(col("n_tokens").isNull, lit(null).cast("long"))
          .when(col("n_tokens") === 0, lit(0L))
          .otherwise(col("__sum_ns")).as("n_bpe_syms"))
  }

  /** BYTE-FALLBACK serving encode — [[encode]]'s distinct-word fold over
    * [[byteSplit]] symbols plus the two claims that define the GPT-2
    * byte-level story:
    *
    *  - `lossless`: per word, the folded symbols concatenate back to the
    *    word's exact hex bytes (merges only ever concatenate adjacent
    *    symbols, but the column COMPUTES the reassembly rather than
    *    assuming it) — AND-ed per doc. TRUE everywhere is the no-UNK
    *    guarantee: unlike the char-level families' serving encoders
    *    (WordPiece/Unigram whole-word-UNK on an unseen character),
    *    nothing is ever dropped or replaced.
    *  - `n_oov_byte_words`: how many of the doc's words contain a byte
    *    OUTSIDE `trainAlphabet` (the trained model's [[byteAlphabet]]) —
    *    exactly the words a char-vocabulary tokenizer would have UNK-ed;
    *    they still encode losslessly here, merges simply don't apply.
    *
    * Returns `(id, n_tokens, n_bytes, n_bpe_syms, n_oov_byte_words,
    * lossless)`; null text yields null counts, token-less text zeros
    * with vacuous lossless=true (the [[encode]] semantics). Same
    * duplicate-id fail-loud filter and null-safe joins as [[encode]]. */
  def encodeBytes(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge], trainAlphabet: Seq[String]): DataFrame = {
    require(trainAlphabet.nonEmpty && trainAlphabet.size <= 256,
      s"encodeBytes: trainAlphabet must be 1..256 byte symbols, got ${trainAlphabet.size}")
    val toks = TextFunctions.tokens(col(textCol))
    val base = docs.select(col(idCol).as("id"),
      size(toks).cast("long").as("n_tokens"),
      aggregate(toks, lit(0L), (a, t) => a + length(sqlEncode(t, "UTF-8"))).as("n_bytes"),
      toks.as("__toks"))
    val alpha = array(trainAlphabet.map(lit): _*)
    val vocab = foldMergesProjected(
        base.select(explode(col("__toks")).as("word")).distinct(),
        byteSplit(col("word")), merges)(
      _.select(col("word"),
        size(col("__syms")).cast("long").as("__ns"),
        (concat_ws("", col("__syms")) === hex(sqlEncode(col("word"), "UTF-8")))
          .as("__lossless"),
        (size(array_except(byteSplit(col("word")), alpha)) > 0)
          .cast("long").as("__oov")))
    val perDoc = base.select(col("id"), explode(col("__toks")).as("word"))
      .join(vocab, Seq("word"))
      .groupBy("id").agg(sum(col("__ns")).as("__sum_ns"),
        min(col("__lossless")).as("__all_lossless"),
        sum(col("__oov")).as("__n_oov"))
      .withColumnRenamed("id", "__pd_id")
    val idRows = base.groupBy("id").agg(count(lit(1)).as("__id_rows"))
      .withColumnRenamed("id", "__idr_id")
    base.drop("__toks")
      .join(idRows, col("id") <=> col("__idr_id")).drop("__idr_id")
      .join(perDoc, col("id") <=> col("__pd_id"), "left").drop("__pd_id")
      .filter(when(col("__id_rows") > 1,
        raise_error(concat(lit("BpeVocab.encodeBytes: duplicate "),
          lit(idCol), lit(" value "),
          coalesce(col("id").cast("string"), lit("NULL")),
          lit(" — per-doc counts would silently merge"))).cast("boolean"))
        .otherwise(lit(true)))
      .select(col("id"), col("n_tokens"), col("n_bytes"),
        when(col("n_tokens").isNull, lit(null).cast("long"))
          .when(col("n_tokens") === 0, lit(0L))
          .otherwise(col("__sum_ns")).as("n_bpe_syms"),
        when(col("n_tokens").isNull, lit(null).cast("long"))
          .when(col("n_tokens") === 0, lit(0L))
          .otherwise(col("__n_oov")).as("n_oov_byte_words"),
        when(col("n_tokens").isNull, lit(null).cast("boolean"))
          .when(col("n_tokens") === 0, lit(true))
          .otherwise(col("__all_lossless")).as("lossless"))
  }
}
