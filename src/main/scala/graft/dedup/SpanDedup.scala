package graft.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicated-SPAN detection: exact substring dedup at
  * k-token granularity, the missing layer between [[NearDedup]] (whole
  * documents that are mostly the same) and [[LineDedup]] (boilerplate
  * lines repeated across a site). Web corpora carry long verbatim
  * passages embedded in otherwise-distinct documents — license blocks,
  * quoted articles, templated product text — that document-level
  * near-dup never fires on and line-level scrub only catches when the
  * copy is line-aligned. Training on them memorizes the passage; the
  * published remedy is exact substring dedup over the token stream
  * (suffix-array dedup in the literature; the DISTRIBUTABLE form is
  * k-token rolling windows, which finds every duplicated substring of
  * length >= k).
  *
  * Method: every k-token window of every document is keyed by a 64-bit
  * fingerprint; a window is duplicated iff its key occurs in >= 2
  * DISTINCT documents; per document, overlapping/adjacent duplicated
  * windows merge into maximal spans. Because all windows share one
  * length, interval merging reduces to gap-based islands (consecutive
  * starts <= k apart always union into one contiguous span), so the
  * merge is a lag + running-sum window, not an interval tree.
  *
  * Scale shape: the window explode is linear in corpus tokens and only
  * 16-byte (doc_id, pos, key) triples ever shuffle — window TEXT exists
  * only map-side inside the fingerprint expression. (One deliberate
  * exception: when the scan plans fewer tasks than the cluster has cores
  * — a single-row-group fixture, never a real multi-file corpus — the
  * token arrays are repartitioned ONCE so the explode parallelizes;
  * serializing O(corpus tokens) of hashing on one core is strictly worse
  * than one bounded shuffle of the bytes. Detecting that case reads
  * `.rdd.getNumPartitions`, which costs one extra physical-planning pass
  * of the narrow projection per call — accepted: it is milliseconds
  * against an operator whose real work is corpus-scale hashing, and the
  * alternative, an unconditional repartition, measurably LOSES on
  * well-partitioned inputs per the Scratch probe in SURVEY §8.) The
  * duplicate-key filter is
  * one map-combinable distinct-count; span assembly is one window pass
  * partitioned by doc. No driver state, no pair explosion: cost is
  * O(corpus tokens), the same envelope as tokenization itself.
  */
object SpanDedup {

  /** (doc_id, pos, key) triples: one 64-bit rolling-hash fingerprint per
    * k-token window (TokenWindowHashes — O(n) total, no window strings;
    * the composed transform/slice/array_join form copies ~k times the
    * corpus bytes before hashing, see that class's scaladoc). Short docs
    * (< k tokens) yield [] and explode to nothing. Narrow scans spread
    * to full parallelism first — see the class scaladoc.
    */
  private def winsOf(docs: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    val projected = docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("__toks"))
    // size-derived rescue spread (r15): the checkpointed triples inherit
    // this partitioning into every downstream span stage, so a core-tuned
    // count multiplied through the whole query (see Spread's scaladoc)
    graft.operators.Spread.forCompute(projected)
      .select(col("doc_id"), posexplode(
        graft.functions.expr.TokenWindowHashes.token_window_hashes(col("__toks"), k)))
      .toDF("doc_id", "pos", "key")
  }

  /** Same-length interval merge of flagged (doc_id, pos) windows into
    * maximal spans: a window overlaps-or-touches its predecessor iff the
    * start gap is <= k, and the union of such a run is contiguous, so
    * islands by gap are exactly the maximal spans.
    */
  private def mergeIslands(flagged: DataFrame, k: Int): DataFrame = {
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    flagged
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(byPos) <= k, 0).otherwise(1))
      .withColumn("__isl", sum(col("__new")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + k).cast("long").as("span_end"))
      .withColumn("span_tokens", col("span_end") - col("span_start"))
      .select("doc_id", "span_start", "span_end", "span_tokens")
  }

  /** Share/gate readout over a span frame joined back to the docs —
    * shared by the batch and incremental forms. */
  private def shareOf(docs: DataFrame, idCol: String, textCol: String,
                      spans: DataFrame, maxPermille: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .join(spans.groupBy("doc_id").agg(sum(col("span_tokens")).as("__dup")),
        Seq("doc_id"), "left")
      .withColumn("dup_tokens", coalesce(col("__dup"), lit(0L)))
      .withColumn("dup_permille",
        expr(s"dup_tokens * 1000L div greatest(n_tokens, 1L)"))
      .withColumn("keep", col("dup_permille") <= maxPermille)
      .select("doc_id", "n_tokens", "dup_tokens", "dup_permille", "keep")

  /** Maximal per-document spans of tokens covered by at least one
    * k-token window that also appears in another document. Returns
    * (doc_id, span_start, span_end, span_tokens) with token positions
    * 0-based and span_end exclusive — span_tokens = span_end - span_start.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    require(k > 0, s"duplicatedSpans: k must be positive, got $k")
    // The triples feed two consumers (the distinct-doc count and the
    // flag-back join) — localCheckpoint so the O(corpus-token)
    // tokenize+hash+explode runs once and only its 16-byte rows are
    // retained (reclaimed by the ContextCleaner when the result is
    // dropped, unlike a CacheManager persist).
    val wins = winsOf(docs, idCol, textCol, k).localCheckpoint()
    val dupKeys = wins.groupBy("key")
      .agg(count_distinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= 2)
      .select("key")
    val flagged = wins.join(dupKeys, Seq("key")).select("doc_id", "pos")
    mergeIslands(flagged, k)
  }

  /** Per-document duplicated-token share and the keep/drop gate a
    * curation pipeline applies on top of [[duplicatedSpans]]: docs whose
    * duplicated share exceeds `maxPermille` are mostly someone else's
    * text and drop. Spans are disjoint by construction, so the share is
    * an exact integer ratio (parts-per-thousand, integer division) —
    * cross-engine stable and safe to gate on. Every input doc appears
    * (dup_tokens = 0 when clean).
    */
  def dupSpanShare(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, maxPermille: Int = 500): DataFrame = {
    require(0 <= maxPermille && maxPermille <= 1000,
      s"dupSpanShare: maxPermille in [0,1000], got $maxPermille")
    shareOf(docs, idCol, textCol, duplicatedSpans(docs, idCol, textCol, k),
      maxPermille)
  }

  /** The span-dedup STATE for incremental ingestion: the distinct
    * k-token window keys of a curated corpus, one 8-byte key per
    * distinct window — O(corpus tokens) rows, the honest size of exact
    * substring dedup (a suffix automaton is no smaller). Persist it
    * BUCKETED BY key: the per-batch probes below join on `key`, so a
    * bucketed state never re-shuffles — only the (small) batch's keys
    * move, the same state-side contract as [[NearDedup.minhashState]].
    * Append [[spanStateDelta]] of each accepted batch to keep it
    * current.
    */
  def spanState(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    require(k > 0, s"spanState: k must be positive, got $k")
    winsOf(docs, idCol, textCol, k).select("key").distinct()
  }

  /** The state rows a batch contributes: its distinct window keys not
    * already present in `stateKeys`.
    */
  def spanStateDelta(stateKeys: DataFrame, batch: DataFrame, idCol: String,
                     textCol: String, k: Int): DataFrame =
    winsOf(batch, idCol, textCol, k).select("key").distinct()
      .join(stateKeys.select(col(stateKeys.columns.head).as("key")),
        Seq("key"), "left_anti")

  /** Incremental [[duplicatedSpans]]: spans of BATCH documents covered
    * by windows that exist in the corpus state (any historical doc) or
    * in >= 2 distinct batch documents — exactly the spans the batch
    * form would report on state ∪ batch, restricted to batch docs,
    * without re-exploding the historical corpus.
    *
    * Scale shape: the batch's 16-byte triples are checkpointed once;
    * the state probe is a semi join on `key` (map-side against a
    * bucketed state); the within-batch check is the same bounded
    * distinct-count as the batch form. History is touched only through
    * its key set.
    */
  def duplicatedSpansIncremental(stateKeys: DataFrame, batch: DataFrame,
                                 idCol: String, textCol: String,
                                 k: Int): DataFrame = {
    require(k > 0, s"duplicatedSpansIncremental: k must be positive, got $k")
    val wins = winsOf(batch, idCol, textCol, k).localCheckpoint()
    val withinBatch = wins.groupBy("key")
      .agg(count_distinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= 2)
      .select("key")
    // no pre-join distinct: the semi join passes duplicate keys through,
    // but the union's distinct below dedups anyway — the extra distinct
    // was one more narrow all-core shuffle barrier in a query whose
    // bench spread is straggler-amplification under host contention
    // (r12 VERDICT #2: ~3 s idle, 11-21 s on a load-0.94 host; see the
    // q103 row in SCALE.md), so barriers are the thing to minimize.
    val inState = wins.select("key")
      .join(stateKeys.select(col(stateKeys.columns.head).as("key")),
        Seq("key"), "left_semi")
    val dupKeys = withinBatch.unionByName(inState).distinct()
    val flagged = wins.join(dupKeys, Seq("key")).select("doc_id", "pos")
    mergeIslands(flagged, k)
  }

  /** Incremental [[dupSpanShare]]: the admission gate a daily-increment
    * pipeline applies — batch docs mostly made of text the corpus (or
    * the rest of the batch) already has, drop.
    */
  def dupSpanShareIncremental(stateKeys: DataFrame, batch: DataFrame,
                              idCol: String, textCol: String,
                              k: Int, maxPermille: Int = 500): DataFrame = {
    require(0 <= maxPermille && maxPermille <= 1000,
      s"dupSpanShareIncremental: maxPermille in [0,1000], got $maxPermille")
    shareOf(batch, idCol, textCol,
      duplicatedSpansIncremental(stateKeys, batch, idCol, textCol, k),
      maxPermille)
  }

  /** Maximal cross-document exact MATCHES at variable length — the
    * granularity of suffix-array substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": remove
    * every maximal duplicated substring of >= N tokens). The fixed-k
    * form above answers "which of MY tokens sit in some duplicated
    * window"; the merged island can stitch windows duplicated in
    * DIFFERENT partner documents, so it bounds but does not name the
    * actual shared substrings. This operator reports each maximal
    * matching substring as a PAIR fact: (id_a, id_b, start_a, start_b,
    * match_tokens), id_a < id_b, token positions 0-based, the match not
    * extendable by one token on either side.
    *
    * Distributed suffix-array equivalent: a common substring of length
    * L >= k between two documents at offsets (pA, pB) is exactly a run
    * of L-k+1 consecutive k-window agreements at constant offset
    * delta = pB - pA, and maximality of the substring is maximality of
    * the run (the window at pA-1 or pA+L-k+1 with the same delta would
    * otherwise extend it). So: anchor-join the k-window fingerprints
    * across documents, then gap-1 islands over pos_a within each
    * (id_a, id_b, delta) group — the same lag + running-sum machinery
    * as [[duplicatedSpans]]'s island merge, one partition key wider. No
    * suffix array is materialized; nothing driver-side.
    *
    * Scale shape: window triples are linear in corpus tokens; the
    * anchor self-join fans out d*(d-1)/2 pairs for a key shared by d
    * documents, so `maxDocFreq` caps d — windows above it (site
    * boilerplate shared by thousands of docs) are excluded from
    * ANCHORING, the standard posting-length cap of every inverted-index
    * candidate generator here (NearDedup postings, LineDedup). The cap
    * trades completeness on ultra-hot boilerplate for a hard quadratic
    * bound, and truncates maximality only for matches whose extension
    * window itself exceeds the cap; set it above the corpus's max
    * per-key doc frequency (the gated query does) for exact output.
    * Run assembly shuffles on (id_a, id_b, delta) — pair-local keys,
    * no hub concentration beyond the capped fan-out itself.
    *
    * `minTokens` (>= k) filters the reported matches; k stays the
    * anchoring granularity, so one call serves any threshold >= k
    * without re-hashing (the Lee et al. N=50 setting is k=8..16 with
    * minTokens=50 here).
    */
  def maximalMatches(docs: DataFrame, idCol: String, textCol: String,
                     k: Int, minTokens: Int,
                     maxDocFreq: Long = 10000L): DataFrame = {
    require(k > 0, s"maximalMatches: k must be positive, got $k")
    require(minTokens >= k,
      s"maximalMatches: minTokens ($minTokens) must be >= k ($k) — " +
        "shorter matches have no anchoring window")
    require(maxDocFreq >= 2, s"maximalMatches: maxDocFreq >= 2, got $maxDocFreq")
    val wins = winsOf(docs, idCol, textCol, k).localCheckpoint()
    val dupKeys = wins.groupBy("key")
      .agg(count_distinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= 2 && col("__nd") <= maxDocFreq)
      .select("key")
    val cand = wins.join(dupKeys, Seq("key"))
    val anchors = cand.select(col("key"), col("doc_id").as("id_a"), col("pos").as("pos_a"))
      .join(cand.select(col("key"), col("doc_id").as("id_b"), col("pos").as("pos_b")),
        Seq("key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("pos_a"),
        (col("pos_b") - col("pos_a")).as("__delta"))
    val byRun = Window.partitionBy("id_a", "id_b", "__delta").orderBy("pos_a")
    anchors
      .withColumn("__new",
        when(col("pos_a") - lag(col("pos_a"), 1).over(byRun) === 1, 0).otherwise(1))
      .withColumn("__run", sum(col("__new")).over(
        byRun.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id_a"), col("id_b"), col("__delta"), col("__run"))
      .agg(min(col("pos_a")).cast("long").as("start_a"),
        (max(col("pos_a")) - min(col("pos_a")) + k).cast("long").as("match_tokens"))
      .withColumn("start_b", (col("start_a") + col("__delta")).cast("long"))
      .filter(col("match_tokens") >= minTokens)
      .select("id_a", "id_b", "start_a", "start_b", "match_tokens")
  }

  /** Count of a document's tokens covered by k-token windows whose keys a
    * Bloom filter of the corpus state accepts — the PER-ROW (stateless)
    * form of the duplicated-span measure, usable in any projection
    * including a streaming one ([[graft.streaming.StreamingOps]]'
    * ingest-time gate). One left fold over the window-hash array: a hit
    * at position p adds `(p + k) - max(coveredEnd, p)` newly covered
    * tokens (positions ascend, so coveredEnd only grows and the island
    * merge degenerates to this running max). Bloom false positives
    * OVERcount — the safe direction for a drop gate.
    */
  def coveredByState(toks: org.apache.spark.sql.Column,
                     bloomBc: org.apache.spark.broadcast.Broadcast[
                       org.apache.spark.util.sketch.BloomFilter],
                     k: Int): org.apache.spark.sql.Column = {
    require(k > 0, s"coveredByState: k must be positive, got $k")
    import graft.functions.expr.{BloomMightContain, TokenWindowHashes}
    val hitAt = transform(
      TokenWindowHashes.token_window_hashes(toks, k),
      (key, i) => struct(i.cast("long").as("p"),
        BloomMightContain.bloom_might_contain(key, bloomBc).as("hit")))
    aggregate(hitAt,
      struct(lit(0L).as("cov"), lit(-1L).as("end")),
      (acc, s) => when(s.getField("hit"),
          struct(
            (acc.getField("cov") + s.getField("p") + lit(k.toLong) -
              greatest(acc.getField("end"), s.getField("p"))).as("cov"),
            (s.getField("p") + lit(k.toLong)).as("end")))
        .otherwise(acc),
      acc => acc.getField("cov"))
  }
}
