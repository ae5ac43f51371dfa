package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document LINE deduplication — the C4-style boilerplate scrub
  * (navigation menus, cookie banners, newsletter footers, license
  * headers): a line that appears in at least `minDocFreq` DISTINCT
  * documents is boilerplate and is removed from every document; all other
  * lines survive in their original order and byte-for-byte form.
  *
  * This is the corpus-level TEXT TRANSFORMATION counterpart of the pair
  * producers in [[NearDedup]]: instead of flagging near-duplicate
  * documents, it rewrites each document with the corpus-hot lines
  * removed.
  *
  * Scale shape (the whole point at 100 TB):
  *  - lines are exploded once and keyed by a 64-bit hash of the
  *    normalized line (lowercase, space-trimmed, whitespace runs
  *    collapsed) — the document-frequency shuffle carries only
  *    `(hash, doc_id)` rows, never line text;
  *  - the HOT set (distinct lines with df >= minDocFreq) is tiny relative
  *    to the corpus — boilerplate is by definition low-cardinality — so
  *    it broadcasts and the removal anti-join is map-side: the exploded
  *    corpus never shuffles by line. Pass `broadcastHot = false` for a
  *    degenerate corpus (minDocFreq so low the hot set rivals the corpus)
  *    to fall back to a shuffled anti join;
  *  - the rebuild groups by doc_id — per-group state is bounded by a
  *    single document's line count, and the shuffle key is the id the
  *    corpus is typically already bucketed by.
  *
  * Semantics notes: blank lines (normalized-empty) are never counted and
  * never removed — paragraph structure survives. A document whose every
  * line is boilerplate comes back with empty text and n_lines_kept = 0
  * (it stays in the corpus; dropping empties is a downstream quality-gate
  * decision). Hash collisions across distinct normalized lines would
  * merge their df counts — with 64-bit keys that needs ~2^32 distinct
  * lines per corpus before the first expected collision.
  *
  * Probe-backed (Scratch): 50k docs with planted boilerplate scrub in
  * ~0.4 s — cost tracks lines scanned + survivors rebuilt, and the only
  * wide operations are the (hash, doc_id) df count and the per-doc
  * rebuild.
  */
object LineDedup {

  /** (id, idx, line, __fp) rows: one per physical line, fingerprinted by
    * a 64-bit hash of the normalized form (same normalization as
    * HashFunctions.fingerprint64), with the text kept alongside so
    * survivors rebuild byte-identically.
    */
  private def linesOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("idx", "line")))
      .withColumn("__fp",
        xxhash64(regexp_replace(lower(trim(col("line"))), "\\s+", " ")))

  /** Rebuild each document from the lines NOT in `hot`, in original
    * order; fully-boilerplate documents come back empty, not vanish.
    */
  private def rebuild(docs: DataFrame, idCol: String, lines: DataFrame,
                      hot: DataFrame, broadcastHot: Boolean): DataFrame = {
    val h = if (broadcastHot) broadcast(hot) else hot
    val rebuilt = lines
      .join(h, Seq("__fp"), "left_anti")
      .groupBy(col("id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("line")))),
            s => s.getField("line")),
          "\n").as("text_scrubbed"),
        count(lit(1)).as("n_lines_kept"))
    docs.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("text_scrubbed"), lit("")).as("text_scrubbed"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"))
  }

  /** Returns `(idCol, text_scrubbed, n_lines_kept)` — one row per input
    * document, lines with corpus document-frequency >= `minDocFreq`
    * removed.
    */
  def scrubHotLines(docs: DataFrame, idCol: String, textCol: String,
                    minDocFreq: Int, broadcastHot: Boolean = true): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    val lines = linesOf(docs, idCol, textCol)
    val hot = lines
      .filter(trim(col("line")) =!= "") // blank lines are structure, not boilerplate
      .groupBy(col("__fp"))
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDocFreq)
      .select("__fp")
    rebuild(docs, idCol, lines, hot, broadcastHot)
  }

  /** WITHIN-document repeated-line scrub — [[scrubHotLines]]'s
    * intra-document half (the other C4 line rule): a line repeated
    * INSIDE one document (chat-log echoes, scraped pagination, template
    * stutter) keeps its FIRST occurrence only; later occurrences of the
    * same normalized form are dropped. Blank lines always survive —
    * paragraph structure is not repetition. Normalization matches the
    * corpus scrub (lowercase, space-trimmed, whitespace runs collapsed);
    * surviving lines are byte-identical and in original order.
    *
    * Scale shape — and the reason this is NOT the [[scrubHotLines]]
    * machinery: the state a decision needs (lines seen so far) is
    * per-document, so the whole scrub is ONE narrow projection — a
    * higher-order `aggregate` over the split lines carrying a
    * (seen-normals, kept-lines) accumulator. No explode, no shuffle, no
    * join; it composes into the ingest scan like [[graft.operators
    * .QualitySignals.gopherGate]]. The accumulator's `array_contains`
    * scan makes a document cost O(distinct-lines²) — fine to thousands
    * of lines; a pathological million-line single document belongs to
    * the explode+window form, not this one. A null text null-propagates.
    */
  def scrubRepeatedLines(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val empty = array().cast("array<string>")
    val init = struct(empty.as("seen"), empty.as("kept"))
    val scrubbed = aggregate(
      split(col(textCol), "\n"), init,
      (acc, l) => {
        val norm = regexp_replace(lower(trim(l)), "\\s+", " ")
        val seen = acc.getField("seen")
        val kept = acc.getField("kept")
        when(norm === "",
            struct(seen.as("seen"), concat(kept, array(l)).as("kept")))
          .when(array_contains(seen, norm),
            struct(seen.as("seen"), kept.as("kept")))
          .otherwise(
            struct(concat(seen, array(norm)).as("seen"),
              concat(kept, array(l)).as("kept")))
      })
    docs.select(col(idCol),
        when(col(textCol).isNotNull, scrubbed).as("__acc"))
      .select(col(idCol),
        array_join(col("__acc.kept"), "\n").as("text_scrubbed"),
        size(col("__acc.kept")).cast("long").as("n_lines_kept"))
  }

  /** The line-dedup STATE for incremental ingestion: per normalized-line
    * fingerprint, the count of distinct historical documents containing
    * it — `(key, df)`, bounded by the corpus's distinct-line cardinality
    * and mergeable by addition ([[mergeLineState]]). The same
    * (hash, doc_id)-narrow shuffle as the batch count; line text never
    * enters the state.
    */
  def lineState(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    linesOf(docs, idCol, textCol)
      .filter(trim(col("line")) =!= "")
      .groupBy(col("__fp").as("key")).agg(countDistinct(col("id")).as("df"))

  /** Merge line states built from DISJOINT document sets (df adds only
    * when no document is counted twice): the union's state.
    */
  def mergeLineState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("key")).agg(sum(col("df")).as("df"))

  /** Takedown: subtract removed documents' line document-frequencies
    * from a persisted state — equals [[lineState]] over the survivors
    * exactly when the removed set is a subset of what was ingested
    * (df partitions across disjoint doc sets), re-reading only the
    * removed docs ([[graft.operators.Retraction]]).
    */
  def retractLineState(state: DataFrame, removedDocs: DataFrame,
                       idCol: String, textCol: String): DataFrame =
    graft.operators.Retraction.subtract(state,
      lineState(removedDocs, idCol, textCol), Seq("key"), "df")

  /** Incremental [[scrubHotLines]]: batch documents rewritten with the
    * lines hot in state ∪ batch removed — PROVABLY equal to the batch
    * form on the union restricted to the batch, when state and batch
    * document sets are disjoint (df over the union = state df + batch
    * df). Prospective only, the production contract: documents published
    * before a line crossed the threshold are not rewritten — reprocess
    * with the batch form when retroactive scrubbing matters.
    *
    * Scale shape: only lines PRESENT IN THE BATCH can need removal, so
    * the state is probed by a join on the batch's (far smaller) distinct
    * line keys — history contributes counts, never rows to rebuild.
    */
  def scrubHotLinesIncremental(state: DataFrame, batch: DataFrame,
                               idCol: String, textCol: String,
                               minDocFreq: Int,
                               broadcastHot: Boolean = true): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    val lines = linesOf(batch, idCol, textCol)
    val hot = lines
      .filter(trim(col("line")) =!= "")
      .groupBy(col("__fp"))
      .agg(countDistinct(col("id")).as("__bdf"))
      .join(state.select(col("key").as("__fp"), col("df").as("__sdf")),
        Seq("__fp"), "left")
      .filter(col("__bdf") + coalesce(col("__sdf"), lit(0L)) >= minDocFreq)
      .select("__fp")
    rebuild(batch, idCol, lines, hot, broadcastHot)
  }
}
