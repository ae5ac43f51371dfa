package graft.search

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Lexical (keyword) retrieval over a document corpus: BM25 top-k search
  * and corpus vocabulary statistics. Complements the embedding-side
  * similarity operators ([[graft.similarity.Knn]]) with the sparse
  * retrieval path a training-data pipeline uses for targeted corpus
  * probes ("find the documents about X") and tokenizer/vocab work.
  *
  * Scale shape (the reference has no search operator; this is north-star
  * scope like SURVEY.md §7 step 8): the corpus is scanned ONCE into a
  * narrow (doc_id, dl, query-term hits) projection — the query-term
  * filter runs map-side against a broadcast term set, so the shuffled
  * intermediate carries only documents matching at least one query term.
  * Corpus-level stats (N, avgdl) and per-term document frequencies are
  * tiny aggregates broadcast back into the scoring join; the corpus
  * itself never shuffles on anything wider than (doc_id, term).
  */
object Lexical {

  // persist the narrow per-doc projection the BM25 plan references twice
  // (corpus stats + term frequencies) so the corpus is scanned and
  // tokenized once — lifecycle contract in [[graft.TrackedCache]]
  private val cache = new graft.TrackedCache
  private def reused(df: DataFrame, reuse: Boolean): DataFrame =
    cache.reused(df, reuse)

  /** Unpersist every index frame persisted by operators in this object
    * (non-blocking). Call after the consuming action. */
  def releaseIndexes(): Unit = cache.releaseAll()

  /** Driver-side tokenization mirroring [[TextFunctions.tokens]] exactly:
    * trim, lowercase, split on whitespace runs, drop empties. Queries are
    * tiny driver-side strings; documents always tokenize executor-side.
    */
  def tokenize(text: String): Seq[String] =
    // Locale.ROOT: default-locale toLowerCase diverges from Spark's
    // locale-independent lower() (e.g. Turkish 'I' -> dotless i), which
    // would make query terms miss corpus tokens and skew the oracle SQL.
    text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSeq.filter(_.nonEmpty)

  /** BM25 top-k documents per query. Returns
    * (query_id, rank, doc_id, score) with rank 1..k per query.
    *
    * Scoring is Robertson/Sparck-Jones BM25 with the standard "+1" idf
    * (always positive): `idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))`,
    * `tfNorm = tf (k1+1) / (tf + k1 (1 - b + b dl/avgdl))`, summed over
    * query terms weighted by their in-query multiplicity.
    *
    * Determinism across engines: per-term contributions are rounded to 9
    * decimals and summed as DECIMAL(28,10) — decimal addition is exact
    * and associative, so the per-(query, doc) score does not depend on
    * aggregation order (a raw double sum would drift by ulps between
    * partial-agg trees and be unreplayable in an oracle). Ranking orders
    * by that exact decimal, tie-broken by doc_id.
    *
    * The rank <= k filter plans as WindowGroupLimit (asserted in
    * SearchSpec): each map task keeps only its local top-k per query
    * before the query_id shuffle, so a query matching half the corpus
    * still moves O(k * tasks) rows, not its full posting list.
    *
    * Probe-backed (Scratch, 10x docs = 50k): 2.6 s for 3 queries vs
    * ~1.2 s at 1x — cost tracks the corpus scan, not the pair space or
    * posting volume.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Int, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               reuseIndex: Boolean = true): DataFrame = {
    require(k > 0, s"bm25TopK: k must be positive, got $k")
    require(queries.nonEmpty, "bm25TopK: no queries")
    val spark = docs.sparkSession
    import spark.implicits._

    // (query_id, term, weight): weight = term multiplicity in the query.
    val qrows: Seq[(Int, String, Long)] = queries.flatMap { case (qid, qt) =>
      tokenize(qt).groupBy(identity).toSeq.sortBy(_._1)
        .map { case (t, g) => (qid, t, g.size.toLong) }
    }
    require(qrows.nonEmpty, "bm25TopK: every query tokenized to empty")
    val terms = qrows.map(_._2).distinct.sorted

    // One corpus scan: doc length + the tokens that appear in any query
    // (map-side In-filter against the small broadcast term list).
    val base = reused(
      docs.select(col(idCol).as("doc_id"),
          TextFunctions.tokens(col(textCol)).as("toks"))
        .select(col("doc_id"), size(col("toks")).as("dl"),
          filter(col("toks"), t => t.isInCollection(terms)).as("qtoks")),
      reuseIndex)

    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))

    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("qtoks")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))

    val q = qrows.toDF("query_id", "term", "w")

    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    val contrib = round(col("w") * idf * tfNorm, 9).cast("decimal(28,10)")

    val scored = tf
      .join(broadcast(docFreq), Seq("term"))
      .join(broadcast(q), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), contrib.as("contrib"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score_dec"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("score_dec").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score_dec").cast("double"), 4).as("score"))
  }

  /** The `limit` most frequent vocabulary terms with collection frequency
    * (cf = total occurrences) and document frequency (df = docs containing
    * the term); deterministic order (cf desc, term). The raw per-token
    * explode is aggregated to (doc_id, term, tf) first — partial hash
    * aggregation combines within each scan task, so the term shuffle
    * carries one row per distinct (doc, term), not one per occurrence —
    * then reduced per term. Final top-N is TakeOrderedAndProject.
    */
  def vocabStats(docs: DataFrame, idCol: String, textCol: String,
                 limit: Int = 100): DataFrame = {
    require(limit > 0, s"vocabStats: limit must be positive, got $limit")
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(sum("tf").as("cf"), count(lit(1)).as("df"))
      .orderBy(col("cf").desc, col("term"))
      .limit(limit)
  }

  /** Tokenizer-health / OUT-OF-VOCABULARY rate: fix the vocabulary at the
    * corpus's `vocabSize` most frequent tokens (ties to the lexically
    * smaller token — a deterministic total order, so the vocab is
    * replayable), then score every document by the permille of its token
    * OCCURRENCES that fall outside it. The training-pipeline reading: a
    * doc whose oov_permille is high will shatter into rare-token/byte
    * fallbacks at tokenization time — disproportionate sequence length,
    * weak learning signal — and the corpus-level distribution of this
    * score is the "does our vocab fit this data" health check run before
    * committing to a tokenizer.
    *
    * Returns (doc_id, n_tokens, oov_permille) — integer permille of exact
    * counts, so the gate cannot flap on rounding. Docs with zero tokens
    * are absent by definition.
    *
    * Scale shape: one map-side-combinable token-count shuffle (distinct-
    * token cardinality, not corpus cardinality), a TakeOrdered top-k for
    * the vocab (no global sort), the vocab re-joined BROADCAST so per-doc
    * flagging is map-side, and one pre-combined per-doc aggregation.
    */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"oovRate: vocabSize must be positive, got $vocabSize")
    oovRateAgainst(docs, idCol, textCol,
      vocabFromCounts(termCounts(docs, idCol, textCol), vocabSize))
  }

  /** Corpus term-occurrence counts (term, cf) — the VOCABULARY STATE of
    * the [[oovRate]] workflow, and a member of the persistable-state
    * family: counts over disjoint document sets merge by per-term
    * ADDITION ([[mergeTermCounts]]), exactly, so a vocab trained
    * incrementally over daily snapshots equals the one trained in a
    * single pass. One map-side-combinable shuffle at distinct-term
    * cardinality.
    */
  def termCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cf"))

  /** Merge persisted [[termCounts]] increments (disjoint doc sets) by
    * per-term addition. */
  def mergeTermCounts(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "mergeTermCounts: no increments")
    parts.reduce(_ unionByName _).groupBy("term").agg(sum("cf").as("cf"))
  }

  /** Takedown: subtract removed documents' term counts from a persisted
    * state — `retract(state(all), removed) == termCounts(survivors)`
    * exactly, re-reading ONLY the removed docs
    * ([[graft.operators.Retraction]] contract; negative counts fail
    * loudly, zero-count terms drop).
    */
  def retractTermCounts(state: DataFrame, removedDocs: DataFrame,
                        idCol: String, textCol: String): DataFrame =
    graft.operators.Retraction.subtract(state,
      termCounts(removedDocs, idCol, textCol), Seq("term"), "cf")

  /** The top-`vocabSize` vocabulary from a (term, cf) state: ties to the
    * lexically smaller term — a deterministic total order, TakeOrdered
    * (no global sort exchange).
    */
  def vocabFromCounts(counts: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabFromCounts: vocabSize must be positive, got $vocabSize")
    graft.operators.Aggregates.topK(counts,
        Seq(col("cf").desc, col("term").asc), vocabSize)
      .select("term")
  }

  /** [[oovRate]] against a FIXED vocabulary (one `term` column — from
    * [[vocabFromCounts]] over persisted counts, or an external tokenizer
    * vocab): the serving form, where the vocab was fixed yesterday and
    * today's batch is scored against it. Vocab joins BROADCAST; scoring
    * is map-side + one pre-combined per-doc aggregation.
    */
  def oovRateAgainst(docs: DataFrame, idCol: String, textCol: String,
                     vocab: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    toks.join(broadcast(vocab.select(col("term"), lit(1).as("__in_vocab"))),
        Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        expr("count(CASE WHEN __in_vocab IS NULL THEN 1 END) * 1000 div count(1)")
          .as("oov_permille"))
  }
}
