package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: assign documents to fixed
  * token-budget bins (context windows) so a training loader can
  * concatenate each bin into one sequence.
  *
  * Semantics: within each group, documents are laid out in a deterministic
  * order as one conceptual token stream; the stream is cut every `budget`
  * tokens, and a document belongs to the bin containing its FIRST token
  * (`bin = exclusive-prefix-sum div budget`). This is offset-based
  * packing: every bin's token total lands in (budget - max_doc_tokens,
  * budget + max_doc_tokens) rather than exactly budget — the standard
  * approximation that keeps packing a single window pass. True next-fit /
  * first-fit packing needs sequential per-bin state (each decision depends
  * on the previous bin's remaining capacity), which would serialize the
  * group; offset packing is order-deterministic, one shuffle on the group
  * key, and SQL-replayable, which makes it both scalable and
  * oracle-checkable.
  *
  * Documents longer than `budget` are not split — they occupy their
  * starting bin (and push later docs into higher bins), matching loaders
  * that truncate rather than straddle.
  */
object SequencePacking {

  /** Adds `bin` (0-based Long) to `docs`, packing per `groupCols` in
    * `orderCols` order by cumulative `nTokensCol`. */
  def packBins(docs: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
               nTokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"packBins: budget must be positive, got $budget")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__cum", sum(col(nTokensCol).cast("long")).over(w))
      .withColumn("bin", expr(s"(__cum - cast(`$nTokensCol` as long)) div $budget"))
      .drop("__cum")
  }

  /** Length-bucketed packing — the NO-STRADDLE alternative to
    * [[packBins]]: a document never crosses a window boundary, and every
    * bin's token total is GUARANTEED <= budget (offset packing overflows
    * by up to one document; loaders then truncate mid-document, which
    * burns tokens and splits sentences across examples). Documents are
    * bucketed by power-of-two capacity class `len_bucket` = the largest
    * k with n_tokens <= budget >> k, and each bin of bucket k holds
    * exactly 2^k documents (the last bin per bucket may hold fewer):
    * 2^k docs, each <= budget/2^k, always fit. Because every doc in
    * bucket k is also > budget >> (k+1), every FULL bin is > 50%
    * utilized — the classic bounded-waste guarantee of power-of-two
    * bucketing, bought without any sequential first-fit state.
    * Oversize documents (n_tokens > budget) get `len_bucket` = -1, one
    * per bin (the loader-truncates convention [[packBins]] shares); a
    * null/nonpositive token count null-propagates to a null bucket/bin
    * (unknown stays unknown — the house gate convention).
    *
    * Output: `len_bucket` (int) and `bin` (long, 0-based within
    * (group, len_bucket) in `orderCols` order) — the pair identifies a
    * window within its group. All arithmetic is integer bit-math
    * (floor-log2 via `length(bin(x)) - 1`, the [[Quantiles.bucketSql]]
    * spelling), so the layout is deterministic, partition-invariant,
    * and SQL-replayable.
    *
    * Scale shape: one shuffle on (group, len_bucket) for the
    * row_number window — same cost class as [[packBins]]'s group
    * window, with the added benefit that the partition key carries the
    * bucket, splitting a hot group across <= 64 bucket partitions.
    * `maxDocsPerBin` caps 2^k (tiny docs would otherwise put millions
    * of rows in one bin id; capping trades utilization for bounded
    * bins, never correctness).
    */
  def packByLengthBucket(docs: DataFrame, groupCols: Seq[String],
                         orderCols: Seq[Column], nTokensCol: String,
                         budget: Long, maxDocsPerBin: Long = 4096L): DataFrame = {
    require(budget > 0, s"packByLengthBucket: budget must be positive, got $budget")
    require(maxDocsPerBin > 0 && (maxDocsPerBin & (maxDocsPerBin - 1)) == 0,
      s"packByLengthBucket: maxDocsPerBin must be a positive power of two, got $maxDocsPerBin")
    val n = s"cast(`$nTokensCol` as long)"
    val maxK = 63 - java.lang.Long.numberOfLeadingZeros(maxDocsPerBin)
    val bucket =
      when(expr(n).isNull || expr(n) <= 0, lit(null))
        .when(expr(n) > budget, lit(-1))
        .otherwise(least(expr(s"length(bin($budget div $n)) - 1"), lit(maxK)))
        .cast("int")
    val w = Window.partitionBy((groupCols.map(col) :+ col("len_bucket")): _*)
      .orderBy(orderCols: _*)
    docs
      .withColumn("len_bucket", bucket)
      .withColumn("__rn",
        when(col("len_bucket").isNotNull, row_number().over(w)))
      .withColumn("bin",
        when(col("len_bucket").isNull, lit(null).cast("long"))
          .when(col("len_bucket") === -1, (col("__rn") - 1).cast("long"))
          .otherwise(expr("cast(__rn - 1 as long) div shiftleft(1L, len_bucket)")))
      .drop("__rn")
  }

  /** SENTENCE-bounded chunking: split each document into sentences
    * ([[graft.functions.TextFunctions.sentences]]) and assign
    * consecutive sentences to chunks of ~`budgetTokens` tokens WITHOUT
    * ever splitting a sentence — the retrieval/context-window chunker
    * for prose, where [[graft.functions.TextFunctions.tokenWindows]]'
    * fixed token grid would cut mid-sentence. Assignment is the
    * [[graft.sources.Layout.compactionPlan]] prefix rule (chunk =
    * tokens-before div budget): pure window arithmetic, exactly
    * SQL-replayable, with the same bound — a chunk exceeds the budget
    * by at most its last sentence, and a single over-budget sentence
    * becomes its own chunk rather than splitting.
    *
    * Scale shape: sentence TEXT never shuffles — token counts are
    * computed in the map stage and only `(doc_id, sidx, n_tok)` rows
    * enter the per-document window (the q84 narrow-shuffle rule); one
    * shuffle on doc_id, aggregation to chunk cardinality. Output:
    * `(doc_id, chunk, n_sentences, n_tokens, first_sidx)` — callers
    * that need chunk text rebuild it by joining sidx ranges back to
    * the sentence array, keeping the shuffle narrow here.
    */
  def sentenceChunks(docs: DataFrame, idCol: String, textCol: String,
                     budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0,
      s"sentenceChunks: budgetTokens must be positive, got $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val sent = docs
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.TextFunctions.sentences(col(textCol))))
      .select(col("doc_id"), col("pos").cast("long").as("sidx"),
        graft.functions.TextFunctions.tokenCount(col("col")).cast("long")
          .as("n_tok"))
    val w = Window.partitionBy("doc_id").orderBy("sidx")
      .rowsBetween(Window.unboundedPreceding, -1)
    sent
      .withColumn("__before", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("chunk", expr(s"__before div ${budgetTokens}L"))
      .groupBy("doc_id", "chunk")
      .agg(count(lit(1)).as("n_sentences"), sum("n_tok").as("n_tokens"),
        min("sidx").as("first_sidx"))
  }
}
