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
}
