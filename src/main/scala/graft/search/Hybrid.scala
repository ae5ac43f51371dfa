package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval FUSION — combine per-query ranked lists from
  * heterogeneous retrievers (lexical BM25, dense ANN, ...) into one
  * ranking with Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
  * SIGIR 2009):
  *
  *   rrf(d) = Σ_lists 1 / (k0 + rank_list(d))
  *
  * RRF is the standard production hybrid-search combiner because it
  * needs NO score calibration: BM25 scores and cosine similarities live
  * on incomparable scales, but ranks are ranks. `k0` (conventionally
  * 60) damps the head so one retriever's #1 can't dominate three
  * retrievers' #3s.
  *
  * INTEGER-EXACT here: each contribution is `1e6 div (k0 + rank)` —
  * the ppm-quantized reciprocal, summed in BIGINT. Cross-engine
  * bit-reproducible (the float form's sum order would matter at the
  * ulp), and the quantization only merges ranks beyond ~1e3, far past
  * any sane fused depth.
  *
  * Scale shape: inputs are already top-k-per-query frames — O(queries·k)
  * rows, NOT corpus-sized — so fusion is one union + one tiny
  * (query_id, doc_id) aggregation + one per-query WindowGroupLimit
  * top-k. Fusion cost is independent of corpus size by construction;
  * the heavy lifting stays in the retrievers ([[Lexical.bm25TopK]],
  * [[graft.similarity.Knn]]), each already bounded.
  */
object Hybrid {

  /** Fuse ranked lists into `(query_id, doc_id, rrf_ppm, n_lists, rank)`,
    * keeping the top `topK` per query (ties broken by doc_id). Every
    * input frame must carry `query_id`, `doc_id`, `rank` (rank 1-based;
    * extra columns are ignored). `n_lists` counts how many retrievers
    * surfaced the doc — the agreement signal a downstream re-ranker
    * wants. */
  def rrfFuse(ranked: Seq[DataFrame], topK: Int, k0: Long = 60L): DataFrame = {
    require(ranked.nonEmpty, "Hybrid.rrfFuse: no ranked lists")
    require(topK > 0, s"Hybrid.rrfFuse: topK must be positive, got $topK")
    require(k0 >= 0L, s"Hybrid.rrfFuse: k0 must be non-negative, got $k0")
    val slim = ranked.map { df =>
      df.select(col("query_id"), col("doc_id"),
        when(col("rank").isNull || col("rank") < 1L,
          raise_error(lit("Hybrid.rrfFuse: ranks must be 1-based positive")))
          .otherwise(col("rank").cast("long")).as("rank"))
    }
    val fused = slim.reduce(_ unionByName _)
      .groupBy("query_id", "doc_id")
      .agg(sum(expr(s"1000000 div ($k0 + rank)")).as("rrf_ppm"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }
}
