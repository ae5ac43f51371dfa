package graft.search

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (MMR) diversification — the re-ranking
  * stage between retrieval and consumption (Carbonell & Goldstein 1998):
  * a dense top-k list is often m near-copies of the best hit; RAG
  * context windows and hard-negative pools want COVERAGE, not m
  * restatements. Greedily select `m` of the top-k candidates, each step
  * maximizing `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` — relevance to the
  * query minus redundancy against what is already selected.
  *
  * Arithmetic is integer ppm end to end so the greedy argmax is
  * bit-reproducible and SQL-replayable: `rel_ppm`/`sim_ppm` quantize the
  * cosine doubles via `floor(x·10⁶ + 0.5)` (floor is bit-deterministic
  * across engines; see the inline cast note), and
  * `score = λppm·rel_ppm − (10⁶−λppm)·penalty_ppm` stays under 10¹²
  * (long-exact). The penalty is `max sim to the selected set`, null
  * coalesced to 0 only at step 1 where the set is empty — from step 2
  * every remaining candidate has a real max, including negative ones
  * (diversity BONUS for anti-correlated candidates, the faithful MMR
  * semantics). Ties break to the smaller neighbor id; the argmax order
  * is total.
  *
  * Scale shape: everything after the one vector-fetch join is keyed by
  * `query_id` — candidate pair sims are |Q|·k² narrow rows, each greedy
  * step is one anti join + one per-query max + one WindowGroupLimit-
  * prunable row_number pick, and `m` is a small constant. Cost is
  * independent of corpus size by construction; the corpus itself never
  * shuffles (the candidate producer already paid that). Measured
  * (Scratch r11, 200k-vector corpus, k=20, m=5, dim 16): 12.8 s at
  * 10k queries → 126.4 s at 100k — 9.9x at 10x |Q|, linear, dominated
  * by the 38M-row pair-sim projection (~1.3 ms/query end to end).
  */
object Mmr {

  /** Diversify a `(query_id, neighbor_id, cosine, rank)` top-k frame
    * (the [[graft.similarity.Knn]] producer shape) down to `m` picks per
    * query. `corpus` supplies the candidate vectors for the pairwise
    * redundancy sims. Returns one row per pick:
    * `(query_id, step, neighbor_id, rel_ppm, penalty_ppm, score)` —
    * step 1..m in selection order.
    */
  def diversify(neighbors: DataFrame, corpus: DataFrame,
                idCol: String, vecCol: String,
                m: Int, lambdaPpm: Long): DataFrame = {
    require(m >= 1 && m <= 64, s"Mmr.diversify: m in [1, 64], got $m")
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L,
      s"Mmr.diversify: lambdaPpm in [0, 1e6], got $lambdaPpm")
    val vecs = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__v"))
    // ppm quantization via floor(x·1e6 + 0.5): floor of a double is
    // bit-deterministic in BOTH engines given the same input double —
    // a bare cast would TRUNCATE in Spark but round-to-nearest in
    // DuckDB, diverging whenever x·1e6 lands just under an integer
    val cand = neighbors
      .select(col("query_id"), col("neighbor_id"),
        floor(col("cosine") * lit(1000000.0) + lit(0.5)).cast("long").as("rel_ppm"))
      .join(vecs, Seq("neighbor_id"), "left")
      .localCheckpoint(true)
    // loud guard, not a silent inner-join drop: every candidate must
    // resolve to a corpus vector — a missing one means the neighbor
    // frame and corpus are out of sync, and dropping it would silently
    // shrink the pool AND the rel ranking. cand is |Q|·k rows and
    // already eagerly checkpointed, so the count is a cache readout.
    val nMissing = cand.filter(col("__v").isNull).count()
    require(nMissing == 0L,
      s"Mmr.diversify: $nMissing candidate neighbor_ids have no corpus vector")
    // pairwise candidate redundancy, |Q|·k² narrow rows, computed once —
    // lazily: at m = 1 no penalty is ever read and the eager checkpoint
    // would materialize it for nothing
    lazy val sims = {
      val a = cand.select(col("query_id"), col("neighbor_id").as("__ida"), col("__v").as("__va"))
      val b = cand.select(col("query_id"), col("neighbor_id").as("__idb"), col("__v").as("__vb"))
      a.join(b, Seq("query_id"))
        .filter(col("__ida") =!= col("__idb"))
        .select(col("query_id"), col("__ida"), col("__idb"),
          floor(VectorFunctions.cosine(col("__va"), col("__vb")) * lit(1000000.0) + lit(0.5))
            .cast("long").as("sim_ppm"))
        .localCheckpoint(true)
    }
    val lam = lit(lambdaPpm)
    val pickW = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    var selected = cand
      .select(col("query_id"), col("neighbor_id"), col("rel_ppm"),
        lit(null).cast("long").as("penalty_ppm"),
        (lam * col("rel_ppm")).as("score"))
      .withColumn("__rn", row_number().over(pickW))
      .filter(col("__rn") === 1)
      .select(col("query_id"), lit(1L).as("step"), col("neighbor_id"),
        col("rel_ppm"), col("penalty_ppm"), col("score"))
    for (step <- 2 to m) {
      val remaining = cand.select("query_id", "neighbor_id", "rel_ppm")
        .join(selected.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_anti")
      // sims whose right end is already selected, keyed by the left end
      val selSims = sims
        .join(selected.select(col("query_id"), col("neighbor_id").as("__idb")),
          Seq("query_id", "__idb"))
        .select(col("query_id"), col("__ida").as("neighbor_id"), col("sim_ppm"))
      val pick = remaining
        .join(selSims, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id"), col("neighbor_id"), col("rel_ppm"))
        .agg(max(col("sim_ppm")).as("penalty_ppm"))
        .select(col("query_id"), col("neighbor_id"), col("rel_ppm"),
          col("penalty_ppm"),
          (lam * col("rel_ppm") -
            (lit(1000000L) - lam) * col("penalty_ppm")).as("score"))
        .withColumn("__rn", row_number().over(pickW))
        .filter(col("__rn") === 1)
        .select(col("query_id"), lit(step.toLong).as("step"),
          col("neighbor_id"), col("rel_ppm"), col("penalty_ppm"), col("score"))
      // eager swap, the BpeVocab.checkpointSwap pattern: bound live
      // copies at 2 — m grows the selected frame by |Q| rows per step.
      // The step-1 selected (step == 2 here) is NOT checkpoint-backed:
      // its plan sits over cand's LogicalRDD, and release() collects
      // every LogicalRDD in the plan — releasing it would free CAND's
      // blocks mid-loop
      val next = selected.unionByName(pick).localCheckpoint(true)
      if (step > 2) graft.CheckpointBlocks.release(selected)
      selected = next
    }
    // final checkpoint BEFORE releasing the inputs: at m = 1 `selected`
    // is still a plan over cand, and a released localCheckpoint cannot
    // be recomputed — the caller would read freed blocks
    val out = selected.localCheckpoint(true)
    if (m >= 2) {
      graft.CheckpointBlocks.release(selected)
      graft.CheckpointBlocks.release(sims)
    }
    graft.CheckpointBlocks.release(cand)
    out
  }
}
