package graft.similarity

import graft.functions.VectorFunctions
import graft.functions.expr.TopCells
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding corpus with a coarse
  * quantizer, then prune near-duplicate pairs WITHIN each cluster cell —
  * keeping, per duplicate neighborhood, the member FARTHEST from its
  * centroid (the paper's keep-the-outlier rule: near-centroid copies are
  * the redundant ones; the outlier carries the information).
  *
  * This is the third member of the embedding-dedup family and fills the
  * gap between the other two: exact all-pairs (q34's baseline, O(n²))
  * and banded hyperplane LSH ([[graft.dedup.NearDedup.embeddingPairs]],
  * recall driven by bit budget). Centroid cells adapt to the corpus
  * DENSITY — a dense semantic region gets its own cell and an
  * intra-cell exact pass, where fixed LSH planes under-split dense
  * regions and over-split sparse ones.
  *
  * Scale shape: one corpus pass assigns cells (narrow projection against
  * broadcast centroids — the [[Knn]] quantizer), the centroid-similarity
  * lookup joins the (nCells)-row centroid frame BROADCAST, and the
  * pair pass is a self-join ON THE CELL KEY — candidate volume is
  * Σ m_cell², never n². Size `nCells` ~ n/1000 (cells of ~1000 vectors)
  * so a cell's pair block fits one task; a runaway-dense cell is a
  * skewed join key that AQE's skew-join splitting handles (the
  * [[graft.operators.Skew]] salting pattern applies if disabled).
  * Centroids come from [[Knn.strideCentroids]] (deterministic,
  * oracle-replayable) or [[Knn.trainCentroidsKMeans]] (better cells,
  * same search path) — both bounded driver state (nCells × dim).
  *
  * Probe-backed (Scratch, round 8, local[32], dim-16 vectors, cells
  * scaled with n at ~160 vectors/cell): 3.1 s at 20k vectors/128 cells
  * vs 2.6 s at 200k/1024 — FLAT at 10x because candidate volume is
  * Σ m_cell² ≈ n·(n/cells), held linear in n by scaling the cell count;
  * the all-pairs form would have grown 100x.
  *
  * Determinism: cosines are rounded to 6 decimals (house convention,
  * exact cross-engine per q34), the drop rule is a total order
  * (cent_sim asc, id asc), and the output carries every corpus row with
  * its keep decision — the gate form, like the other dedup operators.
  */
object SemDedup {

  private val cache = new graft.TrackedCache
  /** Unpersist frames persisted by [[semDedup]] (non-blocking); call
    * after the consuming action. */
  def releaseFrames(): Unit = cache.releaseAll()

  /** Dedup `corpus` against the given centroid cells at cosine threshold
    * `eps`. Returns `(id, cell, cent_sim, keep)` — one row per corpus
    * row; `keep = false` iff some same-cell neighbor with
    * `round(cos, 6) >= eps` precedes this row in the
    * (cent_sim asc, id asc) order, i.e. each eps-neighborhood keeps its
    * farthest-from-centroid member.
    */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
               centroids: Seq[Seq[Float]], eps: Double): DataFrame = {
    require(centroids.nonEmpty, "semDedup: no centroids")
    require(eps > 0.0 && eps <= 1.0, s"semDedup: eps in (0, 1], got $eps")
    // assigned + centroid-sim frame is referenced three times (both pair
    // sides + the output) — persist so the corpus is scanned and the
    // quantizer evaluated once
    val assigned = cache.reused(assign(corpus, idCol, vecCol, centroids))
    val a = assigned.select(col("cell"), col("id").as("id_a"),
      col("cent_sim").as("cs_a"), col("vec").as("va"))
    val b = assigned.select(col("cell"), col("id").as("id_b"),
      col("cent_sim").as("cs_b"), col("vec").as("vb"))
    val drops = a.join(b, "cell")
      .filter(col("id_a") =!= col("id_b"))
      .filter(round(VectorFunctions.cosine(col("va"), col("vb")), 6) >= eps)
      // b is dominated when a precedes it in the keep order
      .filter(col("cs_a") < col("cs_b") ||
        (col("cs_a") === col("cs_b") && col("id_a") < col("id_b")))
      .select(col("id_b").as("id")).distinct()
      .withColumn("__drop", lit(true))
    assigned.join(drops, Seq("id"), "left")
      .select(col("id"), col("cell").cast("long").as("cell"), col("cent_sim"),
        col("__drop").isNull.as("keep"))
  }

  /** [[semDedup]] with deterministic stride-sampled centroids
    * ([[Knn.strideCentroids]]) — the oracle-replayable form; swap in
    * [[Knn.trainCentroidsKMeans]] centroids for production cells. */
  def semDedupStride(corpus: DataFrame, idCol: String, vecCol: String,
                     nCells: Int, eps: Double): DataFrame =
    semDedup(corpus, idCol, vecCol,
      Knn.strideCentroids(corpus, idCol, vecCol, nCells), eps)

  /** The assigned `(id, cell, cent_sim, vec)` frame as persistable STATE
    * for incremental semantic dedup — valid only together with the
    * centroids that produced it (persist both; the EmbeddingState
    * planes contract). */
  def semDedupState(corpus: DataFrame, idCol: String, vecCol: String,
                    centroids: Seq[Seq[Float]]): DataFrame =
    assign(corpus, idCol, vecCol, centroids)

  /** Keep decisions for a NEW BATCH against a committed state — the
    * admission-gate form. Because the drop rule is LOCAL (a row's
    * decision depends only on its own eps-neighbors, never on whether
    * those neighbors themselves survive), the batch decisions equal
    * [[semDedup]] over state ∪ batch restricted to the batch EXACTLY
    * (SemDedupSpec pins it) — no state decision is ever revisited
    * (append-only admission; committed rows stay committed).
    *
    * Scale shape (the [[graft.dedup.NearDedup.embeddingPairsIncremental]]
    * contract): the batch assigns against the broadcast centroids and,
    * when under `broadcastMaxRows` (size-gated), broadcasts into the
    * state-side join — the state streams MAP-SIDE with no shuffle and
    * state-state pairs are never generated. A re-ingested id is an
    * upsert: its batch vector replaces the state copy before the
    * comparison (the same-id collision is not a pair).
    */
  def semDedupIncremental(state: DataFrame, newEmbs: DataFrame,
                          idCol: String, vecCol: String,
                          centroids: Seq[Seq[Float]], eps: Double,
                          broadcastNew: Boolean = true,
                          broadcastMaxRows: Long = 100000L): DataFrame = {
    require(eps > 0.0 && eps <= 1.0, s"semDedupIncremental: eps in (0, 1], got $eps")
    val batch = cache.reused(assign(newEmbs, idCol, vecCol, centroids))
    val doBroadcast = broadcastNew && batch.count() <= broadcastMaxRows
    val bSide = {
      val b = batch.select(col("cell"), col("id").as("id_b"),
        col("cent_sim").as("cs_b"), col("vec").as("vb"))
      if (doBroadcast) broadcast(b) else b
    }
    val batchIds = batch.select(col("id"))
    // upsert: a state row superseded by a same-id batch row is gone
    // before any pair forms (broadcast anti join — state never shuffles)
    val liveState = state.join(
      if (doBroadcast) broadcast(batchIds) else batchIds, Seq("id"), "left_anti")
    def dominatedBy(aSide: DataFrame): DataFrame =
      aSide.select(col("cell"), col("id").as("id_a"),
          col("cent_sim").as("cs_a"), col("vec").as("va"))
        .join(bSide, "cell")
        .filter(col("id_a") =!= col("id_b"))
        .filter(round(VectorFunctions.cosine(col("va"), col("vb")), 6) >= eps)
        .filter(col("cs_a") < col("cs_b") ||
          (col("cs_a") === col("cs_b") && col("id_a") < col("id_b")))
        .select(col("id_b").as("id"))
    val drops = dominatedBy(liveState).unionByName(dominatedBy(batch))
      .distinct().withColumn("__drop", lit(true))
    batch.join(drops, Seq("id"), "left")
      .select(col("id"), col("cell").cast("long").as("cell"), col("cent_sim"),
        col("__drop").isNull.as("keep"))
  }

  private def assign(corpus: DataFrame, idCol: String, vecCol: String,
                     centroids: Seq[Seq[Float]]): DataFrame = {
    require(centroids.nonEmpty, "SemDedup.assign: no centroids")
    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = centroids.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cell", "cvec")
    corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("cell", element_at(TopCells.top_cells(col("vec"), centroids, 1), 1))
      .join(broadcast(centDf), "cell")
      .select(col("id"), col("cell"),
        round(VectorFunctions.cosine(col("vec"), col("cvec")), 6).as("cent_sim"),
        col("vec"))
  }
}
