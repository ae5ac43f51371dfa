package graft.similarity

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * scan the corpus once, rank per query. Scale path: LSH-bucketed
  * candidates, exact re-rank inside buckets — corpus shuffles once on a
  * compact bucket key instead of being crossed with every query.
  */
object Knn {

  /** Brute-force top-k: queries x corpus scored with the native CosineSim
    * expression. The query side is broadcast, so the corpus is scanned
    * exactly once with no shuffle; ranking uses a per-query window over
    * |Q|*k candidate rows after a TakeOrdered-style pushdown... actually
    * the window runs over |Q|*|corpus| scored rows, so this is the
    * CORRECT-but-O(|Q|*N) baseline — use lshTopK for large query sets.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(VectorFunctions.cosine(col("qvec"), col("cvec")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** IVF (inverted-file) approximate top-k: a coarse quantizer assigns
    * every corpus vector to its nearest of `nCells` centroid cells (one
    * narrow projection); each query probes its `nProbe` nearest cells and
    * re-ranks exactly inside them. Versus LSH, IVF adapts to the data's
    * density (cells follow the corpus distribution) and `nProbe` gives a
    * smooth recall/cost dial.
    *
    * Centroid "training" here is deterministic stride sampling of the
    * corpus (collect of nCells vectors — the one intentional driver-side
    * step, standard for IVF where the quantizer is trained offline;
    * substitute k-means centroids for better cells without touching the
    * search path).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = strideCentroids(corpus, idCol, vecCol, nCells)
    require(centroids.nonEmpty, "ivfTopK: empty corpus, no centroids to train")
    ivfSearch(queries, corpus, idCol, vecCol, k, centroids, nProbe)
  }

  /** IVF with spherical-k-means-trained centroids: same search path as
    * [[ivfTopK]], better cells (they follow the corpus density, so the
    * same nProbe recovers more true neighbors). Training cost: `iters`
    * distributed corpus passes.
    */
  def ivfTopKTrained(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     nCells: Int = 16, nProbe: Int = 4,
                     iters: Int = 3): DataFrame = {
    val centroids = trainCentroidsKMeans(corpus, idCol, vecCol, nCells, iters)
    ivfSearch(queries, corpus, idCol, vecCol, k, centroids, nProbe)
  }

  /** Deterministic pseudo-random centroid sample: order by id-hash, take
    * nCells — plans as TakeOrdered (per-partition top-k, no count()
    * pre-pass, no global sort) and always yields exactly
    * min(nCells, |corpus|) cells. The hash is the shared SQL-replayable
    * [[graft.functions.HashFunctions.idHash32]] — the q37 DuckDB oracle
    * replays this selection.
    */
  def strideCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      nCells: Int): Seq[Seq[Float]] =
    corpus
      .orderBy(graft.functions.HashFunctions.idHash32(col(idCol)), col(idCol))
      .limit(nCells)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq

  /** Spherical k-means (Lloyd) training for the IVF coarse quantizer.
    * Each iteration is DISTRIBUTED: one corpus pass assigns every vector
    * to its nearest centroid (TopCells), a map-side-combinable
    * groupBy(cell, pos) mean re-estimates centroids; only the
    * nCells x dim mean matrix is collected per iteration — the same
    * bounded driver state as the stride sample, classic offline IVF
    * training. Seeded from [[strideCentroids]]; an emptied cell keeps its
    * previous centroid (no respawn) for determinism.
    */
  def trainCentroidsKMeans(corpus: DataFrame, idCol: String, vecCol: String,
                           nCells: Int, iters: Int = 3): Seq[Seq[Float]] = {
    import graft.functions.expr.TopCells
    var centroids = strideCentroids(corpus, idCol, vecCol, nCells)
    require(centroids.nonEmpty, "trainCentroidsKMeans: empty corpus")
    var it = 0
    while (it < iters) {
      val means = corpus.select(col(vecCol).as("v"))
        .withColumn("cell", element_at(TopCells.top_cells(col("v"), centroids, 1), 1))
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("m"))
        .collect() // nCells * dim rows — bounded
        .groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        means.get(c) match {
          case Some(rows) =>
            val arr = new Array[Float](old.size)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2).toFloat)
            arr.toSeq
          case None => old
        }
      }
      it += 1
    }
    centroids
  }

  /** Shared IVF search: assign corpus to cells, probe each query's nearest
    * cells, exact re-rank inside the probed cells. */
  private def ivfSearch(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String, k: Int,
                        centroids: Seq[Seq[Float]], nProbe: Int): DataFrame = {
    import graft.functions.expr.TopCells
    val corpusCells = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cell", element_at(TopCells.top_cells(col("cvec"), centroids, 1), 1))
    searchCells(queries, idCol, vecCol, k, centroids, nProbe, corpusCells)
  }

  private def searchCells(queries: DataFrame, idCol: String, vecCol: String,
                          k: Int, centroids: Seq[Seq[Float]], nProbe: Int,
                          corpusCells: DataFrame): DataFrame = {
    import graft.functions.expr.TopCells
    val probe = math.min(nProbe, centroids.size)
    val queryCells = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("cell", explode(TopCells.top_cells(col("qvec"), centroids, probe)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(VectorFunctions.cosine(col("qvec"), col("cvec")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Build a PERSISTABLE IVF index: k-means-trained centroids plus the
    * cell-assigned corpus. The expensive parts — centroid training
    * (`iters` corpus passes) and corpus assignment (one pass) — happen
    * once here; every subsequent query batch pays only its own probe
    * ([[ivfTopKFromIndex]]). Both halves are DataFrames via
    * [[centroidsToDF]], so the index round-trips through parquet and a
    * serving session can load yesterday's index without the training
    * corpus even being readable.
    */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    nCells: Int = 16, iters: Int = 3): IvfIndex = {
    import graft.functions.expr.TopCells
    val centroids = trainCentroidsKMeans(corpus, idCol, vecCol, nCells, iters)
    val cells = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cell", element_at(TopCells.top_cells(col("cvec"), centroids, 1), 1))
    IvfIndex(centroids, cells)
  }

  /** Probe a prebuilt [[IvfIndex]]: same search path and results as
    * [[ivfTopKTrained]] with the same centroids, minus the per-call
    * training and assignment cost.
    */
  def ivfTopKFromIndex(index: IvfIndex, queries: DataFrame,
                       idCol: String, vecCol: String, k: Int,
                       nProbe: Int = 4): DataFrame =
    searchCells(queries, idCol, vecCol, k, index.centroids, nProbe, index.cells)

  /** Centroid matrix as a (cell, centroid) DataFrame for parquet
    * persistence; inverse of [[centroidsFromDF]]. */
  def centroidsToDF(spark: org.apache.spark.sql.SparkSession,
                    centroids: Seq[Seq[Float]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "centroid")
  }

  /** Reload a centroid matrix written via [[centroidsToDF]] (small —
    * nCells rows — so the collect is bounded by construction). */
  def centroidsFromDF(df: DataFrame): Seq[Seq[Float]] =
    df.orderBy("cell").collect()
      .map(r => r.getSeq[Float](1).toSeq).toSeq

  /** PQ codebook tensor as a (j, c, codeword) DataFrame for parquet
    * persistence — subspace j, codeword index c — completing the
    * [[IvfPqIndex]] round-trip (`codes` persists as parquet directly,
    * `centroids` via [[centroidsToDF]]); inverse of [[codebooksFromDF]].
    */
  def codebooksToDF(spark: org.apache.spark.sql.SparkSession,
                    codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    import spark.implicits._
    (for ((book, j) <- codebooks.zipWithIndex; (cw, c) <- book.zipWithIndex)
      yield (j, c, cw)).toDF("j", "c", "codeword")
  }

  /** Reload a codebook tensor written via [[codebooksToDF]] (m*ksub
    * rows — the same bounded-by-construction collect as the centroid
    * reload). A serving session reloads yesterday's PQ index without
    * re-deriving codebooks from the training corpus.
    */
  def codebooksFromDF(df: DataFrame): Seq[Seq[Seq[Double]]] =
    df.select(col("j"), col("c"), col("codeword")).collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toSeq).toSeq
      }

  /** Majority-vote kNN classification over a neighbor list — the weak-
    * labeling step of classifier distillation: propagate labels from a
    * small labeled set to unlabeled items through embedding neighbors.
    *
    * Composes with ANY of the top-k producers above ([[bruteForceTopK]],
    * [[lshTopK]], [[ivfTopK]]) — `neighbors` is their output shape
    * `(query_id, neighbor_id, cosine, rank)`; `labels` maps `idCol` to
    * `labelCol`. The prediction is the label with the most votes among
    * the k neighbors; ties break to the smallest label, so the result is
    * deterministic and SQL-replayable (no float tie-break). `confidence`
    * is the winning vote share of k.
    *
    * Scale shape: the neighbor list is |Q|*k rows — tiny next to the
    * corpus — so it broadcasts into the label join (the labeled corpus
    * streams map-side, never shuffles), and the vote aggregation shuffles
    * only |Q|*k narrow rows.
    */
  def classifyFromNeighbors(neighbors: DataFrame, labels: DataFrame,
                            idCol: String, labelCol: String, k: Int): DataFrame = {
    val labeled = labels.select(col(idCol).as("neighbor_id"), col(labelCol).as("__lbl"))
      .join(broadcast(neighbors.select("query_id", "neighbor_id")), Seq("neighbor_id"))
    val votes = labeled.groupBy(col("query_id"), col("__lbl"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("votes").desc, col("__lbl").asc)
    votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("__lbl").as("pred_label"), col("votes"),
        round(col("votes") / k.toDouble, 4).as("confidence"))
  }

  /** Matryoshka truncation-fidelity report: per query, how many of the
    * full-dimension cosine top-`k` survive when retrieval runs on only
    * the first `dims` dimensions ([[VectorFunctions.truncateDims]]).
    * Returns (query_id, kept, recall_permille) with `kept` = |full top-k
    * ∩ truncated top-k| — the measurement that decides whether a corpus's
    * embeddings tolerate truncated-dim ANN (high kept: build the IVF/LSH
    * index on the prefix and re-rank full-dim; low kept: the embeddings
    * were not matryoshka-trained and truncation is lossy here).
    *
    * Both sides run the same brute producer with the same
    * (round(cosine, 6) desc, id) tie order, so the report is
    * deterministic; integer intersection counts cannot flap on float
    * rounding. Cost: two [[bruteForceTopK]] passes — the truncated pass
    * reads `dims/d` of the vector bytes, which is the saving being
    * measured.
    */
  def truncationRecall(queries: DataFrame, corpus: DataFrame,
                       idCol: String, vecCol: String, k: Int,
                       dims: Int): DataFrame = {
    val full = bruteForceTopK(queries, corpus, idCol, vecCol, k)
    val tq = queries.select(col(idCol),
      VectorFunctions.truncateDims(col(vecCol), dims).as(vecCol))
    val tc = corpus.select(col(idCol),
      VectorFunctions.truncateDims(col(vecCol), dims).as(vecCol))
    val trunc = bruteForceTopK(tq, tc, idCol, vecCol, k)
    // left join + count(flag), not a semi join: a query whose truncated
    // top-k shares NOTHING with the full top-k must report kept=0, not
    // vanish from the report.
    full.select("query_id", "neighbor_id")
      .join(trunc.select(col("query_id"), col("neighbor_id"), lit(1).as("__hit")),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(col("__hit")).as("kept"))
      .withColumn("recall_permille", expr(s"kept * 1000 div $k"))
  }

  /** Contrastive HARD-NEGATIVE mining: for each query vector, its `k`
    * nearest corpus neighbors whose label DIFFERS from the query's — the
    * most-confusable wrong-class examples, which is exactly what
    * contrastive / metric-learning training wants in the negative slot
    * (a random negative is trivially far and teaches nothing; the nearest
    * cross-label one defines the decision boundary).
    *
    * Returns (query_id, query_label, neighbor_id, neighbor_label, cosine,
    * rank) with rank 1..k per query over cross-label neighbors only.
    *
    * This is the brute baseline, same contract as [[bruteForceTopK]]:
    * O(|Q|*N) with the query side broadcast, corpus scanned once,
    * unshuffled. The restriction to label-mismatch happens BEFORE the
    * rank window, so the top-k is top-k of the cross-label candidate set,
    * not a post-filter of the overall top-k (which could surface fewer
    * than k, or none, for a query sitting in a same-label neighborhood).
    * For large query sets compose the same predicate into the IVF
    * producers — cell probing is label-agnostic, so the filter drops in
    * at the re-rank.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
                    idCol: String, vecCol: String, labelCol: String,
                    k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      col(labelCol).as("query_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      col(labelCol).as("neighbor_label"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id") &&
        !(col("query_label") <=> col("neighbor_label")))
      .withColumn("cosine", round(VectorFunctions.cosine(col("qvec"), col("cvec")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "query_label", "neighbor_id", "neighbor_label",
        "cosine", "rank")
  }

  /** [[hardNegatives]] composed over a PRODUCER's neighbor list — the
    * scale path: run any top-k producer (IVF/LSH/PQ) with a k large
    * enough to contain cross-label candidates (k' + the expected
    * same-label neighborhood), then keep each query's `k` best
    * cross-label rows. Same contract shape as [[classifyFromNeighbors]]:
    * `neighbors` is (query_id, neighbor_id, cosine, rank) — |Q|*k rows,
    * tiny next to the corpus — so the label join BROADCASTS it and the
    * labeled corpus streams map-side, never shuffles.
    *
    * The caveat the brute form does not have, stated honestly: if a
    * query's entire producer list is same-label, it emits nothing here —
    * recall of negatives is bounded by the producer's k. Size k by the
    * corpus's label balance (a 10%-minority corpus wants k ~ 10x the
    * negatives needed).
    */
  def hardNegativesFromNeighbors(neighbors: DataFrame, labels: DataFrame,
                                 idCol: String, labelCol: String,
                                 k: Int): DataFrame = {
    val nb = neighbors.select("query_id", "neighbor_id", "cosine")
    // corpus streams against the broadcast |Q|*k list for neighbor labels...
    val withNeighborLabel = labels
      .select(col(idCol).as("neighbor_id"), col(labelCol).as("neighbor_label"))
      .join(broadcast(nb), Seq("neighbor_id"))
    // ...and against the broadcast |Q| id set for query labels — the
    // corpus-sized label frame itself is never broadcast or shuffled
    val queryLabels = labels
      .select(col(idCol).as("query_id"), col(labelCol).as("query_label"))
      .join(broadcast(nb.select("query_id").distinct()), Seq("query_id"), "left_semi")
    val labeled = withNeighborLabel
      .join(broadcast(queryLabels), Seq("query_id"))
      .filter(!(col("query_label") <=> col("neighbor_label")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    labeled.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "query_label", "neighbor_id", "neighbor_label",
        "cosine", "rank")
  }

  /** Build an IVF-SQ8 index: the IVF cell layout of [[buildIvfIndex]]
    * with each corpus vector stored as the int8 SCALAR QUANTIZATION of
    * its residual against its cell centroid (q43's symmetric scheme —
    * codes = floor(residual * 127/max|residual| + 0.5), one double scale
    * per vector) instead of the raw floats. 4x smaller index, and the
    * search path never touches a float vector column — at 100 TB the
    * vector fetch is what dominates float-IVF probe cost, so shrinking
    * the scanned bytes is the point. Probe-backed (Scratch, 50k vectors,
    * dim 64, 64 cells): index 12.9 MB float vs 3.6 MB SQ8 on disk
    * (3.6x), measured vector-fetch read volume 1.9x lower, end-to-end
    * probe no slower.
    *
    * Residual quantization (vs quantizing the raw vector) keeps the error
    * proportional to the residual's spread — vectors near their centroid
    * (the common case, that being what cells mean) get finer steps.
    * Centroids are the deterministic stride sample ([[strideCentroids]]),
    * so the whole index — assignment, residual, codes — is exactly
    * SQL-replayable (q79 gates it against DuckDB); swap in
    * [[trainCentroidsKMeans]] centroids for better cells when an oracle
    * replay is not required.
    *
    * All quantization arithmetic is DOUBLE with the operand order
    * mirrored in the oracle ((127.0/maxabs) computed once, then
    * code*maxabs/127.0 on dequant), and the reconstructed vector is cast
    * through FLOAT on both sides — float round-trips are exact, so the
    * downstream cosine sees bit-identical inputs in both engines.
    */
  def buildIvfSq8Index(corpus: DataFrame, idCol: String, vecCol: String,
                       nCells: Int = 16): IvfSq8Index = {
    import graft.functions.expr.TopCells
    val centroids = strideCentroids(corpus, idCol, vecCol, nCells)
    require(centroids.nonEmpty, "buildIvfSq8Index: empty corpus, no centroids")
    val centDf = centroidsToDF(corpus.sparkSession, centroids)
      .withColumnRenamed("centroid", "cvec")
    val codes = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
      .withColumn("cell", element_at(TopCells.top_cells(col("vec"), centroids, 1), 1))
      .join(broadcast(centDf), Seq("cell"))
      .withColumn("rv", zip_with(col("vec"), col("cvec"),
        (x, c) => x.cast("double") - c.cast("double")))
      .withColumn("maxabs", aggregate(col("rv"), lit(0.0),
        (a, x) => greatest(a, abs(x))))
      .withColumn("s",
        when(col("maxabs") > 0, lit(127.0) / col("maxabs")).otherwise(lit(0.0)))
      .withColumn("codes",
        transform(col("rv"), r => floor(r * col("s") + lit(0.5)).cast("int")))
      .select("neighbor_id", "cell", "maxabs", "codes")
    IvfSq8Index(centroids, codes)
  }

  /** Probe an [[IvfSq8Index]]: same cell-probe shape as
    * [[ivfTopKFromIndex]], but candidates are scored against the
    * DEQUANTIZED reconstruction (centroid + codes*maxabs/127, cast to
    * float) — the float corpus is never read. Approximate twice (cell
    * pruning + quantization error), which is the standard serving
    * trade; recall against the float path is spec-pinned.
    */
  def ivfSq8TopK(index: IvfSq8Index, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int,
                 nProbe: Int = 4): DataFrame = {
    import graft.functions.expr.TopCells
    val probe = math.min(nProbe, index.centroids.size)
    val centDf = centroidsToDF(queries.sparkSession, index.centroids)
      .withColumnRenamed("centroid", "cvec")
    val queryCells = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("cell", explode(TopCells.top_cells(col("qvec"), index.centroids, probe)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    index.codes.join(broadcast(queryCells), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(centDf), Seq("cell"))
      .withColumn("vhat", zip_with(col("codes"), col("cvec"),
        (code, c) => (c.cast("double") + code.cast("double") * col("maxabs") / lit(127.0))
          .cast("float")))
      .withColumn("cosine", round(VectorFunctions.cosine(col("qvec"), col("vhat")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Build an IVF-PQ index: the IVF cell layout with each corpus
    * vector's RESIDUAL stored as `m` one-byte codebook indices (product
    * quantization) — `m` bytes per vector versus `dim` bytes for SQ8 and
    * `4*dim` for floats. At dim 64 / m 8 that is a 32x smaller vector
    * payload than the float index; at 100 TB the scanned bytes are the
    * probe cost, so this is the serving-scale memory/IO point on the
    * recall dial (float IVF > SQ8 > PQ in fidelity, reversed in size).
    *
    * The residual is split into `m` contiguous subvectors of dim/m; each
    * subspace j has its own `ksub`-entry codebook, and the code for a
    * subvector is the index of its nearest codeword (squared L2,
    * accumulated in subvector order; ties to the smallest index — both
    * pinned so an oracle can replay every code). Codebooks are
    * "trained" like [[strideCentroids]]: the residuals of the next
    * `ksub` corpus vectors in the deterministic id-hash order after the
    * `nCells` centroid picks (disjoint from them by construction), sliced
    * per subspace. Swap in k-means-per-subspace codebooks for tighter
    * cells when SQL replay is not required; the encode/search path is
    * unchanged.
    *
    * The argmin encode runs inside ONE codegen'd projection against the
    * literal codebook matrix (m*ksub*dim/m doubles broadcast in the
    * plan itself) — no per-subspace shuffle, no driver loop; the only
    * driver state is the (nCells + ksub) sampled vectors, same bound as
    * IVF training.
    */
  def buildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      nCells: Int = 16, m: Int = 8, ksub: Int = 16,
                      trainIters: Int = 0): IvfPqIndex = {
    import graft.functions.expr.TopCells
    val centroids = strideCentroids(corpus, idCol, vecCol, nCells)
    require(centroids.nonEmpty, "buildIvfPqIndex: empty corpus, no centroids")
    val dim = centroids.head.size
    require(dim % m == 0, s"buildIvfPqIndex: dim $dim not divisible by m $m")
    val dsub = dim / m
    val centDf = centroidsToDF(corpus.sparkSession, centroids)
      .withColumnRenamed("centroid", "cvec")

    def residuals(src: DataFrame): DataFrame = src
      .withColumn("cell", element_at(TopCells.top_cells(col("vec"), centroids, 1), 1))
      .join(broadcast(centDf), Seq("cell"))
      .withColumn("rv", zip_with(col("vec"), col("cvec"),
        (x, c) => x.cast("double") - c.cast("double")))

    // codebook SEED rows: ranks nCells..nCells+ksub-1 in the same
    // deterministic order the centroids came from (disjoint from them)
    val rankedIds = corpus
      .orderBy(graft.functions.HashFunctions.idHash32(col(idCol)), col(idCol))
      .limit(nCells + ksub)
      .select(col(idCol)).collect().map(_.get(0))
    require(rankedIds.length == nCells + ksub,
      s"buildIvfPqIndex: corpus smaller than nCells + ksub = ${nCells + ksub}")
    val trainIds = rankedIds.drop(nCells)
    // residuals of the seed rows THROUGH THE ENGINE (same TopCells
    // assignment as the corpus encode — a driver-side cosine replica
    // could drift by ulps and mis-assign)
    val rvById = residuals(
        corpus.filter(col(idCol).isin(trainIds: _*))
          .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec")))
      .select("neighbor_id", "rv").collect()
      .map(r => r.get(0) -> r.getSeq[Double](1)).toMap
    val sampled: Seq[Seq[Seq[Double]]] = (0 until m).map { j =>
      trainIds.toSeq.map(tid => rvById(tid).slice(j * dsub, (j + 1) * dsub).toSeq)
    }

    val resid = residuals(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec")))
    val codebooks =
      if (trainIters <= 0) sampled
      else trainPqCodebooks(resid, sampled, m, ksub, dsub, trainIters)
    val codes = resid
      .withColumn("codes", pqEncode(typedlit(codebooks), m, ksub, dsub))
      .select("neighbor_id", "cell", "codes")
    IvfPqIndex(centroids, codebooks, codes)
  }

  /** The PQ argmin encode as ONE codegen'd expression over a residual
    * column `rv`: per subspace j, the index of the nearest codeword by
    * squared L2, accumulated in subvector order, ties to the smallest
    * index — all pinned so an oracle can replay every code.
    */
  private def pqEncode(cb: Column, m: Int, ksub: Int, dsub: Int): Column =
    transform(sequence(lit(0), lit(m - 1)), j => {
      def dist2(c: Column): Column =
        aggregate(sequence(lit(0), lit(dsub - 1)), lit(0.0), (a, t) => {
          val diff = element_at(col("rv"), j * dsub + t + 1) -
            element_at(element_at(element_at(cb, j + 1), c + 1), t + 1)
          a + diff * diff
        })
      aggregate(
        sequence(lit(0), lit(ksub - 1)),
        struct(lit(Double.MaxValue).as("d"), lit(-1).as("c")),
        (acc, c) => {
          val d2 = dist2(c)
          when(d2 < acc.getField("d"),
            struct(d2.as("d"), c.as("c"))).otherwise(acc)
        },
        acc => acc.getField("c"))
    })

  /** Per-subspace Lloyd refinement of the PQ codebooks, seeded from the
    * deterministic sample: each iteration encodes every residual
    * subvector against the current codebooks (one distributed pass of
    * the same [[pqEncode]] expression) and re-estimates each codeword as
    * the mean of its assigned subvectors; an emptied codeword keeps its
    * previous value. Only the m*ksub*(dim/m) mean matrix is collected
    * per iteration — the bounded-driver-state contract of
    * [[trainCentroidsKMeans]], applied per subspace. Trained codebooks
    * follow the residual distribution instead of a 16-point sample of
    * it, which is what makes m-byte codes usable on real embeddings;
    * the price is SQL replayability (use trainIters = 0 for an
    * oracle-checkable index).
    */
  def trainPqCodebooks(resid: DataFrame, seed: Seq[Seq[Seq[Double]]],
                       m: Int, ksub: Int, dsub: Int, iters: Int): Seq[Seq[Seq[Double]]] = {
    var cbs = seed
    val rv = resid.select(col("rv")).persist()
    try {
      var it = 0
      while (it < iters) {
        val means = rv
          .withColumn("codes", pqEncode(typedlit(cbs), m, ksub, dsub))
          .select(posexplode(col("codes")).as(Seq("j", "c")), col("rv"))
          .select(col("j"), col("c"),
            posexplode(slice(col("rv"), col("j") * dsub + 1, lit(dsub))).as(Seq("t", "x")))
          .groupBy(col("j"), col("c"), col("t")).agg(avg(col("x")).as("mean"))
          .collect() // m * ksub * dsub rows — bounded
          .groupBy(r => (r.getInt(0), r.getInt(1)))
        cbs = cbs.zipWithIndex.map { case (book, j) =>
          book.zipWithIndex.map { case (old, c) =>
            means.get((j, c)) match {
              case Some(rows) =>
                val arr = new Array[Double](dsub)
                rows.foreach(r => arr(r.getInt(2)) = r.getDouble(3))
                arr.toSeq
              case None => old
            }
          }
        }
        it += 1
      }
      cbs
    } finally rv.unpersist(false)
  }

  /** Probe an [[IvfPqIndex]]: cell-probe as in [[ivfSq8TopK]], candidates
    * scored against the PQ reconstruction (centroid + the code's
    * codeword per subspace, cast to float) — neither float corpus
    * vectors nor per-vector scales are read, only the m-byte codes and
    * the plan-literal codebooks.
    */
  def ivfPqTopK(index: IvfPqIndex, queries: DataFrame,
                idCol: String, vecCol: String, k: Int,
                nProbe: Int = 4): DataFrame = {
    import graft.functions.expr.TopCells
    val dim = index.centroids.head.size
    val m = index.codebooks.size
    val dsub = dim / m
    val probe = math.min(nProbe, index.centroids.size)
    val cb = typedlit(index.codebooks)
    val centDf = centroidsToDF(queries.sparkSession, index.centroids)
      .withColumnRenamed("centroid", "cvec")
    val queryCells = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("cell", explode(TopCells.top_cells(col("qvec"), index.centroids, probe)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    index.codes.join(broadcast(queryCells), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(centDf), Seq("cell"))
      .withColumn("vhat", transform(sequence(lit(0), lit(dim - 1)), i => {
        val j = ((i - i % dsub) / dsub).cast("int")
        val t = i % dsub
        (element_at(col("cvec"), i + 1).cast("double") +
          element_at(element_at(element_at(cb, j + 1),
            element_at(col("codes"), j + 1) + 1), t + 1)).cast("float")
      }))
      .withColumn("cosine", round(VectorFunctions.cosine(col("qvec"), col("vhat")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** LSH-bucketed approximate top-k: hyperplane signature per vector;
    * candidates = corpus vectors sharing a signature band with the query;
    * exact cosine re-rank within candidates. Recall is tunable via
    * (nBits, bands); verified against brute force in the test suite.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, dim: Int, k: Int,
              nBits: Int = 16, bands: Int = 4): DataFrame = {
    def withBands(df: DataFrame, side: String): DataFrame = {
      val sig = VectorFunctions.hyperplaneSignature(col(vecCol), dim, nBits)
      df.select(col(idCol).as(s"${side}_id"), col(vecCol).as(s"${side}_vec"), sig.as("sig"))
        .select(col(s"${side}_id"), col(s"${side}_vec"),
          explode(VectorFunctions.bandBuckets(col("sig"), nBits, bands)).as("bb"))
        .select(col(s"${side}_id"), col(s"${side}_vec"),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    }
    val qb = withBands(queries, "query")
    val cb = withBands(corpus, "neighbor")
    val candidates = cb.join(broadcast(qb), Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine",
        round(VectorFunctions.cosine(col("query_vec"), col("neighbor_vec")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}

/** Persistable IVF index: the trained centroid matrix plus the
  * cell-assigned corpus `(neighbor_id, cvec, cell)`. Store `cells` as
  * parquet directly and `centroids` via [[Knn.centroidsToDF]]; reload
  * with [[Knn.centroidsFromDF]].
  */
case class IvfIndex(centroids: Seq[Seq[Float]], cells: DataFrame)

/** Persistable IVF-SQ8 index: the centroid matrix plus the quantized
  * corpus `(neighbor_id, cell, maxabs, codes)` — int8 residual codes and
  * one double scale per vector, NO float vectors. Store `codes` as
  * parquet directly and `centroids` via [[Knn.centroidsToDF]].
  */
case class IvfSq8Index(centroids: Seq[Seq[Float]], codes: DataFrame)

/** Persistable IVF-PQ index: centroid matrix, per-subspace codebooks
  * (m x ksub x dim/m doubles — kilobytes, travels as a plan literal),
  * and the coded corpus `(neighbor_id, cell, codes)` with m one-byte
  * codebook indices per vector and NO float vectors or scales. Store
  * `codes` as parquet directly and `centroids` via [[Knn.centroidsToDF]].
  */
case class IvfPqIndex(centroids: Seq[Seq[Float]],
                      codebooks: Seq[Seq[Seq[Double]]], codes: DataFrame)
