package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn a near-dup PAIR list into per-doc
  * cluster labels so a dedup pipeline can keep one survivor per cluster
  * (the pair list alone can't decide — near-dup relations are not
  * transitive-safe row by row: a<->b and b<->c must collapse to ONE
  * cluster even when a<->c was never emitted).
  *
  * Algorithm: iterative min-label propagation to a fixpoint — every node
  * repeatedly takes the min label among itself and its neighbors.
  * Converges in O(component diameter) rounds; dedup components are
  * near-cliques (every member pairs with most others), so the diameter
  * is tiny and the loop is a handful of rounds even at corpus scale.
  * Each round is one self-join + one map-side-combinable min aggregation
  * on the edge list — no adjacency materialization beyond the pairs the
  * caller already has. The driver only sees a one-row convergence count
  * per round (the classic large-star/small-star optimization matters for
  * high-diameter graphs like web links, not for dedup cliques).
  *
  * 10x probe (Scratch, 50k docs / 250,600 minhash pair edges — every doc
  * in a 10-replica clique): label propagation + count in 6.1 s, the
  * cluster-aware split in 4.5 s on top of the same pair set, vs ~1.9 s /
  * ~2.2 s at 1x — cost tracks edges x rounds (the edge set grew ~1,000x
  * while time grew ~3x; rounds stayed at the clique diameter), never the
  * quadratic doc space.
  */
object Clusters {

  /** Per-node minimum-id cluster label from an undirected pair list.
    * Returns (id, cluster_id) for every id present in `pairs`;
    * cluster_id = the smallest id in the node's connected component
    * (the conventional dedup survivor).
    *
    * Two physical paths, same labels:
    *  - `edges <= driverMaxEdges` AND long ids: DRIVER UNION-FIND over
    *    the collected distinct edge list (path compression, union by
    *    min root — the min-id label falls out of the union rule). A
    *    banded near-dup graph is tiny relative to its corpus (pairs ≪
    *    docs — sf1 probe: 50k docs → 2,560 edges), and the distributed
    *    loop's ~rounds×3 jobs were pure scheduling overhead at that
    *    size: q190's components stage benched 5-50 s at sf1 from
    *    scheduler variance alone; the driver path makes it milliseconds.
    *    The labels re-enter the plan via `parallelize`, NOT a
    *    LocalRelation (a million-row plan literal would re-serialize
    *    into every task).
    *  - beyond the gate (or non-long ids): the iterative min-label
    *    propagation loop below — the corpus-scale path, O(diameter)
    *    rounds of one edge join + one min aggregation.
    * NearDedupSpec pins the two paths label-equal on a multi-component
    * random graph.
    */
  def connectedComponents(pairs: DataFrame, idACol: String, idBCol: String,
                          maxIters: Int = 50,
                          driverMaxEdges: Long = 500000L): DataFrame = {
    val und = pairs.select(least(col(idACol), col(idBCol)).as("u"),
        greatest(col(idACol), col(idBCol)).as("v"))
      .distinct()
      .persist()
    val nEdges = und.count()
    val idsAreLong = und.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (nEdges <= driverMaxEdges && idsAreLong) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      und.collect().foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      und.unpersist(blocking = false)
      val spark = pairs.sparkSession
      import spark.implicits._
      // snapshot the keys BEFORE mapping: find() path-compresses into the
      // same mutable map, and iterating a HashMap under mutation (even
      // value-only writes) is unspecified
      val ids = parent.keys.toArray
      val labels = ids.map(id => (id, find(id))).toSeq
      return spark.sparkContext.parallelize(labels)
        .toDF("id", "cluster_id")
    }
    val edges = und.select(col("u"), col("v"))
      .unionByName(und.select(col("v").as("u"), col("u").as("v")))
      .persist()
    // the eager checkpoint below materializes `edges` into its cache
    // (und can only release after that — edges reads it once)
    var labels = edges.groupBy(col("u").as("id"))
      .agg(least(min(col("v")), first(col("u"))).as("cluster"))
      .localCheckpoint(true)
    und.unpersist(blocking = false)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // neighbor's current label, min-combined with own label; the
      // changed flag rides along so convergence needs no extra join
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "v"), "v")
        .groupBy(col("u").as("id"))
        .agg(min(col("cluster")).as("ncluster"))
      // eager localCheckpoint, NOT persist: persist caches the DATA but
      // the LOGICAL plan still nests `labels` twice per round, so plan
      // analysis work grows 2^rounds — a 30-hop chain OOMed generating
      // a plan tree string before any job ran (the BPE r9 lineage
      // lesson, surfaced by the path-equality spec). Checkpointing
      // flattens each round to a LogicalRDD; the eager-swap release
      // keeps live copies bounded at 2. The flag column is inert in the
      // next round's join and dropped by the final projection.
      val next = labels.join(viaNeighbors, "id")
        .select(col("id"), least(col("cluster"), col("ncluster")).as("cluster"),
          (col("ncluster") < col("cluster")).as("__changed"))
        .localCheckpoint(true)
      val changed = next.filter(col("__changed")).count()
      graft.CheckpointBlocks.release(labels)
      labels = next
      converged = changed == 0
      iter += 1
    }
    require(converged, s"connectedComponents: no fixpoint after $maxIters rounds " +
      "(component diameter exceeds the bound — raise maxIters)")
    // hand back a frame with truncated lineage and no per-call leaks.
    // Caveat: localCheckpoint trades executor-loss recoverability for
    // lineage truncation — acceptable for a result the caller consumes
    // promptly; re-run the operator on loss.
    val result = labels.select(col("id"), col("cluster").as("cluster_id"))
      .localCheckpoint(true)
    graft.CheckpointBlocks.release(labels)
    edges.unpersist(blocking = false)
    result
  }

  /** Incremental cluster maintenance — the CLUSTER-STATE member of the
    * engine's state family (q95/q100/.../q119). The persisted state is
    * the `(id, cluster_id)` label frame [[connectedComponents]] already
    * emits; this operator folds a new batch's near-dup pairs into it
    * WITHOUT revisiting history's edges:
    *
    * components( star(state) ∪ newPairs ) == components( allHistoryEdges ∪ newPairs )
    *
    * because collapsing a component to its star (every member → its
    * label) preserves connectivity exactly. So the state COMPRESSES an
    * unbounded edge history into O(nodes) star edges, history text is
    * never re-sketched (the batch-vs-state pair producers — q58's
    * family — supply `newPairs`), and the propagation loop runs on
    * |star| + |batch pairs| edges with old components at diameter <= 2.
    *
    * Contract the caller must know: labels are min-id over the UNION, so
    * a batch doc with a smaller id than an old cluster's representative
    * RELABELS that cluster (the star edges carry the new min through) —
    * state labels are canonical per round, not stable across rounds.
    * `newPairs` must contain every qualifying pair with at least one
    * batch endpoint (batch-batch and batch-history); pairs wholly inside
    * history are what the state already encodes.
    *
    * Takedown caveat ([[graft.operators.Retraction]] family): cluster
    * state CANNOT retract — star compression is lossy for deletion
    * (removing a cut-vertex doc may split a component, and the original
    * pair structure needed to know is gone). Deleting docs means
    * re-running components over the surviving PAIRS of the affected
    * components only; unaffected components keep their labels.
    */
  def incrementalComponents(state: DataFrame, newPairs: DataFrame,
                            idACol: String, idBCol: String,
                            maxIters: Int = 50): DataFrame = {
    val star = state.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idACol), col("cluster_id").as(idBCol))
    connectedComponents(
      star.unionByName(newPairs.select(col(idACol), col(idBCol))),
      idACol, idBCol, maxIters)
  }

  /** Duplication-graph centrality: integer-ppm PageRank over the
    * undirected near-dup pair graph — a quality/weighting signal that
    * ranks how CENTRAL a document is to a duplication neighborhood
    * (templates, boilerplate hubs, and viral passages score high; an
    * incidental one-off near-dup scores near the 1-damp floor). Cluster
    * labels (q51) say only WHICH component a doc is in; this scores how
    * load-bearing it is within one.
    *
    * Arithmetic is integer parts-per-million throughout so the result is
    * bit-identical across engines and partitionings: every node starts at
    * 1e6 ppm; each iteration a node's rank is
    * `(1e6 - dampPpm) + dampPpm * Σ_{u~v} (r(u) div deg(u)) div 1e6`,
    * with the per-edge share an integer floor-div and the damped product
    * computed in DECIMAL(38,0) (a mega-hub's inbound mass can pass 63
    * bits before the ranks themselves do). Fixed `iters` rounds — a
    * deterministic, replayable profile, not a convergence loop.
    *
    * Scale shape: identical to [[connectedComponents]] — each round is
    * one join of the edge list against the (nodes-sized) rank frame plus
    * one map-side-combinable sum; edges persist across rounds; nothing
    * driver-side. Rank mass concentrates at hubs, so the aggregation
    * inherits the skew story of any hot-key groupBy (AQE/salting).
    * Measured (round-8 Scratch probe, local[32], 3 iters, chain clusters
    * + a mega-hub on 2% of nodes): 82k edges 6.4 s, 820k edges 5.8 s —
    * flat at 10x, fixed per-iteration scheduling overhead dominating,
    * i.e. the joins/sums are nowhere near capacity at these scales.
    */
  def centralityPpm(pairs: DataFrame, idACol: String, idBCol: String,
                    iters: Int = 3, dampPpm: Long = 850000L): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"centralityPpm: iters in [1, 20], got $iters")
    require(dampPpm >= 0L && dampPpm <= 1000000L,
      s"centralityPpm: dampPpm in [0, 1e6], got $dampPpm")
    val base = 1000000L - dampPpm
    // materialize the pair list ONCE before mirroring it (r14): the two
    // union branches are separate subtrees to Catalyst, so an un-
    // materialized `pairs` — typically the whole minhash bucket/verify
    // pipeline — would execute twice, once per direction (q121's profile
    // showed every sketch-consumer stage duplicated). An eager local
    // checkpoint runs the producer once; the mirror then reads blocks.
    val p0 = pairs.select(col(idACol).as("u"), col(idBCol).as("v"))
      .localCheckpoint(true)
    val edges = p0
      .unionByName(p0.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .persist()
    val deg = edges.groupBy("u").agg(count(lit(1)).as("__deg")).persist()
    var r = deg.select(col("u").as("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      // every node of an undirected graph has >= 1 in-neighbor, so the
      // inner joins lose nobody
      // the per-edge-share SUM is itself decimal: a mega-hub's inbound
      // mass passes 63 bits before the ranks do, and a LongType sum
      // would silently wrap with ANSI off (the oracle's sum(BIGINT) is
      // HUGEINT) — protecting only the damped product is too late
      r = edges.join(r.withColumnRenamed("id", "u"), "u")
        .join(deg, "u")
        .groupBy(col("v").as("id"))
        .agg(sum(expr("cast(r div __deg as decimal(38,0))")).as("__c"))
        .select(col("id"),
          (lit(base) +
            expr(s"cast($dampPpm * __c div 1000000 as bigint)"))
            .as("r"))
    }
    val result = r.select(col("id"), col("r").as("rank_ppm")).localCheckpoint(true)
    deg.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    graft.CheckpointBlocks.release(p0)
    result
  }

  /** Cluster-aware train/val/test assignment: every document is hashed by
    * its CLUSTER id (its own id when unclustered), so all members of a
    * near-dup cluster land in the SAME split — assigning by doc id would
    * put near-copies of the same text on both sides of the train/test
    * boundary, silently contaminating the eval (the split-level form of
    * benchmark decontamination). Thresholds are permille cut points on
    * the retry-stable id-hash: deterministic across runs, retries, and
    * cluster sizes, and SQL-replayable like the sampling operators.
    *
    * Scale shape: one broadcast-or-shuffle left join against the (small)
    * cluster labels, then a narrow projection — no per-split shuffles;
    * downstream writers partition by the `split` column.
    */
  def splitByCluster(docs: DataFrame, idCol: String, clusters: DataFrame,
                     trainPermille: Int = 800, valPermille: Int = 900): DataFrame = {
    require(0 <= trainPermille && trainPermille <= valPermille && valPermille <= 1000,
      s"splitByCluster: need 0 <= train ($trainPermille) <= val ($valPermille) <= 1000")
    docs.select(col(idCol).as("id"))
      .join(clusters, Seq("id"), "left")
      .withColumn("__c", coalesce(col("cluster_id"), col("id")))
      .withColumn("__b", graft.functions.HashFunctions.idHash32(col("__c")) % 1000)
      .withColumn("split",
        when(col("__b") < trainPermille, "train")
          .when(col("__b") < valPermille, "val")
          .otherwise("test"))
      .select(col("id"), col("split"))
  }

  /** Contamination CLOSURE over the near-dup graph: decontamination that
    * is closed under near-duplication. A containment check (q46's
    * [[NearDedup.containmentPairs]]) flags documents that literally quote
    * an eval item — but a NEAR-COPY of a flagged document (same text,
    * re-crawled with a different boilerplate wrapper) carries the same
    * leaked content while its own containment score can sit just under
    * the threshold. Dropping only the directly-flagged docs leaves those
    * twins in the corpus; the correct unit of removal is the whole
    * near-dup CLUSTER. Given the per-doc cluster labels
    * ([[connectedComponents]]) and the directly-flagged id set, every
    * document sharing a cluster with any flagged document is dropped too.
    *
    * Output: one row per input doc — `(id, cluster_id, direct, verdict)`
    * where `direct` marks docs the containment check itself flagged and
    * `verdict` is 'drop' for every member of a contaminated cluster
    * ('keep' otherwise). The interesting rows are verdict='drop' with
    * direct=false: leaked content the containment check alone would have
    * missed.
    *
    * Scale shape: the flagged side is benchmark-sized (eval suites are
    * thousands of items, bounded by construction, never corpus-scale), so
    * the contaminated-cluster set is at most that large — both ride
    * broadcast joins and the corpus never shuffles beyond the one id-hash
    * join against the (clustered-docs-sized) label frame. Unclustered
    * docs are their own cluster (coalesce to own id), so a flagged doc
    * with no near-dups still drops exactly itself.
    */
  def contaminationClosure(docs: DataFrame, idCol: String, clusters: DataFrame,
                           flagged: DataFrame, flaggedIdCol: String): DataFrame = {
    val direct = flagged.select(col(flaggedIdCol).as("id")).distinct()
    // a flagged doc absent from the label frame is its own cluster
    val badClusters = direct.join(clusters, Seq("id"), "left")
      .select(coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .distinct()
    docs.select(col(idCol).as("id"))
      .join(clusters, Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
      .join(broadcast(direct.withColumn("__direct", lit(true))), Seq("id"), "left")
      .join(broadcast(badClusters.withColumn("__bad", lit(true))),
        Seq("cluster_id"), "left")
      .select(col("id"), col("cluster_id"),
        coalesce(col("__direct"), lit(false)).as("direct"),
        when(coalesce(col("__bad"), lit(false)), lit("drop"))
          .otherwise(lit("keep")).as("verdict"))
  }

  /** Best-of-cluster survivor selection: for every near-dup cluster keep
    * the member with the highest `scoreCol` (ties to the smallest id) —
    * the curation-grade upgrade over min-id survivors, which throw away
    * the best-written copy whenever it happens to carry a larger id.
    * Unclustered documents are their own cluster and survive as
    * themselves.
    *
    * Output: one row per cluster — (cluster_id, rep_id, score of the
    * representative, n_members). The score must be a deterministic,
    * cross-engine-stable value (e.g. the rounded quality score) for the
    * tie-break to be reproducible.
    *
    * Scale shape: one left join against the (small) cluster-label frame,
    * then a single hash-partition window over cluster_id — row_number +
    * count share the partition, so it is ONE shuffle; no driver state,
    * no global sort.
    */
  def representatives(docs: DataFrame, idCol: String, clusters: DataFrame,
                      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster_id"))
    val ranked = docs
      .select(col(idCol).as("id"), col(scoreCol).as("__score"))
      .join(clusters, Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
      .withColumn("__rn",
        row_number().over(w.orderBy(col("__score").desc, col("id"))))
      .withColumn("n_members", count(lit(1)).over(w))
    ranked.filter(col("__rn") === 1)
      .select(col("cluster_id"), col("id").as("rep_id"),
        col("__score").as("rep_score"), col("n_members"))
  }
}
