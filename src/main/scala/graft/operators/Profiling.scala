package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight data profiling for shuffle-heavy plans.
  *
  * Before a large join or aggregation ships to a cluster, the question
  * that decides its fate is "how skewed is the key?" — one hot key means
  * one straggler task holding a 1000-executor stage hostage, and the
  * remedies (salting factor, AQE skew thresholds, broadcast decisions)
  * all need NUMBERS to be sized. This profiler produces those numbers as
  * a small, deterministic report the operator (human or automated) reads
  * before picking a strategy.
  */
object Profiling {

  /** Heavy-hitter profile of a prospective shuffle key: the `topN`
    * heaviest key values with, for each —
    *  - `n` rows,
    *  - `share_ppm`: the key's share of all rows in parts-per-million,
    *  - `skew_x100`: n / (mean rows per key), scaled by 100 —
    *    100 = perfectly uniform, 1500 = this key is 15x the mean and a
    *    salting candidate.
    *
    * Both ratios are INTEGER arithmetic (multiply-then-integer-divide of
    * exact counts), so the report is bit-identical across engines and
    * runs — a profile that feeds an automated salting decision must not
    * flap on float rounding. (The intermediate products stay far inside
    * 63 bits for any realistic profile: rows * 1e6 overflows only past
    * ~9e12 rows, and rows * keys * 100 only when both exceed ~3e8 —
    * at that point profile a [[Sampling.sampleByRate]] of the input,
    * which preserves shares and skew ratios by construction.)
    *
    * Scale shape: one map-side-combinable count by key, one single-row
    * global total broadcast back over the per-key counts, then a top-k
    * (TakeOrderedAndProject — no global sort). The full key histogram is
    * never collected to the driver.
    */
  def keySkewProfile(df: DataFrame, keyCols: Seq[String],
                     topN: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "keySkewProfile: need at least one key column")
    require(topN > 0, s"keySkewProfile: topN must be positive, got $topN")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum(col("n")).as("__total"), count(lit(1)).as("__nkeys"))
    val profiled = counts
      .crossJoin(broadcast(totals))
      // `div`, not `/`: Spark's `/` on integers is double division, and a
      // double quotient is exactly the cross-engine instability this
      // report exists to avoid.
      .withColumn("share_ppm", expr("n * 1000000L div __total"))
      .withColumn("skew_x100", expr("n * __nkeys * 100L div __total"))
      .drop("__total", "__nkeys")
    Aggregates.topK(profiled,
      Seq(col("n").desc) ++ keyCols.map(col), topN)
  }

  /** Pre-flight output-size profile of a prospective EQUI-JOIN: for each
    * join-key value present on BOTH sides, the row count per side and the
    * exact inner-join output rows that key will produce
    * (`out_n = left_n * right_n`), plus `out_share_ppm` — the key's share
    * of the TOTAL join output in parts-per-million. The `topN` keys by
    * `out_n` are the answer to "which keys explode this join?", sized for
    * the decisions that follow (salt those keys via [[Skew.saltedJoin]],
    * pre-aggregate one side, or reject the join shape outright).
    *
    * The point is what it does NOT do: the join. Both sides reduce to
    * map-side-combinable per-key counts — two narrow aggregations whose
    * shuffle carries one row per distinct key, not per input row — and the
    * count-level inner join is on per-key cardinalities. A 10^12-row
    * output the real join would produce costs this profile nothing.
    *
    * All ratios are integer arithmetic on exact counts ([[keySkewProfile]]
    * rationale — a report feeding automated plan decisions must not flap
    * on float rounding). The ppm share is computed in DECIMAL(38,0), so
    * it is exact wherever `out_n` itself is; `out_n` (a 63-bit product)
    * overflows only past ~3e9 rows per key per SIDE — profile a
    * [[Sampling.sampleByRate]] beyond that.
    *
    * Probe (Scratch, 2M x 2M rows, 100k keys, one hot key producing 12M
    * of the join's 52M output rows, warm): profile 1.1 s vs 2.1 s to
    * materialize the join through a noop sink — and the profile's output
    * is 5 rows where the join's is 52M, which is the part that matters
    * when the output would cross a cluster's network instead of a local
    * memory bus.
    */
  def joinFanoutProfile(left: DataFrame, right: DataFrame,
                        keyCols: Seq[String], topN: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "joinFanoutProfile: need at least one key column")
    require(topN > 0, s"joinFanoutProfile: topN must be positive, got $topN")
    val ln = left.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("left_n"))
    val rn = right.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("right_n"))
    // persisted: the per-key frame feeds BOTH the total and the report —
    // without it the two input aggregations run twice (the q85 recompute
    // lesson). Key-cardinality rows only; released with the queue below.
    val perKey = reused(ln.join(rn, keyCols)
      .withColumn("out_n", col("left_n") * col("right_n")))
    val total = perKey.agg(sum(col("out_n")).as("__total_out"))
    val profiled = perKey
      .crossJoin(broadcast(total))
      // DECIMAL(38,0) product: out_n * 1e6 would wrap Long once out_n
      // passes ~9.2e12 — far below out_n's own 63-bit range
      .withColumn("out_share_ppm",
        expr("cast(cast(out_n as decimal(38,0)) * 1000000 div __total_out as bigint)"))
      .drop("__total_out")
    Aggregates.topK(profiled,
      Seq(col("out_n").desc) ++ keyCols.map(col), topN)
  }

  /** Embedding-distribution drift monitor: per group, the cosine between
    * the OLD and NEW sides' centroid directions — the go/no-go check
    * before admitting an increment of vectors ("did the upstream encoder
    * or the content distribution move?"). A drift_cos near 1.0 means the
    * increment points where the corpus already points; a drop flags a
    * re-embedding, a domain shift, or a pipeline bug upstream.
    *
    * Exactness design: raw float centroids cannot be replayed across
    * engines (cross-ROW float summation is order-dependent), so the
    * centroid is taken over the INT8-QUANTIZED vectors
    * ([[graft.functions.VectorFunctions.quantizeInt8]] — max-abs
    * normalization, already this engine's serving representation,
    * q43/q79): integer per-dimension sums are exact and order-free, and
    * since cosine is scale-invariant the sum vector stands in for the
    * mean. The final cosine folds the two integer vectors left-to-right
    * in double ([[graft.functions.VectorFunctions.cosineBuiltin]]), which
    * the oracle replays verbatim. Sums stay float-free up to ~7e16 rows
    * per group (127 per dim per row in a long).
    *
    * Output: (group, n_old, n_new, drift_cos), drift_cos rounded to 6;
    * a group with either side empty reads null drift (unknown, not 0).
    *
    * Scale shape: one narrow dim-explode (rows x d), one
    * map-side-combinable (group, dim) sum, then a group-cardinality
    * collect into ordered arrays — no shuffle proportional to pairs,
    * no driver state.
    */
  def embeddingDriftQuantized(df: DataFrame, groupCol: String, newCol: Column,
                              vecCol: String): DataFrame = {
    import graft.functions.VectorFunctions
    val g = col(groupCol)
    val q = df.select(g, newCol.as("__new"),
      posexplode(VectorFunctions.quantizeInt8(col(vecCol))).as(Seq("__pos", "__q")))
    val sums = q.groupBy(g, col("__pos"))
      .agg(sum(when(!col("__new"), col("__q"))).cast("long").as("__s_old"),
        sum(when(col("__new"), col("__q"))).cast("long").as("__s_new"))
    val vecs = sums.groupBy(g).agg(
      transform(array_sort(collect_list(struct(col("__pos"), col("__s_old")))),
        s => s.getField("__s_old")).as("__v_old"),
      transform(array_sort(collect_list(struct(col("__pos"), col("__s_new")))),
        s => s.getField("__s_new")).as("__v_new"))
    val counts = df.groupBy(g).agg(
      count(when(!newCol, lit(1))).as("n_old"),
      count(when(newCol, lit(1))).as("n_new"))
    counts.join(vecs, groupCol)
      .select(g, col("n_old"), col("n_new"),
        round(VectorFunctions.cosineBuiltin(col("__v_old"), col("__v_new")), 6)
          .as("drift_cos"))
  }

  /** Key values violating a PRIMARY-KEY claim: every key appearing on
    * more than one row, with its multiplicity — the audit run before
    * trusting a dedup, a merge, or a join cardinality assumption. One
    * map-side-combinable count by key; the report is violation-sized.
    */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "duplicateKeys: need at least one key column")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
  }

  /** DISTINCT child-side key values with no parent row — the
    * referential-integrity half of the audit, and the pre-flight measure
    * of how many keys an inner join would silently drop ("is this FK
    * real?"). NULL child keys are excluded (a null FK is absent, not
    * dangling). One distinct + one anti join on narrow keys.
    */
  def orphanKeys(child: DataFrame, childKey: String,
                 parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey)).where(col(childKey).isNotNull).distinct()
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")

  /** Octave histogram of a nonnegative integer column: bucket =
    * floor(log2 v) via the bit length of `bin(v)` (the q149 spelling —
    * integer-exact at power-of-two boundaries in any engine), v = 0 in
    * its own bucket −1, NULLs excluded, negative values fail loudly (a
    * silently mis-binned value would shift a drift verdict). One
    * map-side-combinable count; output is ≤ 65 rows.
    */
  def octaveCounts(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    df.where(v.isNotNull)
      .select(when(v < 0L, raise_error(concat(
          lit(s"octaveCounts: negative value in $valueCol: "), v.cast("string"))))
        .when(v === 0L, lit(-1L))
        .otherwise((length(bin(v)) - 1).cast("long")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** PSI — Population Stability Index — between a REFERENCE snapshot and
    * the CURRENT corpus over the octave distribution of `valueCol`: the
    * standard "has the data shifted since the model/mixture was tuned?"
    * monitor, next to [[embeddingDriftQuantized]] (embedding drift) and
    * `Pca.directionDrift` (encoder drift) — this one watches a SCALAR
    * distribution (token counts, document lengths, scores).
    *
    * Per-bucket contribution, all BIGINT:
    *
    *   psi_c = (cur_ppm − ref_ppm) · (L(cur_ppm+1) − L(ref_ppm+1))
    *
    * where shares are integer parts-per-million and L is the Q16
    * piecewise-linear log2 ([[graft.classify.Dsir.linLog2Q16]]) — the
    * textbook (p−q)·ln(p/q) with log2 in place of ln (a constant factor;
    * thresholds calibrate in these units) and +1 Laplace smoothing so a
    * bucket absent on one side contributes finitely. Both factors share
    * sign (L is monotone), so every contribution is ≥ 0 — spec-pinned.
    * Bit-reproducible across engines, partitionings, and the DuckDB
    * oracle; a float-ln PSI would flap in the last ulps.
    *
    * Scale shape: two map-side-combined octave counts (≤ 65 rows each),
    * a full outer join at bucket cardinality, totals broadcast from
    * 1-row aggregates — nothing corpus-sized past the first scan. An
    * empty side fails loudly (shares of nothing are not a drift verdict).
    *
    * Output per bucket: `(bucket, ref_n, cur_n, ref_ppm, cur_ppm,
    * psi_c_q16ppm, psi_q16ppm)` — the last column is the global total
    * (repeated; the gate reads any row).
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame =
    psiDriftFromCounts(octaveCounts(ref, valueCol), octaveCounts(cur, valueCol))

  /** [[psiDrift]] from PERSISTED octave-count states — the increments
    * form: counts are `(bucket, cnt)` frames as produced by
    * [[octaveCounts]], [[mergeOctaveCounts]] of per-increment states, or
    * a [[graft.operators.Retraction.subtract]] takedown, so yesterday's
    * persisted reference compares against today's merged increments
    * without rescanning either corpus (the q102 state contract, PSI
    * readout).
    */
  def psiDriftFromCounts(refCounts: DataFrame, curCounts: DataFrame): DataFrame = {
    import graft.classify.Dsir.linLog2Q16
    val rc = refCounts.withColumnRenamed("cnt", "ref_n")
    val cc = curCounts.withColumnRenamed("cnt", "cur_n")
    val rt = rc.agg(sum("ref_n").as("__rt"))
    val ct = cc.agg(sum("cur_n").as("__ct"))
    val joined = rc.join(cc, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("ref_n", "cur_n"))
      .crossJoin(broadcast(rt)).crossJoin(broadcast(ct))
      .withColumn("ref_ppm",
        when(col("__rt").isNull, raise_error(lit("psiDrift: empty reference side")))
          .otherwise(expr("ref_n * 1000000 div __rt")))
      .withColumn("cur_ppm",
        when(col("__ct").isNull, raise_error(lit("psiDrift: empty current side")))
          .otherwise(expr("cur_n * 1000000 div __ct")))
      .withColumn("psi_c_q16ppm",
        (col("cur_ppm") - col("ref_ppm")) *
          (linLog2Q16(col("cur_ppm") + 1L) - linLog2Q16(col("ref_ppm") + 1L)))
    // global total as a window over the ≤65-row bucket frame (constant
    // partition key: one 65-row shuffle, NOT a second pass over either
    // corpus — an agg+crossJoin here would re-run both scans)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    joined
      .withColumn("psi_q16ppm", sum("psi_c_q16ppm").over(wAll))
      .select("bucket", "ref_n", "cur_n", "ref_ppm", "cur_ppm",
        "psi_c_q16ppm", "psi_q16ppm")
  }

  /** Merge persisted per-increment octave-count states: per-bucket sum —
    * exact (counts are abelian), map-side-combinable, ≤ 66 distinct
    * buckets total. Disjoint-increment contract as everywhere in the
    * state family; takedown is [[graft.operators.Retraction.subtract]]
    * with key `bucket` (OperatorsSpec pins merge == one-pass and the
    * retract identity).
    */
  def mergeOctaveCounts(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "mergeOctaveCounts: need at least one state")
    parts.reduce(_ unionByName _)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
  }

  /** Collect a reference's octave SHARES as the bounded `bucket → ppm`
    * map the streaming PSI gate broadcasts
    * ([[graft.streaming.StreamingOps.psiOverStream]]): ≤ 65 rows by
    * construction (the one-bucket-per-octave contract), computed with
    * the same integer `cnt·1e6 div total` as [[psiDrift]]'s ref side,
    * so stream readouts replay the batch compare bit-for-bit.
    */
  def collectOctaveShares(df: DataFrame, valueCol: String): Map[Long, Long] = {
    val counts = octaveCounts(df, valueCol)
      .select(col("bucket"), col("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val total = counts.map(_._2).sum
    require(total > 0, "collectOctaveShares: empty reference side")
    counts.map { case (b, c) => b -> c * 1000000L / total }.toMap
  }

  private val cache = new graft.TrackedCache
  private def reused(df: DataFrame): DataFrame = cache.reused(df)

  /** Unpersist every per-key frame persisted by [[joinFanoutProfile]]
    * (non-blocking) — lifecycle contract in [[graft.TrackedCache]].
    */
  def releaseProfiles(): Unit = cache.releaseAll()
}
