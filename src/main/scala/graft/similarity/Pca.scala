package graft.similarity

import java.math.BigInteger

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top principal direction of an embedding corpus by FIXED-POINT power
  * iteration — the diagnostic a curation pipeline runs on its vector
  * column: the dominant direction is what "all-but-the-top"
  * post-processing removes (embedding sets concentrate mass on one
  * direction, which washes out cosine contrast), and drift of that
  * direction between snapshots is an early-warning signal that an
  * upstream encoder changed.
  *
  * Why fixed point: float power iteration re-orders partial sums under
  * shuffle, so the "same" corpus yields a slightly different direction
  * per run — useless as a drift REFERENCE. Here coordinates quantize to
  * micros (`floor(x * 1e6)` — the q33/q43 spelling both engines share),
  * every iteration is integer arithmetic with DECIMAL(38,0)/HUGEINT
  * sums, and the rescale is the sign-explicit division of
  * [[graft.operators.Regression]] (`sign(u)·(|u| div m)` — Spark `div`
  * truncates toward zero, other engines floor, so negatives route
  * through magnitudes). The result is bit-identical on any engine, any
  * partitioning — and SQL-replayable, so the whole iteration chain sits
  * under the DuckDB oracle gate (q136), not just a unit test.
  *
  * Algorithm (covariance-free — the d x d Gram matrix is never
  * materialized, A^T A v is computed as A^T (A v)):
  *  - v0 = 1e6 on the coordinate with the largest Σ a_j² (ties to the
  *    lowest index) — deterministic init aligned with the energy, so
  *    convergence does not depend on a seed;
  *  - per iteration: s_i = Σ_j a_ij v_j computed as an INLINE projection
  *    against the broadcast-literal v (a flat d-term codegen sum — no
  *    join, no per-row shuffle), then u_j = Σ_i s_i a_ij as ONE d-row
  *    map-side-combinable aggregation over the posexploded coordinates;
  *  - fixed `iters` rounds — a replayable profile, not a convergence
  *    loop (the q88 contract). Convergence is geometric in the spectral
  *    gap; 3 iterations pin a dominant direction to ~1e-3.
  *
  * Scale shape (r14 rewrite, guide §2.3/§2.4): the previous formulation
  * shuffled the exploded (id, dim, a) frame THREE times per iteration —
  * groupBy(__r) for the per-row dot, a join of the exploded frame back
  * against those dots, then the d-row aggregate; the join also planned a
  * broadcast-build job per iteration. Since v is a d-long literal the
  * driver already holds, the dot is a projection, not an aggregation:
  * per iteration the corpus is now read ONCE from the persisted narrow
  * (id, array) frame and the only exchange carries d map-side partial
  * rows per task. Measured at sf0.1 (local[32]): q139 solo 9.4 s → the
  * join/shuffle stages (9 × ~0.6 s broadcast-build jobs) drop out
  * entirely; plan Exchange count per iteration 3 → 1. Nothing
  * corpus-sized ever sits on the driver (d longs per round-trip).
  */
object Pca {

  /** Narrow micro-quantized frame: (__r id, a array<long> micros). Rows
    * with a null vector or a wrong-dimension vector are excluded (they
    * have no coordinates to contribute). Null ELEMENTS quantize to null
    * and are skipped by every sum below, exactly as the exploded
    * formulation's null-skipping aggregates did.
    */
  private def quantized(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int): DataFrame = {
    val qf = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("__r"),
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(1000000.0)).cast("long")).as("a"))
    // Size-derived partitioning for the persisted frame (r14): every
    // iterate() round launches a job over this frame, so its partition
    // count is a per-round fixed cost — at sf0.1 the inherited
    // 32-partition scan split means ~64 near-empty tasks per round whose
    // scheduling dwarfs the arithmetic (measured: the same query at 8
    // cores runs FASTER than at 32). Derive the count from the
    // optimizer's size estimate (~32 MB per partition) instead: small
    // corpora collapse to a few tasks, large ones fan out with the data
    // — never a constant tuned to either regime.
    // Floor at a few cores even when tiny: the per-row work is O(d)
    // DECIMAL(38) multiplies (the exactness contract), which is compute-
    // dense relative to its bytes — a single task serializes ~1 s of
    // BigDecimal arithmetic at sf0.1 corpus sizes (the q34 lesson:
    // partition for the compute when the compute, not the bytes, is the
    // cost). The floor is capped by the machine, the growth by the data.
    val bytes = qf.queryExecution.optimizedPlan.stats.sizeInBytes
    val cpuFloor = math.min(df.sparkSession.sparkContext.defaultParallelism, 16)
    // sentinel guard (r14 ADVICE): a plan without real stats (e.g. a
    // localCheckpoint-backed LogicalRDD upstream) reports
    // spark.sql.defaultSizeInBytes = Long.MaxValue, which the old min
    // clamped to 10000 — ten thousand near-empty tasks PER power-iteration
    // round, the exact scheduling pathology this derivation removes. With
    // no usable estimate, fall back to the machine's parallelism.
    val noStats = bytes >=
      org.apache.spark.sql.internal.SQLConf.get.defaultSizeInBytes
    val k =
      if (noStats) df.sparkSession.sparkContext.defaultParallelism
      else (bytes / (32L * 1024 * 1024) + 1).min(BigInt(10000)).toInt.max(cpuFloor)
    qf.repartition(k)
  }

  /** Inline per-row dot against the literal direction: Σ_j a_j·v_j as ONE
    * higher-order expression (`aggregate(zip_with(a, v, *))`) against the
    * direction as an ARRAY literal. Why not the r14 flat d-term sum of
    * per-coordinate long literals: scalar literals INLINE into the
    * generated source, so every power-iteration round produced a brand-new
    * projection source and janino recompiled it — profiled at sf0.1 as the
    * dominant per-iteration cost (the dense-direction iteration stages ran
    * 0.68–0.78 s vs 0.17–0.19 s for the sparse-init round over the same
    * 1.1 MB). An array literal is emitted as a codegen REFERENCE OBJECT,
    * so the source is bit-identical across iterations (and across
    * q136/q138/q139 and bench attempts) and the session's codegen cache
    * serves every round after the first. The HOF's per-element long
    * arithmetic is interpreted, which at d·n elements is microseconds —
    * the right trade against a per-round compile (the same call the r14
    * resExpr comment records for the residual). A flat element_at(vLit, j)
    * form would NOT work: literal array + literal index is foldable, and
    * ConstantFolding would inline the scalars right back. Constant-size
    * expression tree at any dim, so the dim=4096 contract no longer risks
    * a Catalyst stack overflow (r14 ADVICE). Null coordinates contribute 0
    * exactly as the exploded aggregate skipped them. Fits a long with
    * room: d·1e6·1e6 <= 4e15 at d <= 4096. */
  private def dotLit(aCol: Column, v: Array[Long]): Column =
    aggregate(
      zip_with(aCol, lit(v), (aj, vj) => coalesce(aj, lit(0L)) * vj),
      lit(0L), (acc, x) => acc + x)

  /** Per-dimension decimal sums read from ONE WIDE aggregation row (r15):
    * the r14 form posexploded the corpus to n·d rows and hash-aggregated
    * them back to d groups every round — profiled at sf0.1 as 0.38–0.41 s
    * per round over 1.1 MB (explode allocation + hash-table probes
    * dominate, not arithmetic). d running sums as d aggregate columns skip
    * both: one codegen pass over the persisted rows, map-side partials, a
    * 1-row readout. Exactness is unchanged — decimal sums are associative,
    * so the wide form produces bit-identical u_j. A dim whose every value
    * is NULL sums to null; the exploded groupBy simply omitted that j (its
    * u_j stayed 0), so null maps to ZERO here. */
  private def sumsOf(row: org.apache.spark.sql.Row, offset: Int,
                     dim: Int): Array[BigInteger] =
    Array.tabulate(dim) { j =>
      val d = row.getDecimal(offset + j)
      if (d == null) BigInteger.ZERO else d.toBigInteger
    }

  /** The power-iteration core over a (pre-persisted) quantized frame:
    * returns iterates v_0..v_iters, each an Array[Long] of micros with
    * max|v| = 1e6. */
  private def iterate(q: DataFrame, dim: Int, iters: Int): Seq[Array[Long]] = {
    // deterministic init: the highest-energy coordinate (lowest index on
    // ties) — one scan, d wide map-side-combinable decimal sums (see
    // [[sumsOf]] for why this replaced the posexplode+groupBy readout)
    val eAggs = (0 until dim).map(j =>
      sum((element_at(col("a"), j + 1) * element_at(col("a"), j + 1))
        .cast("decimal(38,0)")).as(s"e$j"))
    val eRows = q.agg(count(lit(1)).as("__n"), eAggs: _*).collect()
    require(eRows.nonEmpty && eRows(0).getLong(0) > 0L, "Pca: no valid vectors")
    val energy = sumsOf(eRows(0), 1, dim)
    val j0 = energy.zipWithIndex.maxBy { case (e, j) => (e, -j) }._2 // lowest index on ties
    var v = Array.tabulate(dim)(j => if (j == j0) 1000000L else 0L)
    Seq(v.clone()) ++ (1 to iters).map { _ =>
      // s_i = row dot v (inline projection — see dotLit); u_j sums
      // s_i * a_ij in decimal: n * 4e15 * 1e6 passes 63 bits on any real
      // corpus. ONE scan, ONE 1-row exchange, no join, no explode.
      val uAggs = (0 until dim).map(j =>
        sum(element_at(col("a"), j + 1).cast("decimal(38,0)") * col("__s"))
          .as(s"u$j"))
      val row = q.select(col("a"), dotLit(col("a"), v).as("__s"))
        .agg(uAggs.head, uAggs.tail: _*).collect()(0)
      val u = sumsOf(row, 0, dim)
      val m = u.map(_.abs).max
      require(m.signum > 0, "Pca: zero iterate (degenerate corpus)")
      val next = new Array[Long](dim)
      u.zipWithIndex.foreach { case (uj, j) => next(j) = sdiv(uj.multiply(Micros), m) }
      v = next
      v.clone()
    }
  }

  /** Per-iteration direction trail: (iter, dim, v_u) with v_u in micros,
    * max|v_u| = 1e6 per iteration; iter 0 is the deterministic init.
    * `idCol` keys the per-row dot — any unique row id.
    */
  def topComponentTrail(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, iters: Int): DataFrame = {
    require(dim > 0 && dim <= 4096, s"topComponentTrail: dim in (0, 4096], got $dim")
    require(iters >= 1 && iters <= 10, s"topComponentTrail: iters in [1, 10], got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val q = quantized(df, idCol, vecCol, dim).persist()
    val vs = iterate(q, dim, iters)
    q.unpersist(blocking = false)
    vs.zipWithIndex.flatMap { case (v, it) =>
      v.zipWithIndex.map { case (x, j) => (it.toLong, j.toLong, x) }
    }.toDF("iter", "dim", "v_u")
  }

  /** The final direction only (micros, max|v| = 1e6). */
  def topComponent(df: DataFrame, idCol: String, vecCol: String,
                   dim: Int, iters: Int): Array[Long] = {
    require(dim > 0 && dim <= 4096, s"topComponent: dim in (0, 4096], got $dim")
    require(iters >= 1 && iters <= 10, s"topComponent: iters in [1, 10], got $iters")
    val q = quantized(df, idCol, vecCol, dim).persist()
    val v = iterate(q, dim, iters).last
    q.unpersist(blocking = false)
    v
  }

  /** All-but-the-top residual profile: per row, the projection
    * coefficient onto the corpus's top direction and the squared norm of
    * what remains after removing it — the post-processing that restores
    * cosine contrast when one direction dominates, here as integer-exact
    * DIAGNOSTIC output (proj = Σ a_j v_j; resid_j = a_j − sdiv(proj·v_j,
    * Σv²); res_norm2 = Σ resid_j² — every step sign-explicit micros, so
    * both the projection and the residual energy are engine-stable
    * numbers a gate can compare). A corpus dominated by its top
    * direction shows res_norm2 << Σa² on most rows; after an encoder
    * change the profile shifts — together with [[directionDrift]] this
    * is the vector-column health check.
    *
    * Null convention (r14 ADVICE, documented): a row whose vector
    * elements are ALL null yields proj = 0 and res_norm2 = 0 (each null
    * coordinate contributes exact zero), where the pre-r14 exploded
    * aggregation emitted NULL for such rows. No gated corpus contains
    * one (quantized() already drops null/wrong-dim VECTORS; this is the
    * all-null-ELEMENTS corner), and 0 is the honest reading — a row with
    * no finite coordinates has no projection and no residual energy.
    *
    * Scale shape (r14): the direction is `iters` bounded aggregations
    * ([[iterate]]); the profile itself is now ONE SHUFFLE-FREE
    * projection over the quantized frame — proj and the residual sum are
    * both flat d-term codegen expressions against the literal direction
    * (the old form exploded the corpus, joined the per-row dots back,
    * and re-aggregated by row — two full shuffles of the exploded frame
    * for arithmetic the row already holds). Null coordinates contribute
    * 0 to proj and are skipped in res_norm2, exactly as the exploded
    * aggregates skipped them. Nothing corpus-sized sits on the driver.
    */
  def allButTopProfile(df: DataFrame, idCol: String, vecCol: String,
                       dim: Int, iters: Int): DataFrame = {
    require(dim > 0 && dim <= 4096, s"allButTopProfile: dim in (0, 4096], got $dim")
    val q = quantized(df, idCol, vecCol, dim).persist()
    val v = iterate(q, dim, iters).last
    val vv = v.map(x => BigInteger.valueOf(x).pow(2)).reduce(_ add _)
    require(vv.signum > 0, "allButTopProfile: zero direction")
    // resid_j = a_j - sign-explicit((p * v_j) div vv): p*v_j can pass 63
    // bits (4e15 * 1e6), so the quotient runs in DECIMAL(38,0); the
    // result is back in long range (|resid| <= |a| + 1e6-ish). vv itself
    // fits a long at d <= 4096 (<= 4.1e15). The residual sum is ONE
    // higher-order-function expression (zip_with + aggregate) rather
    // than d generated terms: a flat 64-term decimal case-when tree was
    // measured to cost ~40 s of first-use codegen/optimization at
    // sf0.1, while the lambda keeps the plan tree constant-size (the
    // per-element decimal work is interpreted, which is the right trade
    // for arithmetic that replaced two full shuffles of the exploded
    // frame). A null a_j contributes 0 (the old exploded sum skipped
    // its row).
    val vvL = s"${vv.longValueExact()}L"
    val vLit = s"array(${v.map(x => s"${x}L").mkString(",")})"
    val pv = s"(cast(__p as decimal(38,0)) * vj)"
    val rj = s"case when vj = 0L then aj else aj - cast(" +
      s"case when $pv < 0 then -((-$pv) div $vvL) else $pv div $vvL end" +
      s" as long) end"
    val resExpr = expr(
      s"aggregate(zip_with(a, $vLit, (aj, vj) -> $rj), 0L, " +
        s"(acc, r) -> acc + coalesce(r * r, 0L))")
    val out = q
      .withColumn("__p", dotLit(col("a"), v))
      .select(col("__r").as("id"), col("__p").as("proj"),
        resExpr.as("res_norm2"))
    val materialized = out.localCheckpoint(true)
    q.unpersist(blocking = false)
    materialized
  }

  /** Direction drift between two corpus snapshots: the integer cosine
    * evidence (c = v_a·v_b, cos² in ppm = c²·1e6 div (|v_a|²·|v_b|²)) —
    * sqrt-free so the number is exact and SQL-replayable; the SIGN of c
    * is immaterial (power iteration fixes sign only up to the init).
    * One row: a drift monitor compares cos2_ppm against a floor (1e6 =
    * identical directions; an encoder swap typically craters it).
    *
    * The two power-iteration chains run FUSED (r14): both snapshots are
    * tagged and unioned, and every round aggregates by (snapshot, dim)
    * in one job — a row only ever contributes to its own snapshot's
    * sums, so each chain's iterates are bit-identical to running
    * [[topComponent]] twice (NearDedupSpec pins drift-vs-stored equal to
    * the recomputed path), while the job count per round halves — at
    * bench scale the per-job barrier, not the arithmetic, is the cost.
    */
  def directionDrift(a: DataFrame, b: DataFrame, idCol: String, vecCol: String,
                     dim: Int, iters: Int): DataFrame = {
    require(dim > 0 && dim <= 4096, s"directionDrift: dim in (0, 4096], got $dim")
    require(iters >= 1 && iters <= 10, s"directionDrift: iters in [1, 10], got $iters")
    val tagged = quantized(a, idCol, vecCol, dim).withColumn("__g", lit(0))
      .unionByName(quantized(b, idCol, vecCol, dim).withColumn("__g", lit(1)))
      .persist()
    // per-snapshot deterministic init (highest-energy coordinate each) —
    // d wide decimal sums per snapshot, 2 rows out (see [[sumsOf]])
    val eAggs = (0 until dim).map(j =>
      sum((element_at(col("a"), j + 1) * element_at(col("a"), j + 1))
        .cast("decimal(38,0)")).as(s"e$j"))
    val eByG = tagged.groupBy(col("__g"))
      .agg(eAggs.head, eAggs.tail: _*)
      .collect().map(r => r.getInt(0) -> sumsOf(r, 1, dim)).toMap
    val vs: Array[Array[Long]] = Array.tabulate(2) { g =>
      require(eByG.contains(g), s"Pca: no valid vectors in snapshot $g")
      val j0 = eByG(g).zipWithIndex.maxBy { case (e, j) => (e, -j) }._2
      Array.tabulate(dim)(j => if (j == j0) 1000000L else 0L)
    }
    for (_ <- 1 to iters) {
      val uAggs = (0 until dim).map(j =>
        sum(element_at(col("a"), j + 1).cast("decimal(38,0)") * col("__s"))
          .as(s"u$j"))
      val uByG = tagged
        .select(col("__g"), col("a"),
          when(col("__g") === 0, dotLit(col("a"), vs(0)))
            .otherwise(dotLit(col("a"), vs(1))).as("__s"))
        .groupBy(col("__g"))
        .agg(uAggs.head, uAggs.tail: _*)
        .collect().map(r => r.getInt(0) -> sumsOf(r, 1, dim)).toMap
      for (g <- 0 to 1) {
        val ug = uByG.getOrElse(g, Array.fill(dim)(BigInteger.ZERO))
        val m = ug.map(_.abs).max
        require(m.signum > 0, s"Pca: zero iterate (degenerate snapshot $g)")
        val next = new Array[Long](dim)
        ug.zipWithIndex.foreach { case (uj, j) => next(j) = sdiv(uj.multiply(Micros), m) }
        vs(g) = next
      }
    }
    tagged.unpersist(blocking = false)
    driftRow(a.sparkSession, vs(0), vs(1))
  }

  /** The direction as a persistable (dim, v_u) frame — the snapshot
    * STATE a drift monitor stores next to the corpus (the IvfIndex
    * persistence contract applied to the health check): compute once per
    * snapshot, write parquet, and later batches compare against the
    * stored reference without recomputing it. Integer micros round-trip
    * any format exactly — no float drift in the reference itself.
    */
  def directionToDF(spark: org.apache.spark.sql.SparkSession,
                    v: Array[Long]): DataFrame = {
    import spark.implicits._
    v.zipWithIndex.toSeq.map { case (x, j) => (j.toLong, x) }.toDF("dim", "v_u")
  }

  /** Load a persisted direction; inverse of [[directionToDF]]. */
  def directionFromDF(df: DataFrame): Array[Long] = {
    val rows = df.select(col("dim").cast("int"), col("v_u").cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    require(rows.nonEmpty && rows.map(_._1).toSeq == rows.indices.toSeq,
      s"directionFromDF: dims must be exactly 0..${rows.length - 1}")
    rows.map(_._2)
  }

  /** [[directionDrift]] against a PERSISTED reference direction — the
    * serving form: one power-iteration pass over the new snapshot, zero
    * work on the historical one. */
  def directionDriftAgainst(current: DataFrame, idCol: String, vecCol: String,
                            dim: Int, iters: Int,
                            reference: Array[Long]): DataFrame = {
    require(reference.length == dim,
      s"directionDriftAgainst: reference has ${reference.length} dims, expected $dim")
    val vc = topComponent(current, idCol, vecCol, dim, iters)
    driftRow(current.sparkSession, vc, reference)
  }

  private def driftRow(spark: org.apache.spark.sql.SparkSession,
                       va: Array[Long], vb: Array[Long]): DataFrame = {
    val c = va.zip(vb).map { case (x, y) =>
      BigInteger.valueOf(x).multiply(BigInteger.valueOf(y)) }.reduce(_ add _)
    val na = va.map(x => BigInteger.valueOf(x).pow(2)).reduce(_ add _)
    val nb = vb.map(x => BigInteger.valueOf(x).pow(2)).reduce(_ add _)
    val cos2 = c.pow(2).multiply(Micros).divide(na.multiply(nb))
    import spark.implicits._
    Seq((c.longValueExact(), cos2.longValueExact()))
      .toDF("dot", "cos2_ppm")
  }

  private val Micros = BigInteger.valueOf(1000000L)

  /** Sign-explicit integer division: sign(g)·(|g| div d) — the
    * [[graft.operators.Regression]] engine-independent quotient. */
  private def sdiv(g: BigInteger, d: BigInteger): Long = {
    val q = g.abs.divide(d).longValueExact()
    if (g.signum() < 0) -q else q
  }
}
