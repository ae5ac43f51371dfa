package graft.similarity

import java.math.BigInteger

import org.apache.spark.sql.DataFrame
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
  *  - per iteration: s_i = Σ_j a_ij v_j (per-row dot against the
  *    broadcast literal v — one narrow aggregate), u_j = Σ_i s_i a_ij
  *    (one d-row aggregate), then v' = u scaled to max|v'| = 1e6;
  *  - fixed `iters` rounds — a replayable profile, not a convergence
  *    loop (the q88 contract). Convergence is geometric in the spectral
  *    gap; 3 iterations pin a dominant direction to ~1e-3.
  *
  * Scale shape: per iteration ONE scan of the exploded (id, dim, a)
  * frame (persisted across iterations) with map-side partial sums into
  * d rows; the driver holds d longs (the literal v) — never a row of
  * data.
  */
object Pca {

  /** Exploded micro-quantized coordinate frame: (__r id, j dim, a
    * micros). Rows with a null vector or a wrong-dimension vector are
    * excluded (they have no coordinates to contribute).
    */
  private def explodedMicros(df: DataFrame, idCol: String, vecCol: String,
                             dim: Int): DataFrame =
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("__r"), posexplode(col(vecCol)).as(Seq("j", "x")))
      .select(col("__r"), col("j"),
        floor(col("x").cast("double") * lit(1000000.0)).cast("long").as("a"))

  /** The power-iteration core over a (pre-persisted) exploded frame:
    * returns iterates v_0..v_iters, each an Array[Long] of micros with
    * max|v| = 1e6. */
  private def iterate(el: DataFrame, dim: Int, iters: Int): Seq[Array[Long]] = {
    // deterministic init: the highest-energy coordinate (lowest index on
    // ties) — a bounded d-row readout
    val energy = el.groupBy(col("j"))
      .agg(sum((col("a") * col("a")).cast("decimal(38,0)")).as("e"))
      .collect().map(r => (r.getInt(0), r.getDecimal(1).toBigInteger))
    require(energy.nonEmpty, "Pca: no valid vectors")
    val j0 = energy.sortBy(_._1).maxBy(_._2)._1 // stable: first max wins
    var v = Array.tabulate(dim)(j => if (j == j0) 1000000L else 0L)
    Seq(v.clone()) ++ (1 to iters).map { _ =>
      val vArr = array(v.map(lit).toIndexedSeq: _*)
      // s_i = row dot v — fits a long with room (d * 1e6 * 1e6 <= 4e15);
      // u_j sums s_i * a_ij in decimal: n * 4e15 * 1e6 passes 63 bits on
      // any real corpus
      val s = el.withColumn("__v", element_at(vArr, col("j") + 1))
        .groupBy(col("__r")).agg(sum(col("a") * col("__v")).as("s"))
      val u = el.join(s, "__r")
        .groupBy(col("j"))
        .agg(sum(col("a").cast("decimal(38,0)") * col("s")).as("u"))
        .collect().map(r => (r.getInt(0), r.getDecimal(1).toBigInteger))
        .sortBy(_._1)
      val m = u.map(_._2.abs).max
      require(m.signum > 0, "Pca: zero iterate (degenerate corpus)")
      val next = new Array[Long](dim)
      u.foreach { case (j, uj) => next(j) = sdiv(uj.multiply(Micros), m) }
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
    val el = explodedMicros(df, idCol, vecCol, dim).persist()
    val vs = iterate(el, dim, iters)
    el.unpersist(blocking = false)
    vs.zipWithIndex.flatMap { case (v, it) =>
      v.zipWithIndex.map { case (x, j) => (it.toLong, j.toLong, x) }
    }.toDF("iter", "dim", "v_u")
  }

  /** The final direction only (micros, max|v| = 1e6). */
  def topComponent(df: DataFrame, idCol: String, vecCol: String,
                   dim: Int, iters: Int): Array[Long] = {
    require(dim > 0 && dim <= 4096, s"topComponent: dim in (0, 4096], got $dim")
    require(iters >= 1 && iters <= 10, s"topComponent: iters in [1, 10], got $iters")
    val el = explodedMicros(df, idCol, vecCol, dim).persist()
    val v = iterate(el, dim, iters).last
    el.unpersist(blocking = false)
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
    * Scale shape: the direction is `iters` bounded aggregations
    * ([[iterate]]); the profile itself is ONE pass over the exploded
    * frame — two narrow per-row aggregations (proj, then residual sum)
    * against the broadcast literal direction. Nothing corpus-sized sits
    * on the driver.
    */
  def allButTopProfile(df: DataFrame, idCol: String, vecCol: String,
                       dim: Int, iters: Int): DataFrame = {
    require(dim > 0 && dim <= 4096, s"allButTopProfile: dim in (0, 4096], got $dim")
    val el = explodedMicros(df, idCol, vecCol, dim).persist()
    val v = iterate(el, dim, iters).last
    val vv = v.map(x => BigInteger.valueOf(x).pow(2)).reduce(_ add _)
    require(vv.signum > 0, "allButTopProfile: zero direction")
    val vArr = array(v.map(lit).toIndexedSeq: _*)
    val proj = el.withColumn("__v", element_at(vArr, col("j") + 1))
      .groupBy(col("__r")).agg(sum(col("a") * col("__v")).as("p"))
    // resid_j = a_j - sign-explicit((p * v_j) div vv): p*v_j passes 63
    // bits (6.4e14 * 1e6), so the quotient runs in DECIMAL(38,0); the
    // result is back in long range (|resid| <= |a| + 1e6-ish)
    val out = el.join(proj, "__r")
      .withColumn("__v", element_at(vArr, col("j") + 1))
      .withColumn("__pv", col("p").cast("decimal(38,0)") * col("__v"))
      .withColumn("__q",
        expr(s"cast(case when __pv < 0 then -((-__pv) div ${vv}) " +
          s"else __pv div ${vv} end as long)"))
      .withColumn("__rj", col("a") - col("__q"))
      .groupBy(col("__r"))
      .agg(max(col("p")).as("proj"), sum(col("__rj") * col("__rj")).as("res_norm2"))
      .select(col("__r").as("id"), col("proj"), col("res_norm2"))
    val materialized = out.localCheckpoint(true)
    el.unpersist(blocking = false)
    materialized
  }

  /** Direction drift between two corpus snapshots: the integer cosine
    * evidence (c = v_a·v_b, cos² in ppm = c²·1e6 div (|v_a|²·|v_b|²)) —
    * sqrt-free so the number is exact and SQL-replayable; the SIGN of c
    * is immaterial (power iteration fixes sign only up to the init).
    * One row: a drift monitor compares cos2_ppm against a floor (1e6 =
    * identical directions; an encoder swap typically craters it).
    */
  def directionDrift(a: DataFrame, b: DataFrame, idCol: String, vecCol: String,
                     dim: Int, iters: Int): DataFrame =
    driftRow(a.sparkSession,
      topComponent(a, idCol, vecCol, dim, iters),
      topComponent(b, idCol, vecCol, dim, iters))

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
