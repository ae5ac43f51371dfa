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

  /** Per-iteration direction trail: (iter, dim, v_u) with v_u in micros,
    * max|v_u| = 1e6 per iteration; iter 0 is the deterministic init.
    * Rows with a null vector or a wrong-dimension vector are excluded
    * (they have no coordinates to contribute). `idCol` keys the per-row
    * dot — any unique row id.
    */
  def topComponentTrail(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, iters: Int): DataFrame = {
    require(dim > 0 && dim <= 4096, s"topComponentTrail: dim in (0, 4096], got $dim")
    require(iters >= 1 && iters <= 10, s"topComponentTrail: iters in [1, 10], got $iters")
    val spark = df.sparkSession
    import spark.implicits._

    // exploded micro-quantized coordinates, keyed by the caller's row
    // id; persisted — every iteration and the init scan read it
    val el = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("__r"), posexplode(col(vecCol)).as(Seq("j", "x")))
      .select(col("__r"), col("j"),
        floor(col("x").cast("double") * lit(1000000.0)).cast("long").as("a"))
      .persist()

    // deterministic init: the highest-energy coordinate (lowest index on
    // ties) — a bounded d-row readout
    val energy = el.groupBy(col("j"))
      .agg(sum((col("a") * col("a")).cast("decimal(38,0)")).as("e"))
      .collect().map(r => (r.getInt(0), r.getDecimal(1).toBigInteger))
    require(energy.nonEmpty, "topComponentTrail: no valid vectors")
    val j0 = energy.sortBy(_._1).maxBy(_._2)._1 // stable: first max wins
    var v = Array.tabulate(dim)(j => if (j == j0) 1000000L else 0L)

    val trail = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    for (j <- 0 until dim) trail += ((0L, j.toLong, v(j)))

    for (it <- 1 to iters) {
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
      require(m.signum > 0, "topComponentTrail: zero iterate (degenerate corpus)")
      val next = new Array[Long](dim)
      u.foreach { case (j, uj) => next(j) = sdiv(uj.multiply(Micros), m) }
      v = next
      for (j <- 0 until dim) trail += ((it.toLong, j.toLong, v(j)))
    }
    el.unpersist(blocking = false)
    trail.toSeq.toDF("iter", "dim", "v_u")
  }

  private val Micros = BigInteger.valueOf(1000000L)

  /** Sign-explicit integer division: sign(g)·(|g| div d) — the
    * [[graft.operators.Regression]] engine-independent quotient. */
  private def sdiv(g: BigInteger, d: BigInteger): Long = {
    val q = g.abs.divide(d).longValueExact()
    if (g.signum() < 0) -q else q
  }
}
