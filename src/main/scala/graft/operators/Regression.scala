package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine model fitting for quality gating, in FIXED-POINT integer
  * arithmetic so the trained weights are bit-identical on any engine,
  * any partitioning, any environment — the property float GD cannot
  * give (float partial sums reorder under shuffle and the fitted model
  * flaps; a model that gates terabytes of training data must not).
  *
  * Model: y ≈ w0 + w1·(x − x̄), weights in micro-units (1e-6), centered
  * x so the Jacobi update decouples intercept and slope. Per iteration:
  *
  *   g0 = Σ resid_u            w0 ← w0 − ⌊g0 / n⌋*
  *   g1 = Σ resid_u·xc         w1 ← w1 − ⌊g1 / Σxc²⌋*
  *
  * (* sign-explicit truncation: sign(g)·(|g| div d) — Spark `div`
  * truncates toward zero while other engines floor, so negatives are
  * routed through magnitudes to make the quotient engine-independent.)
  *
  * This is coordinate-normalized gradient descent; on centered data the
  * cross term Σxc is ~0, so it converges to the OLS fit in 2–3
  * iterations. Everything is +, ×, and integer division — exact, and
  * replayable in plain SQL (the q88 oracle unrolls the iterations as
  * chained CTEs with HUGEINT sums).
  *
  * Scale shape: each iteration is ONE narrow aggregate (map-side partial
  * sums into a single row); no data-row shuffle, no feature matrix
  * materialization, and the driver holds two longs. Sums run as
  * DECIMAL(38,0), so a 10¹¹-row corpus cannot silently wrap a BIGINT
  * partial. The reference has no in-engine training; this extends its
  * quality-score stage (process_reviews.py heuristics) with a fitted
  * gate.
  */
object Regression {

  /** One fitted iteration trail row. */
  final case class FitStep(iter: Int, w0_u: Long, w1_u: Long)

  /** Fit y ≈ w0 + w1·(x − x̄) in micro-unit fixed point; returns the
    * per-iteration weight trail plus the centering constant. `df` is
    * scanned `iters + 1` times (one stats pass + one narrow aggregate
    * per iteration); x and y must be integral columns.
    */
  def fitLinearMicros(df: DataFrame, xCol: String, yCol: String,
                      iters: Int): (Seq[FitStep], Long) = {
    require(iters > 0, s"fitLinearMicros: iters must be positive, got $iters")
    val base = df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))

    val stats = base.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx")).head()
    val n = stats.getLong(0)
    require(n > 1, s"fitLinearMicros: need at least 2 rows, got $n")
    val xbar = stats.getDecimal(1).toBigInteger.longValueExact() / n // both positive: floor

    val dc = base.select((col("x") - lit(xbar)).as("xc"), col("y"))
    val sxx = dc.agg(sum((col("xc") * col("xc")).cast("decimal(38,0)")).as("sxx"))
      .head().getDecimal(0).toBigInteger.longValueExact()
    require(sxx > 0, "fitLinearMicros: x is constant, slope undefined")

    var w0 = 0L; var w1 = 0L
    val trail = (1 to iters).map { it =>
      val resid = lit(w0) + lit(w1) * col("xc") - col("y") * lit(1000000L)
      val g = dc.agg(
        sum(resid.cast("decimal(38,0)")).as("g0"),
        sum((resid * col("xc")).cast("decimal(38,0)")).as("g1")).head()
      val g0 = g.getDecimal(0).toBigInteger
      val g1 = g.getDecimal(1).toBigInteger
      w0 -= sdivLong(g0, n)
      w1 -= sdivLong(g1, sxx)
      FitStep(it, w0, w1)
    }
    (trail, xbar)
  }

  /** Driver-side twin of the SQL sdiv: sign(g)·(|g| div d). */
  private def sdivLong(g: java.math.BigInteger, d: Long): Long = {
    val q = g.abs.divide(java.math.BigInteger.valueOf(d)).longValueExact()
    if (g.signum() < 0) -q else q
  }

  /** The weight trail as a DataFrame (the q88 surface). */
  def fitTrail(df: DataFrame, xCol: String, yCol: String, iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    fitLinearMicros(df, xCol, yCol, iters)._1.toDF()
  }

  /** Score every row with the fitted model and gate on relative
    * residual: keep iff |resid_u| · tolDenom ≤ y·10⁶ (residual within
    * 1/tolDenom of the label). Pure projection over the scan — the model
    * is three literals, so the gate is codegen'd and shuffle-free.
    */
  def residualGate(df: DataFrame, xCol: String, yCol: String,
                   iters: Int, tolDenom: Long): DataFrame = {
    require(tolDenom > 0, s"residualGate: tolDenom must be positive, got $tolDenom")
    val (trail, xbar) = fitLinearMicros(df, xCol, yCol, iters)
    val last = trail.last
    val pred = lit(last.w0_u) + lit(last.w1_u) * (col(xCol).cast("long") - lit(xbar))
    df.select(col("*"))
      .withColumn("pred_u", pred)
      .withColumn("resid_u", pred - col(yCol).cast("long") * lit(1000000L))
      .withColumn("keep", abs(col("resid_u")) * lit(tolDenom) <= col(yCol).cast("long") * lit(1000000L))
  }

  /** Per-GROUP closed-form OLS — the distributed complement of
    * [[fitLinearMicros]] (which is one GLOBAL model with a driver
    * readout per iteration; fitting a model per source/language/segment
    * that way would serialize on the driver). Closed form needs only
    * the five classical sums, so the whole fit is ONE map-side-
    * combinable aggregation per group and a projection:
    *
    *   slope_u     = sdiv((n·Σxy − Σx·Σy)·10⁶, n·Σxx − (Σx)²)
    *   intercept_u = sdiv(Σy·10⁶ − slope_u·Σx, n)
    *
    * (micro-units; sdiv = sign(a)·(|a| div b), the engine-independent
    * truncation of the file header). Sums and products run in
    * DECIMAL(38,0) — a BIGINT Σxy wraps at ~10¹² rows of 10³-scale
    * features, exactly the silent-corruption class the q121 fix
    * removed. Degenerate groups (n < 2, or constant x → zero
    * denominator) yield NULL slope/intercept rather than a divide
    * error or a fabricated fit — flagged, not invented.
    *
    * Overflow bound, enforced loudly: d38 moves the wrap threshold, it
    * does not remove it — `(n·Σxy − Σx·Σy)·10⁶` stays inside 38 digits
    * only while `n · max|x| · max|y| ≲ 10³¹·⁵` (e.g. 10¹⁵ rows of
    * 10⁸-scale features). Past it, Spark's non-ANSI decimal arithmetic
    * returns NULL — which would be indistinguishable from the
    * degenerate-group NULL verdict — so a NULL `__den`/`__num` raises
    * instead of reporting a silently-wrong "no fit". Null-polluted
    * features are guarded SEPARATELY and loudly: `sum()` skips nulls
    * while `count(*)` doesn't, so a group with partial-null x/y would
    * otherwise desynchronize n from the moments and fit a wrong line
    * with no error — any group where count(x)/count(y) disagrees with
    * the row count raises before fitting.
    *
    * Use: per-domain trend monitoring ("is doc length drifting with
    * time in THIS source?"), per-segment calibration lines, anywhere
    * one global q88 fit would average away the signal.
    *
    * Probe-backed (Scratch, r9): 5.1 s at 1M rows, 17.0 s at 10M rows
    * (1000 groups) — one map-side-combinable aggregation whose shuffle
    * is 1000 moment rows; the 3.3x wall at 10x rows is the per-row
    * DECIMAL(38,0) multiply cost in the partial aggregate, the price of
    * the overflow-safe moments (a double-moment variant would be faster
    * and silently wrong at scale).
    */
  def fitLinearByGroup(df: DataFrame, groupCols: Seq[String],
                       xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "fitLinearByGroup: need at least one group column")
    val d2 = "decimal(38,0)"
    val x = col(xCol).cast("long").cast(d2)
    val y = col(yCol).cast("long").cast(d2)
    val agged = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(d2).as("__n"),
        count(x).cast(d2).as("__nx"), count(y).cast(d2).as("__ny"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"))
    val out = agged
      .withColumn("__den", expr("__n * __sxx - __sx * __sx"))
      .withColumn("__num", expr("(__n * __sxy - __sx * __sy) * 1000000"))
      // null-pollution guard: sum() SKIPS nulls while count(*) doesn't,
      // so a group with partial-null x/y would desynchronize __n from
      // the moments and fit a silently wrong line — raise instead (a
      // group where EVERY row is null would otherwise slip past the
      // moment-null check below the same way)
      .withColumn("slope_u", when(
        col("__nx") =!= col("__n") || col("__ny") =!= col("__n"),
        raise_error(lit("Regression.fitLinearByGroup: null feature " +
          "values in a group — gate nulls before fitting")))
      // overflow guard (see scaladoc): with nulls excluded above, a NULL
      // moment product here is decimal overflow, never degeneracy —
      // degenerate groups produce __den = 0, not NULL
      .when(col("__den").isNull || col("__num").isNull,
        raise_error(lit("Regression.fitLinearByGroup: decimal(38,0) " +
          "overflow in group moments — rescale x/y before fitting")))
        .otherwise(when(col("__den") > 0,
          expr("""case when __num >= 0 then __num div __den
                 |else -((-__num) div __den) end""".stripMargin))))
      .withColumn("__bnum",
        expr("__sy * 1000000 - cast(slope_u as decimal(38,0)) * __sx"))
      .withColumn("intercept_u", when(col("slope_u").isNotNull,
        expr("""case when __bnum >= 0 then __bnum div __n
               |else -((-__bnum) div __n) end""".stripMargin)))
    out.select(groupCols.map(col) ++ Seq(
        col("__n").cast("long").as("n"),
        col("slope_u"), col("intercept_u")): _*)
  }
}
