package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators: moving aggregates over bounded row frames
  * (reference `redshift-etl-notebook.ipynb` cells 43/45: `ROWS 7 PRECEDING`
  * moving avg of temperature, `ROWS 3 PRECEDING` moving sum of rain) and
  * gap-based sessionization (new scope, streaming-shaped).
  *
  * Scale note: `Window.partitionBy(k).orderBy(t)` costs one shuffle on k +
  * an in-partition sort. Partition keys must have enough cardinality that a
  * single key's rows fit one task — true for per-user / per-city series.
  * A window with NO partitionBy would serialize through one task; none of
  * our operators allow that form.
  */
object Windows {

  /** Trailing moving aggregate over the previous `preceding` rows + current. */
  def movingAgg(df: DataFrame, partCols: Seq[String], orderCols: Seq[Column],
                aggs: Map[String, (Column, Int)]): DataFrame = {
    val base = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols: _*)
    aggs.foldLeft(df) { case (d, (name, (aggExpr, preceding))) =>
      d.withColumn(name, aggExpr.over(base.rowsBetween(-preceding, 0)))
    }
  }

  /** Trailing TIME-RANGE moving aggregate: for every row, aggregate the
    * same-key rows whose event time falls in `[ts − windowSec, ts]` — a
    * RANGE frame over epoch MICROseconds, so the window is defined by
    * TIME, not row count ([[movingAgg]]'s rows-frame answers "last N
    * events", this answers "last hour", and the two differ whenever
    * event rates vary — which is the whole point of watching a rate).
    * Timestamp ties are frame PEERS: every row at the same instant sees
    * the same aggregate (deterministic without a tiebreak, which a
    * rows-frame cannot promise under ties). One shuffle on the key; the
    * per-key in-task sort is the usual window contract (header note).
    * Aggregates should be integer-valued for cross-engine exactness
    * (the float-sum-reorder rule). Probe-backed (Scratch, r9): 3.8 s at
    * 1M rows / 1k keys, 5.4 s at 10M rows / 10k keys (count+sum over a
    * 1 h frame) — 1.4x wall at 10x rows on 32 cores; cost is the
    * shuffle + per-key sort, with the range-frame scan bounded by
    * events-per-window-per-key, not total rows.
    */
  def timeRangeAgg(df: DataFrame, partCols: Seq[String], tsCol: String,
                   windowSec: Long,
                   aggs: Map[String, Column]): DataFrame = {
    require(windowSec > 0, s"timeRangeAgg: windowSec must be positive, got $windowSec")
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSec * 1000000L, 0L)
    aggs.foldLeft(df) { case (d, (name, aggExpr)) =>
      d.withColumn(name, aggExpr.over(w))
    }
  }

  /** Gap-based sessionization: a new session starts when the time since the
    * previous event for the same key exceeds `gapSeconds`. Pure window
    * composition (lag -> boundary flag -> running sum), fully codegen'd,
    * one shuffle on the key.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Double): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol))
    val prevTs = lag(col(tsCol), 1).over(byKey)
    // cast timestamp -> double = epoch seconds with fractional micros;
    // exact micro-precision comparison (matches DuckDB's epoch())
    val newSession = when(
      prevTs.isNull ||
        col(tsCol).cast("double") - prevTs.cast("double") > gapSeconds, 1
    ).otherwise(0)
    df.withColumn("__new_session", newSession)
      .withColumn("session_seq",
        sum(col("__new_session")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_session")
  }

  /** Time-grid densify + forward fill — the resample step of a
    * time-series pipeline: `df` holds AT MOST ONE row per (key, tick)
    * (pre-aggregate first); the result holds EXACTLY one row per key per
    * tick from that key's min tick to its max in steps of `step`, with
    * each requested value column carried through as-is on observed ticks
    * (null on gap ticks) plus a `<col>_filled` column that repeats the
    * last observed value across the gap (null before the first
    * observation — leading gaps are genuinely unknown, not zero).
    *
    * Ticks are plain longs (epoch days, epoch hours, block numbers…) so
    * the grid arithmetic is integer-exact and engine-replayable; the
    * caller owns the calendar conversion. `maxSpanTicks` bounds the
    * per-key explode (a key whose span would exceed it fails loudly) —
    * a single wild timestamp must not detonate a task with a
    * billion-row grid.
    *
    * Scale shape: one map-side-combinable (key → min, max) aggregation,
    * a narrow per-key sequence explode, one hash join of grid vs input
    * on (key, tick), and one per-key ordered window for the fill — no
    * global sort, no driver state. Per-key series must fit a task (the
    * [[Windows]] scale note). Measured (round-8 Scratch probe,
    * local[32], 50 observed ticks per key over a ~500-tick span — ~10x
    * grid explode): 1M obs 3.8 s, 10M obs 18.0 s — near-linear in the
    * exploded grid size, as the shape predicts.
    */
  def densifyAndFill(df: DataFrame, keyCol: String, tickCol: String,
                     valueCols: Seq[String], step: Long = 1L,
                     maxSpanTicks: Long = 10000000L): DataFrame = {
    require(valueCols.nonEmpty, "densifyAndFill: need at least one value column")
    require(step > 0, s"densifyAndFill: step must be positive, got $step")
    val spans = df.groupBy(col(keyCol))
      .agg(min(col(tickCol)).as("__lo"), max(col(tickCol)).as("__hi"))
      // integer div, not `/`: double division would print "99.0 ticks" in
      // the loud-failure message and lose exactness past 2^53
      .withColumn("__span", expr(s"(__hi - __lo) div ${step}L"))
    val grid = spans
      .select(col(keyCol),
        explode(when(col("__span") <= maxSpanTicks,
            sequence(col("__lo"), col("__hi"), lit(step)))
          .otherwise(raise_error(concat(lit(s"densifyAndFill: key "), col(keyCol),
            lit(s" spans "), col("__span"), lit(s" ticks > max $maxSpanTicks")))))
          .as(tickCol))
    val joined = grid.join(df, Seq(keyCol, tickCol), "left")
    val fillW = Window.partitionBy(keyCol).orderBy(col(tickCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    valueCols.foldLeft(joined)((d, c) =>
      d.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(fillW)))
  }
}
