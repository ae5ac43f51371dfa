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
}
