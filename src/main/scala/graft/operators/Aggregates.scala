package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operators beyond plain groupBy/agg.
  *
  * Reference shapes: share-of-total via scalar subquery in SELECT
  * (`redshift-etl-notebook.ipynb` cells 41/47), nested distinct-then-count
  * histograms (cells 49/51), top-k (cells 47/49).
  */
object Aggregates {

  /** Share-of-total per group. Instead of a per-row scalar subquery we use
    * an empty-frame window sum over the aggregated (small) result — the
    * total is computed from the already-reduced groups, so the base table
    * is scanned once and only group-cardinality rows flow into the window.
    */
  def shareOfTotal(df: DataFrame, groupCols: Seq[String],
                   countName: String = "cnt", shareName: String = "share"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grouped = df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as(countName))
    grouped.withColumn(
      shareName,
      round(col(countName).cast("double") / sum(col(countName)).over(Window.partitionBy()), 6))
  }

  /** Two-level aggregation: count distinct `distinctCol` per `keyCol`, then
    * histogram of that count. Equivalent to the reference's nested
    * `GROUP BY reviewer_id, city` -> count -> `GROUP BY cities_visited`
    * (cell 51). Both levels are partial-aggregated map-side by Catalyst.
    */
  def distinctCountHistogram(df: DataFrame, keyCol: String, distinctCol: String,
                             nName: String = "n_distinct",
                             cntName: String = "n_keys"): DataFrame =
    df.groupBy(keyCol)
      .agg(countDistinct(col(distinctCol)).as(nName))
      .groupBy(nName)
      .agg(count(lit(1)).as(cntName))

  /** Top-k by a measure: Catalyst plans sort+limit as TakeOrderedAndProject
    * (per-partition top-k then merge on driver — no global sort shuffle).
    */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)
}
