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

  /** Share-of-total per group. The base table is scanned and reduced once;
    * the grand total is re-aggregated from the (group-cardinality) result
    * and broadcast back as a 1-row cross join. An unpartitioned window
    * (`sum over ()`) would funnel all groups through a single task —
    * harmless at 5 groups, a bottleneck at high-cardinality group keys.
    */
  def shareOfTotal(df: DataFrame, groupCols: Seq[String],
                   countName: String = "cnt", shareName: String = "share"): DataFrame = {
    val grouped = df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as(countName))
    val total = grouped.agg(sum(col(countName)).as("__total"))
    grouped.crossJoin(broadcast(total))
      .withColumn(shareName, round(col(countName).cast("double") / col("__total"), 6))
      .drop("__total")
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
