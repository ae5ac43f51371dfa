package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
  * [[graft.GraftSession]]) splits oversized sort-merge partitions at
  * runtime and is the first line of defense. Salting is the explicit form
  * for when AQE can't help: aggregations on skewed keys, or joins where
  * one hot key dwarfs everything (a null-heavy FK, a celebrity user).
  *
  * `saltedJoin` replicates the RIGHT side `saltFactor` times and splits
  * the LEFT side's hot keys across `saltFactor` sub-keys, so one hot key
  * occupies `saltFactor` shuffle partitions instead of one straggler task.
  * Right-side replication costs `saltFactor` x |right|, so use with a
  * dimension-sized right side and a fact-sized, skewed left side.
  */
object Skew {

  /** The salt must be DETERMINISTIC per row (`rand()` is positional: a
    * stage retry after a fetch failure would re-deal salts and silently
    * drop/duplicate joined rows). Hashing the whole row keeps retries
    * stable; rows identical in every column share a salt, which only
    * matters if the hot key's rows are all byte-identical.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.toIndexedSeq.map(col): _*), lit(saltFactor)).cast("int"))
    val replicated = right
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-proof aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. For Catalyst's built-in aggregates the
    * partial/final split already does this (map-side combine), so this is
    * only needed for aggregates without partial pushdown (e.g. exact
    * `collect_list` on a hot key) — demonstrated with count.
    */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int = 8): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(saltFactor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").cast("long").as("n"))
}
