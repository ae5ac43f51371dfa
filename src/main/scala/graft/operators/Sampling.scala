package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * Sampling for data mixing must be REPRODUCIBLE (the same corpus snapshot
  * must yield the same sample on every run and every cluster size) and
  * cheap. Both operators here derive per-row pseudo-randomness from a
  * multiplicative id-hash kept overflow-free in 63 bits
  * (`(id % 1e9+7) * 2654435761 % 2^32` — the same SQL-replayable mix the
  * IVF centroid selection uses) instead of `rand()`, which would resample
  * on every retry/stage-replay (the round-1 salted-join lesson).
  */
object Sampling {

  private def idHash(idCol: String): Column =
    graft.functions.HashFunctions.idHash32(col(idCol))

  /** Per-group quota sample: the `quota` rows of each group with the
    * smallest (hash, id) — a deterministic stratified downsample (e.g.
    * per-language balancing of a training mix). Plans as a windowed
    * rank with a pushed-down group limit (WindowGroupLimit): one shuffle
    * on the group key, no global sort.
    */
  def quotaPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                    quota: Int): DataFrame = {
    require(quota > 0, s"quotaPerGroup: quota must be positive, got $quota")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(idHash(idCol), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Fixed-rate Bernoulli-style sample: keep rows whose id-hash falls in
    * the first `rate` fraction of the 32-bit hash space. Narrow filter,
    * no shuffle, reproducible across runs and retries.
    */
  def sampleByRate(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"sampleByRate: rate in [0,1], got $rate")
    df.filter(idHash(idCol) < lit((rate * 4294967296.0).toLong))
  }
}
