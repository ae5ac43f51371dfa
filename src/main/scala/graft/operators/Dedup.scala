package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication / latest-record-per-key operators.
  *
  * The reference's workhorse pattern (used 4x) is
  * `last(ts).over(unbounded window) -> filter(ts == latest) ->
  * dropDuplicates(key)` (reference `apps/process_listings_hosts.py:121-125`,
  * `apps/process_reviewers.py:85-92`). That shape is nondeterministic on
  * timestamp ties; we use `row_number` over an explicit total order instead —
  * one window pass, one shuffle on the key, deterministic winner. At 100 TB
  * the single hash-partition shuffle on the dedup key is the floor for this
  * semantics; no second `dropDuplicates` exchange is needed.
  */
object Dedup {

  /** Keep exactly one row per key: the first under `order`. A last-resort
    * whole-row-hash tiebreak guarantees a deterministic winner even when
    * the caller's order doesn't separate rows (e.g. duplicate (key, ts)
    * rows within one batch) — remaining ties are between byte-identical
    * rows, where the choice is immaterial.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val rowHash = xxhash64(df.columns.toIndexedSeq.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order :+ rowHash.asc: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact duplicate removal on a set of columns, deterministic winner =
    * min of `idCol`. Equivalent semantics to `dropDuplicates(cols)` but
    * with a defined survivor, so results are oracle-comparable.
    */
  def exactDedup(df: DataFrame, cols: Seq[String], idCol: String): DataFrame =
    latestPerKey(df, cols, Seq(col(idCol).asc))

  /** Incremental merge: `state ∪ delta`, newest wins per key; on a full
    * tie under `order` (the boundary-date re-ingest: same key, same
    * timestamp) the DELTA row wins deterministically — the delta was
    * re-derived against current inputs, so it is the fresher version.
    * Reference semantics: union + dropDuplicates(pk)
    * (`apps/process_reviews.py:146-148`), which keeps an arbitrary row.
    * Uses `unionByName(allowMissingColumns)` instead of the reference's
    * fragile sort-columns-then-positional-union
    * (`apps/process_listings_hosts.py:97,111`).
    */
  def mergeIncremental(state: DataFrame, delta: DataFrame, keys: Seq[String],
                       order: Seq[Column]): DataFrame =
    latestPerKey(
      state.withColumn("__prio", lit(0))
        .unionByName(delta.withColumn("__prio", lit(1)), allowMissingColumns = true),
      keys, order :+ col("__prio").desc)
      .drop("__prio")
}
