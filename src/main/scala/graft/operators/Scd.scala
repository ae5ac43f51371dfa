package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension (SCD2) maintenance: turn a changelog
  * or a sequence of snapshots into per-key validity intervals
  * `[valid_from, valid_to)` with a monotone version number — the standard
  * warehouse shape for "what was this entity's attribute at time t", and
  * the batch analog of the reference's upsert staging step (the reference
  * overwrites rows on re-ingest, airbnb-etl-airflow.py:351-420; SCD2 is
  * that merge with history kept instead of discarded).
  *
  * Scale shape: ONE hash shuffle by key, then every run boundary, version
  * number, interval end, and run length comes from window functions over
  * that single partitioning — no groupBy on (key, version) (which would
  * re-shuffle: hash(key, version) does not co-locate with hash(key)), no
  * self-join of runs to find successors. Per-key state is a sort over
  * that key's rows only, so skew follows the per-key event count, not
  * the key count.
  */
object Scd {

  /** Collapse a changelog into SCD2 intervals: one output row per maximal
    * run of consecutive identical `attrCol` values per key (gaps-and-
    * islands), ordered by (`tsCol`, `tieCol`) — the tie column makes run
    * boundaries deterministic under equal timestamps.
    *
    * Output: key, attr, valid_from (run's first event time), valid_to
    * (next run's first event time; null while current), version (1-based
    * per key), n_events (rows in the run), is_current.
    *
    * All derived in one window partitioning:
    *  - changed   = 1 on the first row of each run (lag is null/different)
    *  - version   = running sum of `changed`
    *  - valid_to  = min event time among STRICTLY LATER change rows
    *  - n_events  = next change's row_number - own row_number (run length
    *    without a per-run aggregate)
    * then `filter(changed = 1)` keeps exactly the run-start rows.
    */
  def scd2FromChangelog(log: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, attrCol: String): DataFrame = {
    val key = col(keyCol); val ts = col(tsCol); val tie = col(tieCol)
    val attr = col(attrCol)
    val pk = Window.partitionBy(key).orderBy(ts, tie)
    val future = pk.rowsBetween(1, Window.unboundedFollowing)
    val past = pk.rowsBetween(Window.unboundedPreceding, 0)

    // Run boundary is null-safe (IS DISTINCT FROM): a NULL attr following
    // a non-NULL one starts a run and NULL-after-NULL continues one —
    // `=!=` would yield NULL for both. lag() cannot distinguish "no
    // previous row" from "previous attr was NULL", so the first row is
    // pinned by row_number, not by prev.isNull.
    val prev = lag(attr, 1).over(pk)
    val flagged = log
      .withColumn("__rn", row_number().over(pk))
      .withColumn("__changed",
        when(col("__rn") === 1 || !(prev <=> attr), 1).otherwise(0))
    val changeTs = when(col("__changed") === 1, ts)
    val changeRn = when(col("__changed") === 1, col("__rn"))
    flagged
      .withColumn("version", sum(col("__changed")).over(past).cast("long"))
      .withColumn("valid_to", min(changeTs).over(future))
      .withColumn("__next_rn", min(changeRn).over(future))
      .withColumn("__n_rows", count(lit(1)).over(pk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("__changed") === 1)
      .select(key, attr,
        ts.as("valid_from"),
        col("valid_to"),
        col("version"),
        (coalesce(col("__next_rn"), col("__n_rows") + 1) - col("__rn")).cast("long").as("n_events"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Apply a full snapshot to an existing SCD2 dimension at time
    * `asOfTs`: rows whose current attr differs from the snapshot close
    * (valid_to = asOf) and get a new open version; unseen keys insert at
    * version 1; snapshot-absent keys close without replacement
    * (soft delete). History rows pass through untouched.
    *
    * Both inputs shuffle once on the key; the dimension's closed-history
    * rows bypass the join entirely (union of a filter — at 100 TB history
    * dwarfs the current slice, so joining only `is_current` rows is the
    * difference between touching one version per key and touching all of
    * them).
    */
  def applySnapshot(dim: DataFrame, snapshot: DataFrame, keyCol: String,
                    attrCol: String, asOfTs: java.sql.Timestamp): DataFrame = {
    val history = dim.filter(!col("is_current"))
    // Side presence in the full_outer join travels as explicit markers,
    // never inferred from attr nullability — a dimension or snapshot row
    // whose attr is legitimately NULL is still present, and all attr
    // comparisons are null-safe (<=>): NULL->v closes and reopens, v->NULL
    // is an update to NULL (not a soft delete), NULL->NULL is unchanged.
    val current = dim.filter(col("is_current")).withColumn("__in_dim", lit(true))
    val snap = snapshot
      .select(col(keyCol), col(attrCol).as("__snap_attr"), lit(true).as("__in_snap"))
    val asOf = lit(asOfTs)

    val joined = current.join(snap, Seq(keyCol), "full_outer")
      .withColumn("__in_dim", coalesce(col("__in_dim"), lit(false)))
      .withColumn("__in_snap", coalesce(col("__in_snap"), lit(false)))
    val unchanged = col("__in_snap") && (col("__snap_attr") <=> col(attrCol))
    // unchanged current rows stay open; changed/deleted ones close
    val kept = joined.filter(col("__in_dim"))
      .select(col(keyCol), col(attrCol), col("valid_from"),
        when(!unchanged, asOf).otherwise(col("valid_to")).as("valid_to"),
        col("version"), col("n_events"),
        unchanged.as("is_current"))
    // changed keys and brand-new keys open a fresh version
    val opened = joined
      .filter(col("__in_snap") &&
        (!col("__in_dim") || !(col(attrCol) <=> col("__snap_attr"))))
      .select(col(keyCol), col("__snap_attr").as(attrCol),
        asOf.as("valid_from"),
        lit(null).cast(kept.schema("valid_to").dataType).as("valid_to"),
        (coalesce(col("version"), lit(0L)) + 1L).as("version"),
        lit(1L).as("n_events"),
        lit(true).as("is_current"))
    history.select(kept.columns.map(col): _*)
      .unionByName(kept)
      .unionByName(opened)
  }
}
