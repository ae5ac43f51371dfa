package graft.operators

import org.apache.spark.sql.DataFrame

/** Size-derived rescue spread for compute-dense projections over
  * degenerate scans (r15 — the Pca r14 partitioning pattern extracted).
  *
  * A single-row-group fixture plans ONE scan task, which serializes any
  * corpus-scale compute stacked on it (token-window hashing, bigram
  * explodes) — so the operators repartition first. Until r15 they spread
  * to `defaultParallelism`, a CORE-tuned constant: at 32 cores every
  * KB-scale consumer ran 32 near-empty tasks per stage, and the checkpoint
  * / shuffle partitioning inherited downstream multiplied that by the
  * stage count (the whole sf0.1 suite measured 12% faster at 8 cores than
  * 32 — bench_runs/20260819T074745Z vs 080031Z). Derive the count from
  * the optimizer's size estimate instead: grow with the data (~4 MB per
  * partition), floor at a few cores for the compute (`floorCap`, capped by
  * the machine), cap at the core count (which also absorbs the
  * defaultSizeInBytes sentinel when a plan has no real stats). Scans that
  * already have at least half the machine's splits are left alone — a real
  * multi-file corpus never pays the probe's shuffle.
  */
object Spread {

  /** Rescue-spread `df` when its scan parallelism is degenerate. The
    * `.rdd.getNumPartitions` probe costs one physical-planning pass of the
    * narrow projection — milliseconds against corpus-scale compute (the
    * SpanDedup.winsOf accounting).
    */
  def forCompute(df: DataFrame, floorCap: Int = 8,
                 bytesPerPartition: Long = 4L * 1024 * 1024): DataFrame = {
    val para = df.sparkSession.sparkContext.defaultParallelism
    val have = df.rdd.getNumPartitions
    if (have >= math.max(para / 2, 2)) df
    else {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val floor = math.min(para, floorCap)
      val k = (bytes / bytesPerPartition + 1).min(BigInt(para)).toInt.max(floor)
      // idempotent: an input already at (or past) the derived count is
      // NOT re-shuffled — operators may compose (a pre-spread wrapper
      // feeding a generic body that also rescues), and a second exchange
      // of the same bytes would undo the first one's win
      if (have >= k) df else df.repartition(k)
    }
  }
}
