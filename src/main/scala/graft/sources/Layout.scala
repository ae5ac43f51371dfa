package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning — the lakehouse
  * Z-ORDER: interleave the bits of two clustering keys into one Morton
  * code and lay rows out in that order, so parquet row-group min/max
  * stats become tight boxes in BOTH dimensions and a selective filter on
  * EITHER key (or both) skips most of the file without reading it.
  * Sorting by (a, b) instead clusters only `a`; filters on `b` alone
  * then read everything.
  *
  * At 100 TB this is the difference between "the filter reached the scan"
  * (plan-level pushdown, which Catalyst already does) and "the scan
  * skipped the data" (layout-level pruning, which only the writer can
  * arrange). ScaleLayoutSpec measures the effect with runtime task
  * metrics: the same box filter reads ~an order of magnitude fewer rows
  * from a z-ordered file than from an insertion-ordered one.
  */
object Layout {

  /** Morton/Z-value of two non-negative keys, `bits` bits each (default
    * 16 -> a 32-bit code). Pure bit arithmetic on BIGINT — composed from
    * codegen'd built-ins and exactly replayable in any engine's SQL.
    * Keys wider than `bits` bits must be range-reduced first (bucketed or
    * shifted): the interleave masks to `bits` to keep the code total.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"zValue: bits in [1,31], got $bits")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** Writes `df` as parquet laid out in z-order of (`colA`, `colB`):
    * range-partitioned then sorted by the Morton code inside each task,
    * with a bounded parquet block size so files carry many small
    * row groups (pruning granularity). The z column itself is not
    * written.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    bits: Int = 16, blockBytes: Long = 1L << 20): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", blockBytes.toString)
      .parquet(path)
}
