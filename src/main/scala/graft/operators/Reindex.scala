package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Contiguous global id assignment — `row_number() OVER (ORDER BY ...)`
  * semantics without its scale trap: an empty-partition window moves the
  * ENTIRE dataset through one task (Spark plans a single-partition
  * Exchange for a global window), which is the canonical way to OOM a
  * reindexing job at corpus scale.
  *
  * Shape here: range-repartition on the order key (a real shuffle, but a
  * parallel one), sort within partitions, then one lightweight count job
  * for per-partition offsets and a zip with the local index — the only
  * RDD use in the engine outside the multimodal batch codec, and exactly
  * the "genuine per-partition imperative logic" case the design rules
  * reserve RDDs for: the local index is inherently positional state the
  * DataFrame API cannot express without the degenerate window.
  *
  * Determinism: `orderCols` must be a total order (include a unique
  * tiebreak column); range boundaries are sampled with Spark's fixed
  * seed, so the same input yields the same ids run over run. The output
  * matches `row_number() OVER (ORDER BY orderCols) - 1` exactly — which
  * is what the q60 oracle replays.
  */
object Reindex {

  /** Adds `idColName` (0-based contiguous Long in `orderCols` order). */
  def contiguousIds(df: DataFrame, orderCols: Seq[Column],
                    idColName: String = "new_id",
                    numPartitions: Option[Int] = None): DataFrame = {
    require(orderCols.nonEmpty, "contiguousIds: need at least one order column")
    require(!df.columns.contains(idColName),
      s"contiguousIds: column '$idColName' already exists")
    val spark = df.sparkSession
    val sorted = numPartitions
      .map(n => df.repartitionByRange(n, orderCols: _*))
      .getOrElse(df.repartitionByRange(orderCols: _*))
      .sortWithinPartitions(orderCols: _*)
    // zipWithIndex = one count job for partition sizes (offsets), then a
    // narrow map attaching offset + local position; no data converges on
    // a single task at any point.
    val zipped = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(zipped,
      sorted.schema.add(StructField(idColName, LongType, nullable = false)))
  }
}
