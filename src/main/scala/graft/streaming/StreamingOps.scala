package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the engine's incremental semantics
  * (SURVEY.md §2.10). The reference is batch-only, but its monthly
  * incremental protocol is watermark-shaped; these are the streaming
  * analogs, applied to a `readStream` DataFrame:
  *
  * | batch (reference)                             | streaming (here)      |
  * | high-watermark delta (`process_reviews:98`)   | `withWatermark`       |
  * | boundary re-ingest + pk dedup (`:146-148`)    | `dedupWithinWatermark`|
  * | monthly Airflow backfill                      | micro-batch trigger   |
  *
  * All are plain transformations — the caller owns `readStream` /
  * `writeStream`, so the same functions compose with any source/sink.
  */
object StreamingOps {

  /** Exactly-once-per-key ingest: drop duplicate `keyCols` rows arriving
    * within the watermark horizon — the streaming form of the reference's
    * boundary-date re-ingest + `dropDuplicates(pk)`.
    */
  def dedupWithinWatermark(stream: DataFrame, tsCol: String,
                           watermark: String, keyCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Event-time tumbling-window aggregation with late-data bound —
    * streaming form of q30_hourly_agg.
    */
  def windowedCounts(stream: DataFrame, tsCol: String, watermark: String,
                     windowLen: String, keyCols: Seq[Column]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen) +: keyCols: _*)
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start") +: keyCols :+ col("n"): _*)
}
