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

  /** Gap-based event-time sessionization — streaming form of
    * q29_sessionize, using the built-in `session_window` (sessions close
    * when the watermark passes last-event + gap).
    */
  def sessionAgg(stream: DataFrame, tsCol: String, watermark: String,
                 gap: String, keyCols: Seq[Column]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keyCols: _*)
      .agg(count(lit(1)).as("n_events"))
      .select(keyCols :+ col("session_window.start").as("session_start")
        :+ col("session_window.end").as("session_end") :+ col("n_events"): _*)

  /** Arbitrary keyed state via `mapGroupsWithState` — the escape hatch for
    * semantics the declarative API can't express. Running per-key totals:
    * state = (count, sum) survives across micro-batches.
    */
  def runningTotals(events: org.apache.spark.sql.Dataset[KeyedValue])
      : org.apache.spark.sql.Dataset[KeyTotal] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.GroupStateTimeout
    implicit val stateEnc: org.apache.spark.sql.Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    implicit val outEnc: org.apache.spark.sql.Encoder[KeyTotal] = Encoders.product[KeyTotal]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    events.groupByKey(_.key)
      .mapGroupsWithState[(Long, Double), KeyTotal](GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          val (c0, s0) = state.getOption.getOrElse((0L, 0.0))
          var c = c0; var s = s0
          rows.foreach { r => c += 1; s += r.value }
          state.update((c, s))
          KeyTotal(key, c, s)
      }
  }
}

case class KeyedValue(key: String, value: Double)
case class KeyTotal(key: String, n: Long, total: Double)
