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

  /** Watermarked stream-stream time-interval join — the streaming form of
    * [[graft.operators.TemporalJoins.rangeJoin]]: match right rows of the
    * same key with `rightTs` in `[leftTs + lowerSec, leftTs + upperSec]`.
    * The watermark plus the two-sided time bound is exactly what lets
    * Spark expire join state (rows outside the interval horizon are
    * dropped from the state store), so state stays bounded no matter how
    * long the streams run. `leftTs` and `rightTs` must be distinct column
    * names; `keyCol` must exist on both sides.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String, watermark: String,
                   lowerSec: Long, upperSec: Long): DataFrame = {
    require(upperSec >= lowerSec, "intervalJoin: upperSec must be >= lowerSec")
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r, expr(
        s"""l.`$keyCol` = r.`$keyCol`
           |AND r.`$rightTs` >= l.`$leftTs` + INTERVAL '$lowerSec' SECOND
           |AND r.`$rightTs` <= l.`$leftTs` + INTERVAL '$upperSec' SECOND""".stripMargin))
      .drop(col(s"r.`$keyCol`"))
  }

  /** Stateful streaming as-of enrichment — the streaming form of
    * [[graft.operators.TemporalJoins.asofBackward]] via
    * `flatMapGroupsWithState`: per key, state holds the latest right-side
    * event seen so far; each left-side event emits the right id whose
    * timestamp most recently preceded it (None when no prior right event).
    *
    * Event-time correctness holds within a micro-batch (the group's rows
    * are processed in (ts, side, id) order) and across batches for
    * in-order arrival; a right event arriving AFTER a left event it
    * should have matched is the classic stateful-streaming limitation —
    * the batch operator is the replayable source of truth, this is the
    * low-latency approximation (same contract as any online feature
    * join).
    */
  def asofLatestEnrich(events: org.apache.spark.sql.Dataset[AsofEvent])
      : org.apache.spark.sql.Dataset[AsofMatched] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    implicit val stateEnc: org.apache.spark.sql.Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val outEnc: org.apache.spark.sql.Encoder[AsofMatched] =
      Encoders.product[AsofMatched]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    events.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long), AsofMatched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          var latest: Option[(Long, Long)] = state.getOption // (tsMillis, rightId)
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofMatched]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.side, e.id)).foreach { e =>
            if (e.side == 0) {
              if (latest.forall(_._1 <= e.ts.getTime)) latest = Some((e.ts.getTime, e.id))
            } else {
              out += AsofMatched(key, e.id, latest.collect {
                case (t, rid) if t <= e.ts.getTime => rid
              })
            }
          }
          latest.foreach(state.update)
          out.iterator
      }
  }

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

/** side 0 = right (reference) event, side 1 = left (to-enrich) event. */
case class AsofEvent(key: String, ts: java.sql.Timestamp, side: Int, id: Long)
case class AsofMatched(key: String, id: Long, matchedId: Option[Long])
