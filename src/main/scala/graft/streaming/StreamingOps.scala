package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

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

  /** Ingest-time corpus-quality monitor: per event-time tumbling window
    * and detected language, the document count, mean composite quality
    * score, count below the accept gate, and total token volume — the
    * streaming form of q21/q35's batch quality profiling, for watching a
    * live crawl degrade (a spam wave shows up as a falling `avg_quality`
    * / rising `n_below_gate` in the affected window, per language).
    *
    * Scale shape: the per-document scoring ([[graft.functions.TextFunctions
    * .qualityScore]], `langId`, `tokenCount`) is one codegen'd projection
    * on the ingest path — no UDFs, no state; the only stateful piece is
    * the windowed aggregation itself, whose state is one row per
    * (window, lang) and expires with the watermark, so state stays
    * bounded no matter how long the stream runs.
    */
  def qualityByWindow(docs: DataFrame, tsCol: String, textCol: String,
                      watermark: String, windowLen: String,
                      gate: Double = 0.5): DataFrame = {
    import graft.functions.TextFunctions
    docs.withWatermark(tsCol, watermark)
      .select(col(tsCol),
        TextFunctions.langId(col(textCol)).as("lang"),
        TextFunctions.qualityScore(col(textCol)).as("__q"),
        TextFunctions.tokenCount(col(textCol)).as("__t"))
      .groupBy(window(col(tsCol), windowLen), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("__q")), 4).as("avg_quality"),
        count_if(col("__q") < gate).as("n_below_gate"),
        sum(col("__t")).as("n_tokens"))
      .select(col("window.start").as("window_start"), col("lang"),
        col("n_docs"), col("avg_quality"), col("n_below_gate"), col("n_tokens"))
  }

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

  /** Streaming near-duplicate flags — the ingest-time form of
    * [[graft.dedup.NearDedup.minhashPairs]] for an LLM data pipeline:
    * each arriving document is checked against the recent corpus and
    * flagged with the id of the first near-dup it matches (None = novel).
    *
    * Shape: each doc fans out to `bands` (band, bucket) keys computed
    * from a MinHash signature over word shingles (same banding math as
    * the batch operator, self-contained Scala so the state function can
    * replay it); `flatMapGroupsWithState` keyed by bucket keeps the last
    * `bucketCap` docs' shingle-hash sets and verifies candidates with
    * EXACT Jaccard — so precision is exact, recall is the usual banding
    * probability, and state per bucket is bounded by construction
    * (cap x shingles-per-doc longs), which is what lets the stream run
    * forever. Within a band, flagged dups are not added to that band's
    * state; a doc flagged in one band can still enter ANOTHER band's
    * state, so `dupOf` is a near-dup EDGE, not necessarily the cluster
    * survivor — for canonical survivors feed the any-match flags into
    * [[graft.dedup.Clusters.connectedComponents]] (batch), or accept
    * first-match attribution for online filtering (a flagged doc is a
    * dup either way). Emits one flag per (doc, band): the caller reduces
    * to per-doc verdicts with any-match — kept separate so this single
    * stateful stage composes under Spark's one-stateful-operator-per-
    * query restriction modes.
    *
    * Cross-batch ordering caveat: same contract as [[asofLatestEnrich]] —
    * within a micro-batch, docs are processed in (ts, docId) order;
    * across batches, arrival order stands in for event order. The batch
    * operator is the replayable source of truth.
    */
  def nearDupFlags(docs: org.apache.spark.sql.Dataset[StreamDoc],
                   shingleLen: Int = 3, k: Int = 16, bands: Int = 4,
                   threshold: Double = 0.5, bucketCap: Int = 64)
      : org.apache.spark.sql.Dataset[NearDupFlag] = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark0 = docs.sparkSession
    import spark0.implicits._
    val r = k / bands
    val banded = docs.flatMap { d =>
      val sh = StreamingOps.shingleHashes(d.text, shingleLen)
      if (sh.isEmpty) Iterator.empty
      else {
        val sig = StreamingOps.minhashSig(sh, k)
        (0 until bands).iterator.map { b =>
          val bucket = java.util.Arrays.hashCode(
            java.util.Arrays.copyOfRange(sig, b * r, (b + 1) * r)).toLong
          BucketedDoc(b, bucket, d.docId, d.ts, sh)
        }
      }
    }
    implicit val stateEnc: org.apache.spark.sql.Encoder[List[(Long, Array[Long])]] =
      Encoders.kryo[List[(Long, Array[Long])]]
    implicit val keyEnc: org.apache.spark.sql.Encoder[(Int, Long)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    banded.groupByKey(bd => (bd.band, bd.bucket))
      .flatMapGroupsWithState[List[(Long, Array[Long])], NearDupFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state) =>
          var seen: List[(Long, Array[Long])] = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDupFlag]
          rows.toSeq.sortBy(d => (d.ts.getTime, d.docId)).foreach { d =>
            val mySet = d.shingles.toSet
            val dup = seen.find { case (_, sh) =>
              val inter = sh.count(mySet.contains)
              val union = mySet.size + sh.length - inter
              union > 0 && inter.toDouble / union >= threshold
            }.map(_._1)
            out += NearDupFlag(d.docId, band, dup)
            if (dup.isEmpty) seen = ((d.docId, d.shingles) :: seen).take(bucketCap)
          }
          state.update(seen)
          out.iterator
      }
  }

  /** Normalized word-shingle hash set (distinct), Scala-side mirror of the
    * batch shingle pipeline for the streaming state function. 64-bit
    * hashes keep state small; Jaccard over hash sets equals Jaccard over
    * shingle sets absent a 2^-64 collision. Hashes via the SAME FNV-1a
    * kernel the batch simhash expression uses — one definition, no
    * batch/streaming drift.
    */
  private[streaming] def shingleHashes(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.empty
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Array.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet[String].iterator
      .map(s => graft.functions.expr.SimHash64.fnv1a64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)))
      .toArray
  }

  /** MinHash signature over a shingle-hash set, reusing the batch
    * [[graft.functions.expr.MinHashBuckets]] SplitMix64 seed stream and
    * mix — the static seed array keeps this off the per-record hot path,
    * and sharing the definition is what makes the "same construction as
    * the batch operator" claim enforceable rather than aspirational.
    */
  private[streaming] def minhashSig(sh: Array[Long], k: Int): Array[Long] = {
    import graft.functions.expr.MinHashBuckets.{mix, seeds}
    val mins = Array.fill(k)(Long.MaxValue)
    sh.foreach { h =>
      var j = 0
      while (j < k) { val v = mix(h ^ seeds(j)); if (v < mins(j)) mins(j) = v; j += 1 }
    }
    mins
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

  /** Gap-based sessionization with CUSTOM state and event-time state
    * expiry — the `flatMapGroupsWithState` form of [[sessionAgg]], for
    * session payloads the declarative `session_window` aggregation can't
    * carry (here: first/last event ids alongside the count; in general,
    * anything foldable). Emits each session exactly once, when it CLOSES:
    * either a later event for the same key arrives past the gap
    * (closed within the callback), or the watermark passes
    * last-event + gap with no new data (closed by EventTimeTimeout).
    *
    * This is the state-LIFECYCLE template the NoTimeout operators above
    * deliberately avoid needing: state here is one open session per
    * ACTIVE key and is removed by the timeout as keys go idle —
    * without the timeout, one-visit keys (the common case in web-scale
    * clickstreams) would pin state forever and the store would grow with
    * total key cardinality instead of concurrent-activity.
    */
  def sessionsByGap(events: org.apache.spark.sql.Dataset[SessEvent],
                    watermark: String, gapMs: Long)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    implicit val stateEnc: org.apache.spark.sql.Encoder[OpenSession] =
      Encoders.product[OpenSession]
    implicit val outEnc: org.apache.spark.sql.Encoder[SessionOut] =
      Encoders.product[SessionOut]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING

    def close(s: OpenSession) = SessionOut(
      s.key, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs),
      s.n, s.firstId, s.lastId)

    events.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state) =>
          if (state.hasTimedOut) {
            val closed = close(state.get)
            state.remove()
            Iterator.single(closed)
          } else {
            // Batch rows arrive unordered; sessionization is fold-order
            // sensitive, so order within the batch (late data beyond the
            // watermark was already dropped upstream).
            val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.id))
            val out = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.endMs <= gapMs =>
                  // Cross-batch out-of-order merge: an event above the
                  // watermark may still precede the open session's start
                  // (or land inside it) — extend the boundary it actually
                  // moves, so firstId/lastId stay in event-time order.
                  // (An event more than `gap` before startMs still merges
                  // here: reconstructing the sessions an event-time-ordered
                  // fold would have produced needs buffered events, which
                  // this operator deliberately does not keep.)
                  cur = Some(s.copy(
                    startMs = math.min(s.startMs, t),
                    endMs = math.max(s.endMs, t),
                    n = s.n + 1,
                    firstId = if (t < s.startMs) e.id else s.firstId,
                    lastId = if (t >= s.endMs) e.id else s.lastId))
                case Some(s) =>
                  out += close(s)
                  cur = Some(OpenSession(key, t, t, 1, e.id, e.id))
                case None =>
                  cur = Some(OpenSession(key, t, t, 1, e.id, e.id))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Expire when the watermark passes the gap horizon. The
              // timeout must sit above the current watermark: an open
              // session whose horizon the watermark already passed gets
              // one more micro-batch (watermark + 1ms) and then closes.
              state.setTimeoutTimestamp(math.max(
                s.endMs + gapMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Streaming first-completion funnel — the online form of
    * [[graft.operators.Funnel.firstCompletion]]: per key, step i completes
    * at the first step-i event processed at or after step i-1's completion
    * time. Emits a [[FunnelProgress]] row whenever a key's completed-prefix
    * length GROWS (update-mode semantics; keys quiet in a batch emit
    * nothing).
    *
    * Online approximation contract: events are folded in event-time order
    * WITHIN each micro-batch, but a completed step is never retroactively
    * improved by a cross-batch out-of-order event (the batch operator
    * recomputes the true minimum; keeping that exact under streaming would
    * mean buffering every event per key). State per key is one long per
    * step — bounded by the funnel length, not the event volume.
    */
  def funnelProgress(events: org.apache.spark.sql.Dataset[FunnelEvent],
                     steps: Seq[String])
      : org.apache.spark.sql.Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnelProgress: need at least one step")
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.GroupStateTimeout
    implicit val stateEnc: org.apache.spark.sql.Encoder[FunnelTimes] =
      Encoders.product[FunnelTimes]
    implicit val outEnc: org.apache.spark.sql.Encoder[FunnelProgress] =
      Encoders.product[FunnelProgress]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING

    events.groupByKey(_.key)
      .mapGroupsWithState[FunnelTimes, FunnelProgress](
        GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          var times = state.getOption.map(_.stepMs)
            .getOrElse(Seq.empty[Long])
          val before = times.size
          rows.toArray.sortBy(e => (e.ts.getTime, e.etype)).foreach { e =>
            val i = times.size
            if (i < steps.size && e.etype == steps(i) &&
                (i == 0 || e.ts.getTime >= times(i - 1)))
              times = times :+ e.ts.getTime
          }
          state.update(FunnelTimes(times))
          FunnelProgress(key, times.size, times.size > before,
            times.lastOption.map(new java.sql.Timestamp(_)))
      }
      .filter(_.advanced)
  }

  /** Streaming form of the batch Bloom ingest gate
    * ([[graft.dedup.Ingest.newRows]], q62): emit each arriving content
    * key's FIRST occurrence, suppressing keys already in the published
    * snapshot and re-arrivals within the stream. Three layers, cheapest
    * first:
    *
    *  1. map-side Bloom probe of the snapshot's filter (the same
    *     codegen'd broadcast-handle expression as the batch gate): at
    *     steady state most rows are re-crawls and drop here, before any
    *     shuffle or state lookup;
    *  2. the filter's "maybe" rows — fpp-bounded volume — verify EXACTLY
    *     against the snapshot key set with a stream-static left-anti
    *     join, re-planned per micro-batch so the static side behaves
    *     like any batch join side;
    *  3. survivors dedup cross-batch in keyed state (first-seen wins;
    *     within-batch ties break to the smallest id), with event-time
    *     expiry `horizonMs` past each key's last sighting — state tracks
    *     CONCURRENT novelty, not total key cardinality, the same
    *     boundedness argument as [[sessionsByGap]].
    *
    * Run the gate at the snapshot-publish cadence: once a publish absorbs
    * the emitted keys into the filter + key set, their stream state is
    * free to expire — a key re-arriving later falls to layer 1/2. A key
    * that expires BETWEEN publishes and re-arrives would re-emit (the
    * deliberate at-least-once corner of horizon-bounded state); size
    * `horizonMs` to the publish interval to close it.
    */
  def ingestGate(stream: org.apache.spark.sql.Dataset[IngestKey],
                 bloom: org.apache.spark.util.sketch.BloomFilter,
                 stateKeys: DataFrame,
                 watermark: String, horizonMs: Long)
      : org.apache.spark.sql.Dataset[NewKey] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    implicit val inEnc: org.apache.spark.sql.Encoder[IngestKey] = Encoders.product[IngestKey]
    implicit val outEnc: org.apache.spark.sql.Encoder[NewKey] = Encoders.product[NewKey]
    // one Long encoder serves both the group key and the state value
    implicit val longEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong

    val bloomBc = stream.sparkSession.sparkContext.broadcast(bloom)
    val probed = stream.toDF().withColumn("__maybe", coalesce(
      graft.functions.expr.BloomMightContain.bloom_might_contain(col("key"), bloomBc),
      lit(false)))
    val definitelyNew = probed.filter(!col("__maybe")).drop("__maybe")
    val verifiedNew = probed.filter(col("__maybe")).drop("__maybe")
      .join(stateKeys.select(col("key")), Seq("key"), "left_anti")
    definitelyNew.unionByName(verifiedNew).as[IngestKey]
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, NewKey](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arr = rows.toArray
            val out =
              if (state.exists) Iterator.empty
              else {
                val first = arr.minBy(r => (r.ts.getTime, r.id))
                Iterator.single(NewKey(key, first.id))
              }
            val lastMs = math.max(state.getOption.getOrElse(0L),
              arr.map(_.ts.getTime).max)
            state.update(lastMs)
            // horizon past the last sighting, but always above the
            // current watermark (same guard as sessionsByGap)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1, lastMs + horizonMs))
            out
          }
      }
  }
  /** Streaming heavy-hitter candidates: the online form of
    * `Sketches.heavyHitters`' sketch phase. Per group, a Misra-Gries
    * summary of `width` counters lives in keyed state and absorbs each
    * micro-batch; every batch with data for a group re-emits that group's
    * refreshed candidate set (update semantics, one row per group per
    * batch).
    *
    * The batch guarantee carries over unchanged — a sequential update IS
    * a merge order, and MG summaries are mergeable — so after any number
    * of batches, any item whose total count since stream start exceeds
    * n/(width+1) is present. State per group is `width` counters forever
    * (NoTimeout is deliberate: a frequency profile over the full stream
    * history is the point, and its size does not grow with the stream).
    * As in batch, the emitted set is a guaranteed SUPERSET whose exact
    * counts a bounded batch recount can confirm against the corpus.
    */
  def heavyHitterCandidates(items: org.apache.spark.sql.Dataset[GroupedItem],
                            width: Int)
      : org.apache.spark.sql.Dataset[HhCandidates] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.GroupStateTimeout
    implicit val stateEnc: org.apache.spark.sql.Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    implicit val outEnc: org.apache.spark.sql.Encoder[HhCandidates] = Encoders.product[HhCandidates]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING

    val mg = new graft.operators.Sketches.MisraGries(width)
    items.groupByKey(_.group)
      .mapGroupsWithState[mutable.HashMap[String, Long], HhCandidates](
        GroupStateTimeout.NoTimeout) {
        case (group, rows, state) =>
          val m = state.getOption.getOrElse(mutable.HashMap.empty[String, Long])
          var absorbed = 0L
          rows.foreach { r => mg.reduce(m, r.item); absorbed += 1 }
          state.update(m)
          HhCandidates(group, m.keys.toSeq.sorted, absorbed)
      }
  }
  /** Streaming distinct-count: per group, HLL registers
    * ([[graft.operators.Sketches.Hll]]) live in keyed state and absorb
    * each micro-batch's hashes; every batch re-emits the group's running
    * estimate (update semantics). Because the registers are the SAME
    * mergeable state the batch aggregator builds, a stream restarted from
    * a batch-persisted state column (or vice versa) continues the exact
    * count — state is 2^p bytes per group, forever, independent of
    * stream length or key cardinality.
    */
  def distinctOverStream(items: org.apache.spark.sql.Dataset[GroupedHash], p: Int)
      : org.apache.spark.sql.Dataset[DistinctEstimate] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.GroupStateTimeout
    implicit val stateEnc: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
    implicit val outEnc: org.apache.spark.sql.Encoder[DistinctEstimate] =
      Encoders.product[DistinctEstimate]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING

    val hll = new graft.operators.Sketches.Hll(p)
    items.groupByKey(_.group)
      .mapGroupsWithState[Array[Byte], DistinctEstimate](GroupStateTimeout.NoTimeout) {
        case (group, rows, state) =>
          val regs = state.getOption.getOrElse(hll.zero)
          rows.foreach(r => hll.reduce(regs, r.hash))
          state.update(regs)
          val e = hll.finish(regs)
          DistinctEstimate(group, e.estDistinct, e.filled)
      }
  }

  /** Shared scaffold for the STATELESS admission gates (span / oov /
    * ngram-quality / dsir / surprise / domain): every one of them is
    * broadcast-trained constants + metric projections over each arriving
    * row + a threshold `keep` + the standard verdict projection. The
    * scaffold owns that shape — metric columns derive LEFT-TO-RIGHT (a
    * later column may reference an earlier one), then `keep`, then
    * `(doc_id, ts, out..., keep)` with the `docId` rename; intermediate
    * `__`-prefixed columns drop automatically by not being in `out`.
    * Nothing here is keyed state or watermarked: every gate built on
    * this runs append-mode at wire speed, and each gate's decisions
    * replay bit-for-bit in its batch twin (the per-gate StreamingSpec
    * pins). Adding the next gate = constants + metrics + keep rule
    * (~15 lines), not another copy of this plumbing.
    */
  private def statelessGate(docs: DataFrame, metrics: Seq[(String, Column)],
                            keep: Column, out: Seq[String]): DataFrame =
    metrics.foldLeft(docs) { case (df, (n, c)) => df.withColumn(n, c) }
      .withColumn("keep", keep)
      .select(col("docId").as("doc_id") +: col("ts") +:
        (out.map(col) :+ col("keep")): _*)

  /** Streaming duplicated-span admission gate against a STATIC corpus
    * state: per arriving document, the share of its tokens covered by
    * k-token windows whose keys hit a Bloom filter of the corpus's
    * window keys ([[graft.dedup.SpanDedup.spanState]] →
    * [[graft.dedup.Ingest.buildBloom]]). STATELESS per-row — one codegen
    * fold per doc ([[graft.dedup.SpanDedup.coveredByState]]), no keyed
    * state, no watermark, works in append mode — so it gates at wire
    * speed at ingest. Two documented approximations vs the batch
    * incremental form: within-batch duplication is invisible (two new
    * docs sharing a NEW passage both pass; the batch/compaction pass
    * catches them), and Bloom false positives OVERcount the share — the
    * safe direction for a drop gate; size fpp accordingly.
    */
  def spanShareGate(docs: org.apache.spark.sql.Dataset[StreamDoc],
                    bloom: org.apache.spark.util.sketch.BloomFilter,
                    k: Int, maxPermille: Int = 500): DataFrame = {
    require(0 <= maxPermille && maxPermille <= 1000,
      s"spanShareGate: maxPermille in [0,1000], got $maxPermille")
    val bloomBc = docs.sparkSession.sparkContext.broadcast(bloom)
    statelessGate(docs.toDF(),
      Seq(
        "__toks" -> graft.functions.TextFunctions.tokens(col("text")),
        "n_tokens" -> size(col("__toks")).cast("long"),
        "dup_tokens" ->
          graft.dedup.SpanDedup.coveredByState(col("__toks"), bloomBc, k),
        "dup_permille" -> expr("dup_tokens * 1000L div greatest(n_tokens, 1L)")),
      keep = col("dup_permille") <= maxPermille,
      out = Seq("n_tokens", "dup_tokens", "dup_permille"))
  }

  /** Streaming NEAR-DUP admission gate against a STATIC signature state —
    * the ingest-time form of the Hamming incremental dedup
    * ([[graft.dedup.NearDedup.simhashPairsIncremental]], q189): the
    * persisted [[graft.dedup.NearDedup.simhashState]] key index collects
    * to a bounded broadcast map offline
    * ([[graft.dedup.NearDedup.simhashKeyMap]] — loud-guarded; corpus-
    * sized states belong to the batch incremental), and each arriving
    * document SimHashes statelessly, probes its C(c,2) chunk-pair keys
    * against the map, and XOR-popcounts the candidate signatures — the
    * same pigeonhole-exact verification as the batch operator, one
    * bounded udf call per row. No keyed state, no watermark,
    * append-mode. `min_hamming` is null when no chunk key collides
    * (pigeonhole: the doc is > maxHamming from every state signature);
    * keep = not within `maxHamming` of any state signature.
    *
    * Two documented approximations vs the batch incremental, the
    * spanShareGate pattern: within-batch duplication is invisible (two
    * arrivals near-dup of each other but not of state both pass — the
    * batch/compaction pass catches them), and the state snapshot is as
    * fresh as its last rebuild. The udf computes chunk values with
    * [[graft.functions.HashFunctions.hammingChunkValsJvm]], the
    * spec-pinned mirror of the Column slicing, so stream and batch
    * probe identical keys.
    */
  def nearDupGate(docs: org.apache.spark.sql.Dataset[StreamDoc],
                  keyIndex: Map[(Int, Long, Long), Array[Long]],
                  maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 &&
      maxHamming <= graft.functions.HashFunctions.MaxHammingIndexRadius,
      s"nearDupGate: maxHamming in [0, ${graft.functions.HashFunctions.MaxHammingIndexRadius}], got $maxHamming")
    val idxBc = docs.sparkSession.sparkContext.broadcast(keyIndex)
    val probe = udf { (sig: Long) =>
      val cvs = graft.functions.HashFunctions.hammingChunkValsJvm(sig, maxHamming)
      val n = cvs.length
      val idx = idxBc.value
      val cands = scala.collection.mutable.HashSet.empty[Long]
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          idx.get((i * n + j, cvs(i), cvs(j))).foreach(_.foreach(cands += _))
          j += 1
        }
        i += 1
      }
      if (cands.isEmpty) (0L, Option.empty[Long])
      else {
        var minH = 64L
        cands.foreach { c =>
          val h = java.lang.Long.bitCount(sig ^ c).toLong
          if (h < minH) minH = h
        }
        (cands.size.toLong, Some(minH))
      }
    }
    statelessGate(docs.toDF(),
      Seq(
        // null text sketches as the empty token array, the batch
        // convention — the udf must never see a null sig
        "sig" -> graft.functions.expr.SimHash64.simhash64(coalesce(
          graft.functions.TextFunctions.tokens(col("text")),
          array().cast("array<string>"))),
        "__pr" -> probe(col("sig")),
        "n_candidates" -> col("__pr._1"),
        "min_hamming" -> col("__pr._2")),
      keep = col("min_hamming").isNull || col("min_hamming") > maxHamming,
      out = Seq("sig", "n_candidates", "min_hamming"))
  }

  /** Streaming tokenizer-FERTILITY admission gate against a trained
    * unigram-LM score table — the ingest-time form of
    * [[graft.search.Unigram.encode]]'s compression report: a document
    * that Viterbi-shatters into many pieces per token (high fertility)
    * is byte-soup/transliteration/OOV-heavy text the tokenizer will
    * waste context window on; gate it at ingest, next to [[oovGate]]
    * (which counts whole unknown WORDS — fertility catches words the
    * vocab can only spell out char by char, which oovGate passes).
    * Scores fit offline ([[graft.search.Unigram.fitScores]] →
    * `scoresToDF` parquet), shipped as one bounded broadcast map; each
    * arrival segments STATELESSLY with the same packed-key Viterbi the
    * batch encoder uses ([[graft.search.Unigram.viterbiWord]] — shared
    * code, so stream == batch by construction and StreamingSpec pins
    * it). An UNK word counts one piece (the batch convention).
    * fertility_permille = pieces·1000 div tokens; token-less/null text
    * gates as 0 (keep).
    */
  def fertilityGate(docs: org.apache.spark.sql.Dataset[StreamDoc],
                    scores: Map[String, Long], maxPieceLen: Int,
                    maxPermille: Long): DataFrame = {
    require(maxPermille >= 0, s"fertilityGate: maxPermille >= 0, got $maxPermille")
    val scBc = docs.sparkSession.sparkContext.broadcast(scores)
    val segAll = udf { (toks: Seq[String]) =>
      if (toks == null) (0L, 0L, 0L)
      else {
        var pieces = 0L
        var unk = 0L
        toks.foreach { w =>
          val (isUnk, np, _, _) =
            graft.search.Unigram.viterbiWord(w, scBc.value, maxPieceLen, wantPieces = false)
          if (isUnk) { unk += 1; pieces += 1 } else pieces += np
        }
        (toks.length.toLong, unk, pieces)
      }
    }
    statelessGate(docs.toDF(),
      Seq(
        "__r" -> segAll(graft.functions.TextFunctions.tokens(col("text"))),
        "n_tokens" -> col("__r._1"),
        "n_unk_words" -> col("__r._2"),
        "n_pieces" -> col("__r._3"),
        "fertility_permille" -> expr("n_pieces * 1000L div greatest(n_tokens, 1L)")),
      keep = col("fertility_permille") <= maxPermille,
      out = Seq("n_tokens", "n_unk_words", "n_pieces", "fertility_permille"))
  }

  /** Streaming OOV admission gate against a FIXED vocabulary — the
    * ingest-time form of [[graft.search.Lexical.oovRateAgainst]]: per
    * arriving document, the permille of token occurrences outside the
    * broadcast vocab (trained offline by `vocabFromCounts` over persisted
    * `termCounts` state, q113), and a keep decision at `maxPermille`.
    * STATELESS per-row — one projection against a broadcast hash set, no
    * keyed state, no watermark, append-mode — a doc that would shatter
    * into byte-fallback tokens is turned away at wire speed, and the
    * batch-side q111/q113 report stays the calibration loop that picks
    * `maxPermille`. Integer permille of exact counts: the decision
    * replays bit-for-bit in the batch scorer (StreamingSpec pins it).
    */
  def oovGate(docs: org.apache.spark.sql.Dataset[StreamDoc],
              vocab: Seq[String], maxPermille: Int): DataFrame = {
    require(0 <= maxPermille && maxPermille <= 1000,
      s"oovGate: maxPermille in [0,1000], got $maxPermille")
    val vocabBc = docs.sparkSession.sparkContext.broadcast(vocab.toSet)
    // one udf call per ROW over the token array, hash-set lookups inside —
    // the honest tool here (cmsEstimate's rationale): the vocab is a
    // bounded broadcast set, and the stateless alternative (a plan-literal
    // array_contains per token) scans the vocab linearly per token
    val oovCount = udf((toks: Seq[String]) =>
      toks.count(t => !vocabBc.value.contains(t)).toLong)
    statelessGate(docs.toDF(),
      Seq(
        // null text coalesces to zero tokens: the row gates as 0-permille
        // (keep) instead of NPE-ing the micro-batch inside the udf
        "__toks" -> coalesce(
          graft.functions.TextFunctions.tokens(col("text")),
          array().cast("array<string>")),
        "n_tokens" -> size(col("__toks")).cast("long"),
        "oov_tokens" -> oovCount(col("__toks")),
        "oov_permille" -> expr("oov_tokens * 1000L div greatest(n_tokens, 1L)")),
      keep = col("oov_permille") <= maxPermille,
      out = Seq("n_tokens", "oov_tokens", "oov_permille"))
  }

  /** Streaming n-gram QUALITY gate against a FIXED weight map — the
    * ingest-time form of [[graft.classify.NgramScorer.qualityGate]]: the
    * classifier trains offline (the batch train → [[graft.classify
    * .NgramScorer.collectWeights]] loop), the ≤`buckets`-row weight map
    * broadcasts, and each arriving document scores STATELESSLY — the
    * feature projection is the SAME column expression the batch scorer
    * uses ([[graft.classify.NgramScorer.featureBuckets]]), so streaming
    * decisions replay the batch gate bit-for-bit on the same text
    * (StreamingSpec pins it). No keyed state, no watermark; a null text
    * scores 0 over 0 features (the batch convention).
    *
    * The per-row udf sums bounded-map lookups over the doc's distinct
    * buckets — the oovGate rationale: the stateless alternative (a
    * plan-literal map probe per bucket) rebuilds the weight literal into
    * every task's codegen and scans it per feature.
    */
  def ngramQualityGate(docs: org.apache.spark.sql.Dataset[StreamDoc],
                       weights: Map[Long, Long], buckets: Int,
                       thresholdPpm: Long): DataFrame = {
    val wBc = docs.sparkSession.sparkContext.broadcast(weights)
    val score = udf { (bs: Seq[Long]) =>
      if (bs == null) 0L
      else { val m = wBc.value; var s = 0L; bs.foreach(b => s += m.getOrElse(b, 0L)); s }
    }
    statelessGate(docs.toDF(),
      Seq(
        "__bs" -> graft.classify.NgramScorer.featureBuckets(col("text"), buckets),
        "n_feats" -> coalesce(size(col("__bs")), lit(0)).cast("long"),
        "score_ppm" -> score(col("__bs"))),
      keep = col("score_ppm") >= thresholdPpm,
      out = Seq("n_feats", "score_ppm"))
  }

  /** Streaming DSIR admission gate — the ingest-time form of
    * [[graft.classify.Dsir]]: the λ table and per-token constant are fit
    * OFFLINE on (target, raw) snapshots ([[graft.classify.Dsir
    * .lambdaWeights]] → [[graft.classify.Dsir.collectLambda]]), shipped
    * here as one bounded broadcast map + one literal, and each arriving
    * doc is scored `Σ cnt_b·λ(b) + n·C` exactly as the batch scorer
    * would — STATELESS (no keyed state, no watermark), so streaming
    * keep/drop decisions replay the batch selection bit-for-bit on the
    * same text (StreamingSpec pins it). Null text scores 0 over 0
    * tokens, `keep` decided by the threshold like any other doc. The
    * per-row udf is the ngramQualityGate rationale: a bounded-map probe
    * per bucket beats rebuilding a plan-literal map into every task.
    */
  def dsirGate(docs: org.apache.spark.sql.Dataset[StreamDoc],
               lambda: Map[Long, Long], cQ16: Long, buckets: Int,
               thresholdQ16: Long): DataFrame = {
    val wBc = docs.sparkSession.sparkContext.broadcast(lambda)
    val score = udf { (bs: Seq[Long]) =>
      if (bs == null) 0L
      else { val m = wBc.value; var s = 0L; bs.foreach(b => s += m.getOrElse(b, 0L)); s }
    }
    statelessGate(docs.toDF(),
      Seq(
        "__toks" -> graft.functions.TextFunctions.tokens(col("text")),
        "__bs" -> graft.classify.Dsir.bucketArray(col("__toks"), buckets),
        "n_tokens" -> coalesce(size(col("__bs")), lit(0)).cast("long"),
        "score_q16" -> (score(col("__bs")) + col("n_tokens") * lit(cQ16))),
      keep = col("score_q16") >= thresholdQ16,
      out = Seq("n_tokens", "score_q16"))
  }

  /** Streaming robust-outlier gate against FIXED (median, MAD) bounds —
    * the ingest-time form of
    * [[graft.operators.Quantiles.robustOutliers]]: the batch pass
    * computes `med`/`mad` offline (the two bounded histogram readouts),
    * ships them here as plan literals, and each arriving row gates
    * STATELESSLY on the same DECIMAL(38,0)-exact comparison
    * `100*|v - med| > kx100*mad` — so streaming flags replay the batch
    * gate bit-for-bit on the same values (StreamingSpec pins it), a null
    * value reads as unflagged-unknown (`outlier` null, `keep` true: an
    * unparseable metric is a different failure than a wild one), and
    * there is no keyed state or watermark at all.
    */
  def outlierGate(rows: DataFrame, valueCol: String,
                  med: Long, mad: Long, kx100: Long = 300L): DataFrame = {
    require(kx100 > 0, s"outlierGate: kx100 must be positive, got $kx100")
    require(mad >= 0, s"outlierGate: mad must be nonnegative, got $mad")
    rows
      .withColumn(s"${valueCol}_outlier",
        abs(col(valueCol) - lit(med)).cast("decimal(38,0)") * 100 >
          lit(kx100) * lit(mad).cast("decimal(38,0)"))
      .withColumn("keep", coalesce(!col(s"${valueCol}_outlier"), lit(true)))
  }

  /** Streaming char-bigram SURPRISE gate against a FIXED count state —
    * the ingest-time form of
    * [[graft.operators.QualitySignals.bigramSurpriseAgainst]]: per
    * arriving document, the mean log2-rarity of its character
    * transitions under a bigram model trained offline
    * ([[graft.operators.QualitySignals.bigramCounts]], collected via
    * [[graft.operators.QualitySignals.collectBigramCounts]]), and a keep
    * decision at `maxSurpriseX100`. STATELESS per-row: bigram hashes are
    * computed by the same codegen'd `xxhash64` the batch side uses (so
    * the model keys match bit-for-bit), the count lookup is one hash-map
    * probe per bigram against the broadcast state, and unseen bigrams
    * score 64 — the batch convention. Docs with < 2 chars (no bigrams)
    * score 0 and keep: no evidence is not evidence of garbage.
    */
  def surpriseGate(docs: org.apache.spark.sql.Dataset[StreamDoc],
                   counts: Map[Long, Long], maxSurpriseX100: Int): DataFrame = {
    require(maxSurpriseX100 >= 0,
      s"surpriseGate: maxSurpriseX100 must be >= 0, got $maxSurpriseX100")
    val countsBc = docs.sparkSession.sparkContext.broadcast(counts)
    val surprise = udf { (hs: Seq[Long]) =>
      if (hs == null || hs.isEmpty) 0L
      else {
        val m = countsBc.value
        var sum = 0L
        hs.foreach { h =>
          val n = m.getOrElse(h, 0L)
          sum += (if (n <= 0) 64 else 64 - (64 - java.lang.Long.numberOfLeadingZeros(n)))
        }
        sum * 100 / hs.length
      }
    }
    statelessGate(docs.toDF(),
      Seq(
        "__t" -> lower(trim(coalesce(col("text"), lit("")))),
        "__hs" -> when(length(col("__t")) >= 2,
            expr("transform(sequence(1, char_length(__t) - 1), i -> xxhash64(substring(__t, i, 2)))"))
          .otherwise(expr("cast(array() as array<bigint>)")),
        "n_bigrams" -> size(col("__hs")).cast("long"),
        "surprise_x100" -> surprise(col("__hs"))),
      keep = col("surprise_x100") <= maxSurpriseX100,
      out = Seq("n_bigrams", "surprise_x100"))
  }

  /** Streaming DOMAIN admission gate — the ingest-time form of
    * [[graft.pipeline.Curation.sourceQualityGate]] (q161) served from
    * the persisted source state (q171): domain verdicts are computed
    * OFFLINE ([[graft.pipeline.Curation.sourceVerdictsFromState]] over
    * merged/retracted state), collected to a bounded per-source map
    * (domain cardinality, not corpus cardinality), broadcast, and each
    * arriving document gates STATELESSLY on one hash-map probe of its
    * `source`. A source ABSENT from the state has no evidence, which in
    * the batch gate is exactly the `src_docs < minDocs` drop rule — so
    * unknown sources emit `(src_docs 0, mean null, keep false)`, and
    * known sources replay the state-served verdict bit-for-bit
    * (StreamingSpec pins both). Built on [[statelessGate]]: this whole
    * gate is the broadcast + one lookup metric + the keep rule.
    */
  def domainGate(docs: org.apache.spark.sql.Dataset[SourcedDoc],
                 verdicts: Map[String, (Long, Long, Boolean)]): DataFrame = {
    val vBc = docs.sparkSession.sparkContext.broadcast(verdicts)
    val look = udf((s: String) => vBc.value.get(s))
    statelessGate(docs.toDF(),
      Seq(
        "__v" -> look(col("source")),
        "src_docs" -> coalesce(col("__v._1"), lit(0L)),
        "src_mean_ttr_ppm" -> col("__v._2")),
      keep = coalesce(col("__v._3"), lit(false)),
      out = Seq("source", "src_docs", "src_mean_ttr_ppm"))
  }

  /** Streaming MEDIA admission gate — the ingest-time form of the q178
    * real-codec decode: each arriving payload runs through the P6
    * decoder ([[graft.multimodal.Ppm.stats]]) as ONE stateless codegen
    * projection; a payload that does not decode (bad magic, truncated
    * or padded raster, absurd header) quarantines with null dimensions,
    * and a decodable one gates on its pixel count against
    * `[minPixels, maxPixels]` (the thumbnail-spam / decompression-bomb
    * band every crawl media pipeline enforces). Decisions replay
    * bit-for-bit in the batch decode of the same payloads
    * (StreamingSpec pins it, including the malformed row). Built on
    * [[statelessGate]] — constants-free, metrics + keep rule only.
    */
  def mediaGate(media: org.apache.spark.sql.Dataset[MediaArrival],
                minPixels: Long, maxPixels: Long): DataFrame = {
    require(minPixels >= 1 && maxPixels >= minPixels,
      s"mediaGate: need 1 <= minPixels <= maxPixels, got [$minPixels, $maxPixels]")
    statelessGate(media.toDF(),
      Seq(
        "__st" -> graft.multimodal.Ppm.stats(col("payload")),
        "width" -> element_at(col("__st"), 1),
        "height" -> element_at(col("__st"), 2),
        "n_pixels" -> (element_at(col("__st"), 1) * element_at(col("__st"), 2))),
      keep = col("__st").isNotNull &&
        col("n_pixels").between(minPixels, maxPixels),
      out = Seq("width", "height", "n_pixels"))
  }

  /** Streaming AUDIO admission gate — the WAV member next to
    * [[mediaGate]]: each arriving payload runs through the RIFF/PCM
    * decoder ([[graft.multimodal.Wav.stats]]) as one stateless codegen
    * projection; malformed payloads (bad magic, chunk-size lies,
    * trailing junk, non-PCM) quarantine with null stats, decodable ones
    * gate on the sample-count band (clip-length policy: ringtone spam
    * below, unbounded streams above) AND a peak floor — near-silent
    * clips (mic failures, DRM-muted rips) carry no training signal and
    * `peak_abs >= minPeak` drops them at ingest. Decisions replay
    * bit-for-bit in batch (StreamingSpec pins it, malformed row
    * included). Built on [[statelessGate]]. */
  def audioGate(media: org.apache.spark.sql.Dataset[MediaArrival],
                minSamples: Long, maxSamples: Long, minPeak: Long): DataFrame = {
    require(minSamples >= 1 && maxSamples >= minSamples && minPeak >= 0,
      s"audioGate: need 1 <= minSamples <= maxSamples and minPeak >= 0, " +
        s"got [$minSamples, $maxSamples], $minPeak")
    statelessGate(media.toDF(),
      Seq(
        "__st" -> graft.multimodal.Wav.stats(col("payload")),
        "sample_rate" -> element_at(col("__st"), 2),
        "n_samples" -> element_at(col("__st"), 3),
        "peak_abs" -> element_at(col("__st"), 5)),
      keep = col("__st").isNotNull &&
        col("n_samples").between(minSamples, maxSamples) &&
        col("peak_abs") >= minPeak,
      out = Seq("sample_rate", "n_samples", "peak_abs"))
  }

  /** Streaming VIDEO admission gate — the PPM-stream member next to
    * [[mediaGate]]/[[audioGate]]: each arriving container is WALKED
    * frame-by-frame ([[graft.multimodal.PpmSeq.frames]] — every header
    * parsed, every raster size validated to payload end), quarantining
    * streams that are malformed ANYWHERE (a sampling decoder downstream
    * must never discover corruption the gate waved through), and
    * decodable ones gate on the frame-count band (single-frame
    * stills-as-video below, unbounded screencasts above). Decisions
    * replay bit-for-bit in batch (StreamingSpec pins it). */
  def videoGate(media: org.apache.spark.sql.Dataset[MediaArrival],
                minFrames: Long, maxFrames: Long): DataFrame = {
    require(minFrames >= 1 && maxFrames >= minFrames,
      s"videoGate: need 1 <= minFrames <= maxFrames, got [$minFrames, $maxFrames]")
    statelessGate(media.toDF(),
      Seq("n_frames" -> graft.multimodal.PpmSeq.frames(col("payload"))),
      keep = col("n_frames").isNotNull &&
        col("n_frames").between(minFrames, maxFrames),
      out = Seq("n_frames"))
  }

  /** Streaming KMV distinct-count: per group, the sorted k-min-values
    * state ([[graft.operators.Sketches.Kmv]]) lives in keyed state AS THE
    * SAME big-endian BINARY encoding the batch `kmvState` aggregator
    * persists — so a stream restarted from a batch-persisted state column
    * (or vice versa) continues the exact count, the q100 interop in
    * streaming form. State is at most 8k bytes per group, forever;
    * estimates are exact below k (unlike HLL's p=8 raw estimator, making
    * this the streaming choice when small groups must read exactly).
    */
  def kmvDistinctOverStream(items: org.apache.spark.sql.Dataset[GroupedHash], k: Int)
      : org.apache.spark.sql.Dataset[DistinctEstimate] = {
    import graft.operators.Sketches
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.GroupStateTimeout
    implicit val stateEnc: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
    implicit val outEnc: org.apache.spark.sql.Encoder[DistinctEstimate] =
      Encoders.product[DistinctEstimate]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING

    val kmv = new Sketches.Kmv(k)
    items.groupByKey(_.group)
      .mapGroupsWithState[Array[Byte], DistinctEstimate](GroupStateTimeout.NoTimeout) {
        case (group, rows, state) =>
          var arr = state.getOption.map(Sketches.kmvFromBytes).getOrElse(kmv.zero)
          rows.foreach(r => arr = kmv.reduce(arr, r.hash))
          state.update(Sketches.kmvToBytes(arr))
          val e = kmv.finish(arr)
          DistinctEstimate(group, e.estDistinct, e.sketchFilled)
      }
  }

  /** Streaming bounded uniform sample: the online form of
    * [[graft.operators.Sampling.uniformSampleState]] (q119). Per group
    * the keyed state is the k ids with the smallest (id-hash, id) — at
    * most k longs FOREVER — absorbed across micro-batches with SET
    * semantics: an id re-ingested by a later batch cannot occupy two
    * slots, so at-least-once sources and overlapping batches read out
    * identically. Because min-k distributes over union, the readout
    * after any prefix of batches equals the batch sample over the union
    * of those batches' ids (StreamingSpec pins this), and the state
    * interoperates with the batch form — a batch-built sample could seed
    * streaming state or vice versa. The hash is the JVM mirror of the
    * engine's single id-hash definition
    * ([[graft.functions.HashFunctions.idHash32Of]]), so this is the SAME
    * sample the batch operators and the SQL oracles draw.
    */
  def uniformSampleOverStream(items: org.apache.spark.sql.Dataset[GroupedId], k: Int)
      : org.apache.spark.sql.Dataset[SampleReadout] = {
    import graft.operators.Sketches
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.GroupStateTimeout
    require(k > 0, s"uniformSampleOverStream: k must be positive, got $k")
    implicit val stateEnc: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
    implicit val outEnc: org.apache.spark.sql.Encoder[SampleReadout] =
      Encoders.product[SampleReadout]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING

    items.groupByKey(_.group)
      .mapGroupsWithState[Array[Byte], SampleReadout](GroupStateTimeout.NoTimeout) {
        case (group, rows, state) =>
          val prev = state.getOption.map(Sketches.kmvFromBytes)
            .getOrElse(Array.empty[Long])
          val merged = (prev ++ rows.map(_.id)).distinct
            .sortBy(id => (graft.functions.HashFunctions.idHash32Of(id), id))
            .take(k)
          state.update(Sketches.kmvToBytes(merged))
          SampleReadout(group, merged.length.toLong, merged.toSeq)
      }
  }

  /** Streaming per-group WEIGHTED quota: the online form of
    * [[graft.operators.Sampling.weightedQuotaPerGroup]] (q172) — per
    * group, keep the `quota` rows with the smallest
    * ([[graft.operators.Sampling.priorityKey]], id), inclusion ∝ weight
    * within the group. Keyed state is the quota (w_key, id) pairs — at
    * most 2·quota longs per group FOREVER — absorbed across
    * micro-batches with SET semantics by id: a re-ingested id keeps its
    * smaller key and never occupies two slots, so at-least-once sources
    * read out identically (an id re-sent with a DIFFERENT weight is an
    * upstream contract break; the deterministic outcome here is
    * min-key-wins). Because min-quota over (w_key, id) distributes over
    * union, the readout after any batch prefix equals the batch
    * operator over those batches' union (StreamingSpec pins this), and
    * the key arithmetic is [[graft.operators.Sampling.priorityKeyOf]],
    * the bit-identical JVM mirror of the batch/oracle definition — this
    * IS the same draw q172 gates.
    */
  def weightedQuotaOverStream(items: org.apache.spark.sql.Dataset[WeightedGroupedId],
                              quota: Int)
      : org.apache.spark.sql.Dataset[SampleReadout] = {
    import graft.operators.{Sampling, Sketches}
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.GroupStateTimeout
    require(quota > 0, s"weightedQuotaOverStream: quota must be positive, got $quota")
    implicit val stateEnc: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
    implicit val outEnc: org.apache.spark.sql.Encoder[SampleReadout] =
      Encoders.product[SampleReadout]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING

    items.groupByKey(_.group)
      .mapGroupsWithState[Array[Byte], SampleReadout](GroupStateTimeout.NoTimeout) {
        case (group, rows, state) =>
          val prev = state.getOption.map(Sketches.kmvFromBytes)
            .getOrElse(Array.empty[Long])
          val prevPairs = prev.grouped(2).map(a => (a(0), a(1))).toSeq
          val incoming = rows.map(r => (Sampling.priorityKeyOf(r.id, r.w), r.id))
          val merged = (prevPairs ++ incoming)
            .groupBy(_._2).map { case (_, dups) => dups.min }
            .toSeq.sorted.take(quota)
          state.update(Sketches.kmvToBytes(
            merged.flatMap(p => Seq(p._1, p._2)).toArray))
          SampleReadout(group, merged.length.toLong, merged.map(_._2))
      }
  }

  /** Streaming log-histogram quantiles: the online form of
    * [[graft.operators.Quantiles.histQuantiles]] (q96). Per group, the
    * base-2 log-histogram's bucket counts live in keyed state — a fixed
    * `Quantiles.MaxBuckets` longs (~16 KB) per group FOREVER, independent
    * of stream length or value range, because every nonnegative long maps
    * into that bucket space — and absorb each micro-batch's values;
    * every batch with data re-emits the group's refreshed estimates
    * (update semantics).
    *
    * The bucket arithmetic is [[Quantiles.bucketOfLong]], the JVM mirror
    * of the batch/oracle SQL, and counts merge by addition — so a stream
    * that has absorbed the same multiset as a batch pass reads out
    * IDENTICAL estimates (StreamingSpec pins this), and batch-persisted
    * bucket counts could seed streaming state or vice versa. Values must
    * be nonnegative (the batch contract).
    */
  def histQuantilesOverStream(items: org.apache.spark.sql.Dataset[GroupedValue],
                              qsPermille: Seq[Int])
      : org.apache.spark.sql.Dataset[QuantileReadout] = {
    import graft.operators.Quantiles
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.GroupStateTimeout
    require(qsPermille.nonEmpty && qsPermille.forall(q => q > 0 && q <= 1000),
      s"histQuantilesOverStream: permille targets must be in (0, 1000], got $qsPermille")
    implicit val stateEnc: org.apache.spark.sql.Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
    implicit val outEnc: org.apache.spark.sql.Encoder[QuantileReadout] =
      Encoders.product[QuantileReadout]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING

    items.groupByKey(_.group)
      .mapGroupsWithState[Array[Long], QuantileReadout](GroupStateTimeout.NoTimeout) {
        case (group, rows, state) =>
          val counts = state.getOption.getOrElse(new Array[Long](Quantiles.MaxBuckets))
          rows.foreach { r =>
            // fail with context, not a bare AIOOBE killing the query
            require(r.value >= 0,
              s"histQuantilesOverStream: negative value ${r.value} for group $group " +
                "(the log-histogram contract is nonnegative longs)")
            counts(Quantiles.bucketOfLong(r.value)) += 1L
          }
          state.update(counts)
          val ests = Quantiles.readout(counts, qsPermille)
          QuantileReadout(group, counts.sum,
            ests.map { case (q, e) => QuantileEst(q, e) })
      }
  }

  /** Streaming Count-Min frequency watch: per group, the CMS counter
    * matrix ([[graft.operators.CountMin]]) lives in keyed state AS THE
    * SAME row-major long layout the batch `cmsState` aggregator builds
    * (d*w longs, ~16 KB at d=4/w=512, per group FOREVER — independent
    * of key cardinality), absorbing each micro-batch's hashes; every
    * batch re-emits the running point estimates for the `watch` hashes
    * (update semantics) — the ingest-side rate monitor: "how often has
    * THIS url/token/key occurred so far", guaranteed to OVERcount (the
    * safe direction for a throttle). Counts merge by addition, so a
    * stream seeded from a batch-persisted state column (or read back
    * into one) continues the exact same matrix — the q95/q100/q102
    * interop contract in CMS form.
    */
  def cmsOverStream(items: org.apache.spark.sql.Dataset[GroupedHash],
                    d: Int, w: Int, watch: Seq[Long])
      : org.apache.spark.sql.Dataset[CmsReadout] = {
    import graft.operators.CountMin
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.GroupStateTimeout
    require(watch.nonEmpty, "cmsOverStream: need at least one watch hash")
    implicit val stateEnc: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
    implicit val outEnc: org.apache.spark.sql.Encoder[CmsReadout] =
      Encoders.product[CmsReadout]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING

    val cms = new CountMin.Cms(d, w)
    items.groupByKey(_.group)
      .mapGroupsWithState[Array[Byte], CmsReadout](GroupStateTimeout.NoTimeout) {
        case (group, rows, state) =>
          var st = state.getOption
            .map(graft.operators.Sketches.kmvFromBytes).getOrElse(cms.zero)
          var absorbed = 0L
          rows.foreach { r => st = cms.reduce(st, r.hash); absorbed += 1 }
          val bytes = graft.operators.Sketches.kmvToBytes(st)
          state.update(bytes)
          CmsReadout(group, absorbed,
            watch.map(h => HashEst(h, CountMin.cmsEstimateOf(bytes, h, d, w))))
      }
  }

  /** Streaming pretraining-HYGIENE gate — the ingest-time form of
    * [[graft.operators.QualitySignals.hygieneAudit]]: the three
    * poisoning-class counters (special tokens / mojibake / control
    * chars) as the same three codegen'd `regexp_count` projections,
    * STATELESS (no keyed state, no watermark), so streaming verdicts
    * replay the batch audit bit-for-bit on the same text (StreamingSpec
    * pins it). The gate to put directly on a crawl firehose: corrupt
    * documents never reach the corpus store.
    */
  def hygieneGate(docs: org.apache.spark.sql.Dataset[StreamDoc]): DataFrame =
    graft.operators.QualitySignals.hygieneAudit(
      docs.toDF().withColumnRenamed("docId", "doc_id"),
      "doc_id", "text", keep = Seq("ts"))

  /** Streaming PSI drift monitor — the ingest-time form of
    * [[graft.operators.Profiling.psiDrift]]: the REFERENCE octave shares
    * are computed offline ([[graft.operators.Profiling
    * .collectOctaveShares]], ≤ 65 entries) and baked into the closure;
    * per group, the running octave counts of arrivals live in keyed
    * state (a 66-slot long array — bucket −1 for zeros at index 0, one
    * slot per octave — constant size forever, the histQuantiles state
    * contract), and every micro-batch re-emits the running
    * `(n, psi_q16ppm)` against the reference using the SAME integer
    * ppm-share and Q16-log2 arithmetic as the batch operator
    * ([[graft.classify.Dsir.linLog2Q16Of]] is the bit-exact JVM
    * mirror) — so once the stream has absorbed exactly a batch's rows,
    * its readout EQUALS the batch `psi_q16ppm` (StreamingSpec pins it).
    * Values must be nonnegative (the octave contract; fail with
    * context, not an index error).
    */
  def psiOverStream(items: org.apache.spark.sql.Dataset[GroupedValue],
                    refPpm: Map[Long, Long])
      : org.apache.spark.sql.Dataset[PsiReadout] = {
    import graft.classify.Dsir
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.GroupStateTimeout
    require(refPpm.nonEmpty, "psiOverStream: empty reference shares")
    require(refPpm.keys.forall(b => b >= -1L && b <= 64L),
      s"psiOverStream: reference buckets out of octave range: ${refPpm.keys}")
    implicit val stateEnc: org.apache.spark.sql.Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
    implicit val outEnc: org.apache.spark.sql.Encoder[PsiReadout] =
      Encoders.product[PsiReadout]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING

    items.groupByKey(_.group)
      .mapGroupsWithState[Array[Long], PsiReadout](GroupStateTimeout.NoTimeout) {
        case (group, rows, state) =>
          val counts = state.getOption.getOrElse(new Array[Long](66))
          rows.foreach { r =>
            require(r.value >= 0,
              s"psiOverStream: negative value ${r.value} for group $group " +
                "(the octave contract is nonnegative longs)")
            val oct = if (r.value == 0L) -1
                      else 63 - java.lang.Long.numberOfLeadingZeros(r.value)
            counts(oct + 1) += 1L
          }
          state.update(counts)
          val total = counts.sum
          // union of buckets present on either side — the batch outer
          // join; buckets in neither contribute exactly 0 there too
          val present = counts.indices.filter(counts(_) > 0L).map(_ - 1L)
          var psi = 0L
          (refPpm.keySet ++ present).foreach { b =>
            val curN = counts((b + 1).toInt)
            val curPpm = if (total == 0L) 0L else curN * 1000000L / total
            val refP = refPpm.getOrElse(b, 0L)
            psi += (curPpm - refP) *
              (Dsir.linLog2Q16Of(curPpm + 1L) - Dsir.linLog2Q16Of(refP + 1L))
          }
          PsiReadout(group, total, psi)
      }
  }
}

case class KeyedValue(key: String, value: Double)
case class KeyTotal(key: String, n: Long, total: Double)

case class GroupedItem(group: String, item: String)
case class HhCandidates(group: String, items: Seq[String], batchRows: Long)

case class GroupedHash(group: String, hash: Long)
case class DistinctEstimate(group: String, estDistinct: Long, filled: Long)

case class GroupedValue(group: String, value: Long)
case class PsiReadout(group: String, n: Long, psiQ16ppm: Long)

case class GroupedId(group: String, id: Long)
case class WeightedGroupedId(group: String, id: Long, w: Long)
case class SampleReadout(group: String, filled: Long, ids: Seq[Long])
case class QuantileEst(qPermille: Int, est: Long)
case class QuantileReadout(group: String, n: Long, ests: Seq[QuantileEst])

case class HashEst(hash: Long, est: Long)
case class CmsReadout(group: String, batchRows: Long, ests: Seq[HashEst])

case class StreamDoc(docId: Long, ts: java.sql.Timestamp, text: String)
case class SourcedDoc(docId: Long, ts: java.sql.Timestamp, source: String,
                      text: String)
case class MediaArrival(docId: Long, ts: java.sql.Timestamp,
                        payload: Array[Byte])
case class BucketedDoc(band: Int, bucket: Long, docId: Long,
                       ts: java.sql.Timestamp, shingles: Array[Long])
case class NearDupFlag(docId: Long, band: Int, dupOf: Option[Long])

/** side 0 = right (reference) event, side 1 = left (to-enrich) event. */
case class AsofEvent(key: String, ts: java.sql.Timestamp, side: Int, id: Long)
case class AsofMatched(key: String, id: Long, matchedId: Option[Long])

case class FunnelEvent(key: String, ts: java.sql.Timestamp, etype: String)
case class FunnelTimes(stepMs: Seq[Long])
case class FunnelProgress(key: String, stepsCompleted: Int, advanced: Boolean,
                          lastStepTs: Option[java.sql.Timestamp])

case class IngestKey(key: Long, id: Long, ts: java.sql.Timestamp)
case class NewKey(key: Long, id: Long)

case class SessEvent(key: String, ts: java.sql.Timestamp, id: Long)
case class OpenSession(key: String, startMs: Long, endMs: Long, n: Long,
                       firstId: Long, lastId: Long)
case class SessionOut(key: String, start: java.sql.Timestamp,
                      end: java.sql.Timestamp, nEvents: Long,
                      firstId: Long, lastId: Long)
