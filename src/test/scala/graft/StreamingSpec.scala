package graft

import graft.streaming.{KeyedValue, StreamingOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming analogs of the batch incremental semantics
  * (SURVEY §2.10), driven through MemoryStream micro-batches.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("dedupWithinWatermark drops the boundary re-ingest duplicate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = StreamingOps.dedupWithinWatermark(
      input.toDF().toDF("review_id", "ts", "text"),
      tsCol = "ts", watermark = "1 hour", keyCols = Seq("review_id"))

    input.addData(
      (1L, ts("2021-01-01 10:00:00"), "a"),
      (2L, ts("2021-01-01 10:30:00"), "b"),
      (2L, ts("2021-01-01 10:30:00"), "b"), // same batch duplicate
      (1L, ts("2021-01-01 10:05:00"), "a")) // within-watermark duplicate key
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").select("review_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("windowedCounts aggregates per event-time window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val counts = StreamingOps.windowedCounts(
      input.toDF().toDF("ts", "event_type"),
      tsCol = "ts", watermark = "1 hour", windowLen = "1 hour",
      keyCols = Seq(col("event_type")))

    input.addData(
      (ts("2021-01-01 10:05:00"), "click"),
      (ts("2021-01-01 10:55:00"), "click"),
      (ts("2021-01-01 11:05:00"), "click"),
      (ts("2021-01-01 10:10:00"), "view"))
    val q = counts.writeStream.format("memory").queryName("window_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("window_out")
      .select(col("window_start").cast("string"), col("event_type"), col("n"))
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(
      ("2021-01-01 10:00:00", "click", 2L),
      ("2021-01-01 11:00:00", "click", 1L),
      ("2021-01-01 10:00:00", "view", 1L)))
  }

  test("sessionAgg groups events into gap-based session windows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    input.addData(
      ("u1", ts("2021-01-01 10:00:00")),
      ("u1", ts("2021-01-01 10:10:00")),  // within 30min gap -> same session
      ("u1", ts("2021-01-01 11:30:00")),  // new session
      ("u2", ts("2021-01-01 10:00:00")))
    val sessions = StreamingOps.sessionAgg(
      input.toDF().toDF("user", "ts"),
      tsCol = "ts", watermark = "1 hour", gap = "30 minutes",
      keyCols = Seq(col("user")))
    val q = sessions.writeStream.format("memory").queryName("session_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("session_out")
      .select(col("user"), col("session_start").cast("string"), col("n_events"))
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(
      ("u1", "2021-01-01 10:00:00", 2L),
      ("u1", "2021-01-01 11:30:00", 1L),
      ("u2", "2021-01-01 10:00:00", 1L)))
  }

  test("qualityByWindow: per-window per-lang corpus quality matches the batch scorer") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val good = ("this is a long and clearly written document about the weather " +
      "and the city and the people who live there with many common words ") * 5
    val junk = "@@@!!! ###"
    val rows = Seq(
      (ts("2021-01-01 10:05:00"), good),
      (ts("2021-01-01 10:25:00"), good + " extra tokens here"),
      (ts("2021-01-01 10:45:00"), junk),
      (ts("2021-01-01 11:10:00"), good))

    val input = MemoryStream[(java.sql.Timestamp, String)]
    input.addData(rows: _*)
    val stats = StreamingOps.qualityByWindow(
      input.toDF().toDF("ts", "text"),
      tsCol = "ts", textCol = "text", watermark = "1 hour", windowLen = "1 hour")
    val q = stats.writeStream.format("memory").queryName("quality_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val out = spark.table("quality_out")
      .select(col("window_start").cast("string"), col("lang"),
        col("n_docs"), col("avg_quality"), col("n_below_gate"), col("n_tokens"))
      .as[(String, String, Long, Double, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap

    // same expressions in batch = the oracle for the streaming agg
    import graft.functions.TextFunctions
    val batch = rows.toDF("ts", "text")
      .select(date_trunc("hour", col("ts")).cast("string").as("w"),
        TextFunctions.langId(col("text")).as("lang"),
        TextFunctions.qualityScore(col("text")).as("q"),
        TextFunctions.tokenCount(col("text")).as("t"))
      .groupBy(col("w"), col("lang"))
      .agg(count(lit(1)), round(avg(col("q")), 4),
        count_if(col("q") < 0.5), sum(col("t")))
      .as[(String, String, Long, Double, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(out === batch)

    // the junk doc is the one below the gate, isolated in its own lang bucket
    assert(out(("2021-01-01 10:00:00", "en"))._1 === 2L)
    assert(out(("2021-01-01 10:00:00", "en"))._3 === 0L, "good docs must pass the gate")
    assert(out(("2021-01-01 10:00:00", "und"))._1 === 1L)
    assert(out(("2021-01-01 10:00:00", "und"))._3 === 1L, "junk doc must trip the gate")
    assert(out(("2021-01-01 11:00:00", "en"))._1 === 1L)
  }

  test("intervalJoin: stream-stream range join with watermark-bounded state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val errors = MemoryStream[(String, java.sql.Timestamp, Long)]
    val events = MemoryStream[(String, java.sql.Timestamp, Long)]
    val joined = StreamingOps.intervalJoin(
      errors.toDF().toDF("user", "err_ts", "err_id"),
      events.toDF().toDF("user", "ev_ts", "ev_id"),
      keyCol = "user", leftTs = "err_ts", rightTs = "ev_ts",
      watermark = "1 hour", lowerSec = -3600L, upperSec = 0L)

    errors.addData(("u1", ts("2021-01-01 12:00:00"), 1L))
    events.addData(
      ("u1", ts("2021-01-01 11:30:00"), 10L),  // inside [-1h, 0]
      ("u1", ts("2021-01-01 12:00:00"), 11L),  // boundary, inclusive
      ("u1", ts("2021-01-01 10:30:00"), 12L),  // too old
      ("u1", ts("2021-01-01 12:30:00"), 13L),  // after the error
      ("u2", ts("2021-01-01 11:45:00"), 14L))  // other key
    val q = joined.writeStream.format("memory").queryName("interval_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("interval_out")
      .select("err_id", "ev_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (1L, 11L)))
  }

  test("asofLatestEnrich: per-key latest-prior match with state across batches") {
    import graft.streaming.{AsofEvent, AsofMatched}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[AsofEvent]
    val enriched = StreamingOps.asofLatestEnrich(input.toDS())
    val q = enriched.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    // batch 1: a right event, then a left event after it (same batch,
    // out-of-order arrival — must be event-time-ordered inside the batch)
    input.addData(
      AsofEvent("k", ts("2021-01-01 10:30:00"), 1, 100L), // left at 10:30
      AsofEvent("k", ts("2021-01-01 10:00:00"), 0, 7L))   // right at 10:00 precedes it
    q.processAllAvailable()
    // batch 2: left event matches state carried from batch 1; a fresh right
    // then a later left picks the new right
    input.addData(
      AsofEvent("k", ts("2021-01-01 11:00:00"), 1, 101L),
      AsofEvent("k", ts("2021-01-01 11:30:00"), 0, 8L),
      AsofEvent("k", ts("2021-01-01 12:00:00"), 1, 102L),
      AsofEvent("x", ts("2021-01-01 12:00:00"), 1, 200L)) // key with no right
    q.processAllAvailable()
    q.stop()
    val out = spark.table("asof_out").as[AsofMatched].collect()
      .map(m => m.id -> m.matchedId).toMap
    assert(out === Map(
      100L -> Some(7L),  // in-batch: right at 10:00 precedes left at 10:30
      101L -> Some(7L),  // state carried across micro-batches
      102L -> Some(8L),  // updated state
      200L -> None))     // no right event for this key
  }

  test("sessionsByGap: closes sessions on gap within callback AND on event-time timeout") {
    import graft.streaming.{SessEvent, SessionOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SessEvent]
    val sessions = StreamingOps.sessionsByGap(input.toDS(),
      watermark = "1 minute", gapMs = 5 * 60 * 1000L)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // batch 1: two events 2 min apart -> one open session, nothing emitted
    input.addData(
      SessEvent("a", ts("2021-01-01 10:02:00"), 2L), // out of order in-batch
      SessEvent("a", ts("2021-01-01 10:00:00"), 1L))
    q.processAllAvailable()
    // batch 2: next event 28 min later -> closes session 1 in the callback
    input.addData(SessEvent("a", ts("2021-01-01 10:30:00"), 3L))
    q.processAllAvailable()
    // batches 3-4: only OTHER keys -> the watermark passes a's gap horizon
    // (10:35) and the open a-session must close via EventTimeTimeout
    input.addData(SessEvent("b", ts("2021-01-01 11:30:00"), 9L))
    q.processAllAvailable()
    input.addData(SessEvent("c", ts("2021-01-01 11:40:00"), 10L))
    q.processAllAvailable()
    q.stop()
    val aSessions = spark.table("sess_out").as[SessionOut].collect()
      .filter(_.key == "a")
      .map(s => (s.start, s.end, s.nEvents, s.firstId, s.lastId)).toSet
    assert(aSessions === Set(
      (ts("2021-01-01 10:00:00"), ts("2021-01-01 10:02:00"), 2L, 1L, 2L),
      (ts("2021-01-01 10:30:00"), ts("2021-01-01 10:30:00"), 1L, 3L, 3L)))
  }

  test("sessionsByGap: cross-batch out-of-order event extends the session backwards") {
    import graft.streaming.{SessEvent, SessionOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SessEvent]
    val sessions = StreamingOps.sessionsByGap(input.toDS(),
      watermark = "10 minutes", gapMs = 5 * 60 * 1000L)
    val q = sessions.writeStream.format("memory").queryName("sess_ooo_out")
      .outputMode("append").start()
    // batch 1: session opens at 10:10
    input.addData(SessEvent("a", ts("2021-01-01 10:10:00"), 1L))
    q.processAllAvailable()
    // batch 2: both events are above the watermark (10:00) but EARLIER than
    // the open session's span — one before its start, one inside it. The
    // start/firstId must extend backwards; lastId must NOT be overwritten.
    input.addData(
      SessEvent("a", ts("2021-01-01 10:08:00"), 0L),
      SessEvent("a", ts("2021-01-01 10:09:00"), 5L))
    q.processAllAvailable()
    // batches 3-4: other keys push the watermark past a's gap horizon
    input.addData(SessEvent("b", ts("2021-01-01 11:00:00"), 9L))
    q.processAllAvailable()
    input.addData(SessEvent("c", ts("2021-01-01 11:10:00"), 10L))
    q.processAllAvailable()
    q.stop()
    val aSessions = spark.table("sess_ooo_out").as[SessionOut].collect()
      .filter(_.key == "a")
      .map(s => (s.start, s.end, s.nEvents, s.firstId, s.lastId)).toSet
    assert(aSessions === Set(
      (ts("2021-01-01 10:08:00"), ts("2021-01-01 10:10:00"), 3L, 0L, 1L)))
  }

  test("sessionsByGap: keyed state survives a checkpoint stop/restart cycle") {
    import graft.streaming.{SessEvent, SessionOut}
    // durability, not just stream==batch: the open-session state must
    // come back from the state-store CHECKPOINT after the query process
    // is torn down — MemoryStream can't restart, so this drives a file
    // source (fully replayable + checkpoint-compatible) through the same
    // operator. The proof shape: events 1+2 are only ever READ before
    // the restart (their file is committed in the checkpoint, never
    // re-listed), the closing event arrives after, so the emitted
    // (10:00, 10:02, n=2) session can only exist if the restarted query
    // recovered the open session from state.
    val root = java.nio.file.Files.createTempDirectory("graft_sess_restart")
    val srcDir = s"$root/src"; val ckpt = s"$root/ckpt"; val outDir = s"$root/out"
    def feed(rows: SessEvent*): Unit =
      rows.toDS().coalesce(1).write.mode("append").parquet(srcDir)
    // durable (fault-tolerant) parquet sink: the memory sink REFUSES
    // checkpoint recovery by design, and durable output is the realistic
    // deployment anyway — its _spark_metadata log also makes the final
    // batch read see exactly the committed files, so the exactly-once
    // assertion below is meaningful
    def start() = StreamingOps.sessionsByGap(
        spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[SessEvent]].schema)
          .parquet(srcDir).as[SessEvent],
        watermark = "1 minute", gapMs = 5 * 60 * 1000L)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val outSchema = implicitly[org.apache.spark.sql.Encoder[SessionOut]].schema
    def emitted(): Seq[SessionOut] =
      spark.read.schema(outSchema).parquet(outDir).as[SessionOut].collect().toSeq
    // run 1: two events 2 min apart -> one OPEN session, nothing emitted
    feed(SessEvent("a", ts("2021-01-01 10:00:00"), 1L),
      SessEvent("a", ts("2021-01-01 10:02:00"), 2L))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(emitted().isEmpty, "session must still be open at shutdown")
    // while DOWN: the closing event (28 min gap) and a watermark pusher
    feed(SessEvent("a", ts("2021-01-01 10:30:00"), 3L),
      SessEvent("b", ts("2021-01-01 11:30:00"), 9L))
    // run 2: same checkpoint, fresh query instance
    val q2 = start()
    q2.processAllAvailable()
    // another key pushes the watermark past a@10:30's gap horizon so the
    // second session closes via EventTimeTimeout — also post-restart
    feed(SessEvent("c", ts("2021-01-01 11:40:00"), 10L))
    q2.processAllAvailable()
    q2.stop()
    val aSessions = emitted().filter(_.key == "a")
      .map(s => (s.start, s.end, s.nEvents, s.firstId, s.lastId))
    // exactly once each, pre-restart events folded into the first session
    assert(aSessions.toSet === Set(
      (ts("2021-01-01 10:00:00"), ts("2021-01-01 10:02:00"), 2L, 1L, 2L),
      (ts("2021-01-01 10:30:00"), ts("2021-01-01 10:30:00"), 1L, 3L, 3L)))
    assert(aSessions.length === 2, "restart must not duplicate emissions")
  }

  test("funnelProgress: online funnel advances across batches, never retroactively") {
    import graft.streaming.{FunnelEvent, FunnelProgress}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val prog = StreamingOps.funnelProgress(input.toDS(),
      Seq("signup", "view", "purchase"))
    val q = prog.writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    // batch 1: signup completes step 1; an out-of-order purchase in the
    // same batch (before the signup in event time) must not count
    input.addData(
      FunnelEvent("a", ts("2021-01-01 10:05:00"), "signup"),
      FunnelEvent("a", ts("2021-01-01 10:00:00"), "purchase"))
    q.processAllAvailable()
    // batch 2: purchase BEFORE any view is ignored even in a later batch;
    // then view + purchase complete the funnel in event-time order
    input.addData(FunnelEvent("a", ts("2021-01-01 10:10:00"), "purchase"))
    q.processAllAvailable()
    input.addData(
      FunnelEvent("a", ts("2021-01-01 10:20:00"), "view"),
      FunnelEvent("a", ts("2021-01-01 10:30:00"), "purchase"),
      FunnelEvent("b", ts("2021-01-01 10:30:00"), "view")) // never signed up
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_out").as[FunnelProgress].collect()
    val aProgress = rows.filter(_.key == "a")
      .map(p => (p.stepsCompleted, p.lastStepTs.get)).toSet
    assert(aProgress === Set(
      (1, ts("2021-01-01 10:05:00")),   // batch 1: signup only
      (3, ts("2021-01-01 10:30:00")))) // batch 3: view+purchase together
    assert(!rows.exists(_.key == "b"), "keys that never advance emit nothing")
  }

  test("runningTotals keeps per-key state across micro-batches (mapGroupsWithState)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[KeyedValue]
    val totals = StreamingOps.runningTotals(input.toDS())
    val q = totals.writeStream.format("memory").queryName("totals_out")
      .outputMode("update").start()
    input.addData(KeyedValue("a", 1.0), KeyedValue("a", 2.0), KeyedValue("b", 5.0))
    q.processAllAvailable()
    input.addData(KeyedValue("a", 3.0)) // second micro-batch: state must carry over
    q.processAllAvailable()
    q.stop()
    val latest = spark.table("totals_out")
      .groupBy("key").agg(max("n").as("n"), max("total").as("total"))
      .as[(String, Long, Double)].collect()
      .map { case (k, n, t) => k -> ((n, t)) }.toMap
    assert(latest("a") === ((3L, 6.0)))
    assert(latest("b") === ((1L, 5.0)))
  }

  test("heavyHitterCandidates: MG summary absorbs batches, hot item survives tail pressure") {
    import graft.streaming.{GroupedItem, HhCandidates}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[GroupedItem]
    val cands = StreamingOps.heavyHitterCandidates(input.toDS(), width = 8)
    val q = cands.writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    // batch 1: hot item + distinct tail wider than the sketch
    input.addData(Seq.fill(30)(GroupedItem("en", "hot")) ++
      (0 until 40).map(i => GroupedItem("en", s"tail_$i")): _*)
    q.processAllAvailable()
    // batch 2: more tail pressure ONLY — hot must survive via carried state
    input.addData((40 until 80).map(i => GroupedItem("en", s"tail_$i")) :+
      GroupedItem("de", "einzig"): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("hh_out").as[HhCandidates].collect()
    val enLast = rows.filter(r => r.group == "en" && r.batchRows == 40L).head
    // n=110 total for en; hot count 30 > 110/(8+1): guaranteed present
    assert(enLast.items.contains("hot"),
      s"hot item must survive cross-batch tail pressure, got ${enLast.items}")
    assert(enLast.items.size <= 8, "state stays bounded at width counters")
    assert(rows.filter(_.group == "de").head.items === Seq("einzig"))
    // each batch emitted one row per group with data
    assert(rows.count(_.group == "en") === 2)
  }

  test("distinctOverStream: running HLL estimate equals the batch sketch over the union") {
    import graft.streaming.{DistinctEstimate, GroupedHash}
    import graft.functions.expr.Fnv64.fnv64
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def h(s: String): Long = {
      import org.apache.spark.unsafe.types.UTF8String
      graft.functions.expr.SimHash64.fnv1a64(UTF8String.fromString(s))
    }
    val input = MemoryStream[GroupedHash]
    val est = StreamingOps.distinctOverStream(input.toDS(), p = 8)
    val q = est.writeStream.format("memory").queryName("distinct_out")
      .outputMode("update").start()
    input.addData((0 until 3000).map(i => GroupedHash("en", h(s"k_$i"))): _*)
    q.processAllAvailable()
    // batch 2 re-ingests 1000 old keys (must not double-count) + 2000 new
    input.addData((2000 until 5000).map(i => GroupedHash("en", h(s"k_$i"))): _*)
    q.processAllAvailable()
    q.stop()
    // registers only grow, so the final state carries the max estimate
    val streamed = spark.table("distinct_out").as[DistinctEstimate].collect()
      .filter(_.group == "en").map(_.estDistinct).max
    import graft.operators.Sketches
    val batch = (0 until 5000).map(i => s"k_$i").toDF("v")
      .agg(Sketches.hllDistinct(fnv64(col("v")), 8).as("s"))
      .select("s.estDistinct").head().getLong(0)
    assert(streamed === batch,
      "stream state after overlapping batches must equal the one-pass batch sketch")
    assert(math.abs(streamed - 5000L) < 5000L * 0.25, s"p=8 sanity: $streamed")
  }

  test("kmvDistinctOverStream: running KMV estimate equals the batch sketch over the union") {
    import graft.streaming.{DistinctEstimate, GroupedHash}
    import graft.functions.expr.Fnv64.fnv64
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def h(s: String): Long = {
      import org.apache.spark.unsafe.types.UTF8String
      graft.functions.expr.SimHash64.fnv1a64(UTF8String.fromString(s))
    }
    val input = MemoryStream[GroupedHash]
    val est = StreamingOps.kmvDistinctOverStream(input.toDS(), k = 256)
    val q = est.writeStream.format("memory").queryName("kmv_out")
      .outputMode("update").start()
    input.addData((0 until 3000).map(i => GroupedHash("en", h(s"k_$i"))): _*)
    q.processAllAvailable()
    // batch 2 re-ingests 1000 old keys (must not double-count) + 2000 new
    input.addData((2000 until 5000).map(i => GroupedHash("en", h(s"k_$i"))): _*)
    q.processAllAvailable()
    q.stop()
    // the k-th min only decreases, so the estimate is monotone and the
    // final state carries the max
    val streamed = spark.table("kmv_out").as[DistinctEstimate].collect()
      .filter(_.group == "en").maxBy(_.estDistinct)
    import graft.operators.Sketches
    val batch = (0 until 5000).map(i => s"k_$i").toDF("v")
      .agg(Sketches.kmvDistinct(fnv64(col("v")), 256).as("s"))
      .select("s.estDistinct").head().getLong(0)
    // identical mergeable state + estimator: the stream's final readout
    // IS the batch sketch of the union (the q100 interop, online)
    assert(streamed.estDistinct === batch,
      "stream state after overlapping batches must equal the one-pass batch sketch")
    assert(math.abs(streamed.estDistinct - 5000L) < 5000L * 0.15,
      s"k=256 sanity: ${streamed.estDistinct}")
  }

  test("outlierGate: stateless flags replay the batch robust gate on the same values") {
    import graft.operators.Quantiles
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vals = (0L until 300L).map(i => 80L + i % 41) ++ Seq(7000L, 1L)
    val batch = vals.toDF("v")
    // the offline pass: the same two bounded readouts robustOutliers runs
    val med = Quantiles.readoutFromCounts(
      Quantiles.histCountsGlobal(batch, "v"), Seq(500)).head
    val mad = Quantiles.readoutFromCounts(
      Quantiles.histCountsGlobal(
        batch.select(abs(col("v") - lit(med)).as("__d")), "__d"), Seq(500)).head
    val want = Quantiles.robustOutliers(batch, "v", kx100 = 300L)
      .as[(Long, Boolean)].collect().toSet
    Quantiles.releaseFrames()
    assert(want.exists(_._2) && want.exists(!_._2), s"fixture must mix: $want")
    val input = MemoryStream[Long]
    val q = StreamingOps.outlierGate(input.toDS().toDF("v"), "v", med, mad, kx100 = 300L)
      .writeStream.format("memory").queryName("outlier_gate_out")
      .outputMode("append").start()
    input.addData(vals: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("outlier_gate_out")
      .select(col("v"), col("v_outlier")).as[(Long, Boolean)].collect().toSet
    assert(streamed === want,
      "streaming flags must equal the batch gate's flags value-for-value")
    // keep inverts the flag; a null value is unflagged-unknown but kept
    val nulls = StreamingOps.outlierGate(
        Seq[Option[Long]](Some(7000L), None).toDF("v"), "v", med, mad, 300L)
      .as[(Option[Long], Option[Boolean], Boolean)].collect().toSet
    assert(nulls === Set((Some(7000L), Some(true), false), (None, None, true)))
  }

  test("uniformSampleOverStream: readout equals the batch sample over the union, dedup-stable") {
    import graft.streaming.{GroupedId, SampleReadout}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[GroupedId]
    val est = StreamingOps.uniformSampleOverStream(input.toDS(), k = 25)
    val q = est.writeStream.format("memory").queryName("sample_out")
      .outputMode("update").start()
    input.addData((0L until 400L).map(GroupedId("en", _)): _*)
    q.processAllAvailable()
    // batch 2 re-ingests 100 old ids (set semantics: no double slots) + 600 new
    input.addData((300L until 1000L).map(GroupedId("en", _)): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sample_out").as[SampleReadout].collect()
      .filter(_.group == "en").last
    val batch = graft.operators.Sampling.uniformSampleState(
        (0L until 1000L).toDF("id"), "id", 25)
      .as[Long].collect().toSeq
    assert(streamed.filled === 25L)
    assert(streamed.ids === batch,
      "stream state after overlapping batches must equal the one-pass batch sample, in order")
  }

  test("weightedQuotaOverStream: readout equals the batch weighted quota over the union") {
    import graft.streaming.{SampleReadout, WeightedGroupedId}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def w(id: Long): Long = id % 37 + 1 // deterministic weights, ties included
    val input = MemoryStream[WeightedGroupedId]
    val est = StreamingOps.weightedQuotaOverStream(input.toDS(), quota = 20)
    val q = est.writeStream.format("memory").queryName("wquota_out")
      .outputMode("update").start()
    input.addData((0L until 300L).map(i => WeightedGroupedId("en", i, w(i))): _*)
    q.processAllAvailable()
    // batch 2 re-ingests 100 old ids (set semantics) + 500 new
    input.addData((200L until 800L).map(i => WeightedGroupedId("en", i, w(i))): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("wquota_out").as[SampleReadout].collect()
      .filter(_.group == "en").last
    val batch = graft.operators.Sampling.weightedQuotaPerGroup(
        (0L until 800L).map(i => (i, "en", w(i))).toDF("id", "g", "wt"),
        Seq("g"), "id", "wt", 20)
      .orderBy(col("w_key"), col("id"))
      .select("id").as[Long].collect().toSeq
    assert(streamed.filled === 20L)
    assert(streamed.ids === batch,
      "stream state after overlapping batches must equal the batch quota draw, in key order")
  }

  test("spanShareGate: stateless ingest gate matches the batch incremental share") {
    import graft.dedup.{Ingest, SpanDedup}
    import graft.streaming.StreamDoc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val corpus = Seq(
      (1L, s"unique one two three $shared tail one"),
      (2L, s"different prefix words here and more $shared closing words"))
      .toDF("doc_id", "text")
    val state = SpanDedup.spanState(corpus, "doc_id", "text", k = 8)
    val bloom = Ingest.buildBloom(state, "key", expectedKeys = 100, fpp = 0.001)

    // batch: doc 10 is mostly the state passage (drops), doc 11 clean
    // (keeps); no within-batch duplication, so the per-row gate and the
    // batch incremental form agree exactly (modulo bloom FPs, ~1e-4 here)
    val batchRows = Seq(
      (10L, s"intro $shared outro done"),
      (11L, "completely original writing with no shared content at all whatsoever"))
    val input = MemoryStream[StreamDoc]
    val gated = StreamingOps.spanShareGate(input.toDS(), bloom, k = 8, maxPermille = 500)
    val q = gated.writeStream.format("memory").queryName("span_gate_out")
      .outputMode("append").start()
    input.addData(batchRows.map { case (id, t) =>
      StreamDoc(id, ts("2021-01-01 10:00:00"), t) }: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("span_gate_out")
      .select("doc_id", "n_tokens", "dup_tokens", "dup_permille", "keep")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    val batch = SpanDedup.dupSpanShareIncremental(state,
        batchRows.toDF("doc_id", "text"), "doc_id", "text", k = 8, maxPermille = 500)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(streamed === batch,
      "per-row streaming gate must equal the batch incremental share on a no-within-batch-dup batch")
    assert(!streamed.find(_._1 == 10L).get._5 && streamed.find(_._1 == 11L).get._5,
      "passage doc drops, clean doc keeps")
  }

  test("nearDupGate: stateless probe equals the batch incremental verdicts") {
    import graft.dedup.NearDedup
    import graft.streaming.StreamDoc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hist = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (2L, "totally different content with its own words entirely"),
      (3L, "third historic document about storage engines and parquet files"))
      .toDF("doc_id", "text")
    def sigsOf(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id").as("id"),
      graft.functions.expr.SimHash64.simhash64(
        graft.functions.TextFunctions.tokens(col("text"))).as("sig"))
    val state = NearDedup.simhashState(sigsOf(hist), maxHamming = 6)
    val keyMap = NearDedup.simhashKeyMap(state)

    // batch: 10 = exact copy of history doc 1 (hamming 0 → drop);
    // 11 = novel text (keeps); no within-batch near-dups by construction
    val batchRows = Seq(
      (10L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (11L, "completely original writing with no shared phrasing at all whatsoever"))
    val input = MemoryStream[StreamDoc]
    val gated = StreamingOps.nearDupGate(input.toDS(), keyMap, maxHamming = 6)
    val q = gated.writeStream.format("memory").queryName("neardup_gate_out")
      .outputMode("append").start()
    input.addData(batchRows.map { case (id, t) =>
      StreamDoc(id, ts("2021-01-01 10:00:00"), t) }: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("neardup_gate_out")
      .select("doc_id", "min_hamming", "keep")
      .as[(Long, Option[Long], Boolean)].collect().toSeq.sortBy(_._1)

    // batch twin: per batch id, the min hamming over its incremental pairs
    val batchPairs = NearDedup.simhashPairsIncremental(state,
        sigsOf(batchRows.toDF("doc_id", "text")), maxHamming = 6)
      .as[(Long, Long, Int)].collect()
    val batchMin = batchRows.map(_._1).map { id =>
      val hs = batchPairs.collect { case (a, b, h) if a == id || b == id => h.toLong }
      id -> (if (hs.isEmpty) None else Some(hs.min))
    }.toMap
    streamed.foreach { case (id, mh, keep) =>
      assert(keep === batchMin(id).isEmpty,
        s"keep($id) must match the batch incremental (pairs: ${batchMin(id)})")
      // where the batch flags a near-dup, the stream's min must agree
      // (the stream may ALSO report a >maxHamming chunk-collision min —
      // that row keeps either way)
      batchMin(id).foreach(m => assert(mh.contains(m),
        s"min_hamming($id): stream $mh vs batch $m"))
    }
    assert(streamed.find(_._1 == 10L).exists(r => !r._3 && r._2.contains(0L)),
      "the exact re-ingest must drop at hamming 0")
    assert(streamed.find(_._1 == 11L).exists(_._3), "the novel doc must keep")
  }

  test("fertilityGate: stateless Viterbi fertility matches the batch encode report") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val train = Seq((1L, "abab abab ab"), (2L, "ab abab")).toDF("doc_id", "text")
    val scores = graft.search.Unigram.fitScores(train, "text",
      maxPieceLen = 4, topV = 10)
    // 10: fertility 1000 (keeps); 11: multi-piece words -> 2000 (drops);
    // 12: an unknown word counts one UNK piece (keeps, n_unk_words 1)
    val batchRows = Seq(
      (10L, "abab abab"),
      (11L, "ababab abababab"),
      (12L, "zq abab"))
    val input = MemoryStream[StreamDoc]
    val gated = StreamingOps.fertilityGate(input.toDS(), scores,
      maxPieceLen = 4, maxPermille = 1500L)
    val q = gated.writeStream.format("memory").queryName("fertility_gate_out")
      .outputMode("append").start()
    input.addData(batchRows.map { case (id, t) =>
      StreamDoc(id, ts("2021-01-01 10:00:00"), t) }: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("fertility_gate_out")
      .select("doc_id", "n_tokens", "n_unk_words", "n_pieces",
        "fertility_permille", "keep")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    val batch = graft.search.Unigram.encode(
        batchRows.toDF("doc_id", "text"), "doc_id", "text", scores, maxPieceLen = 4)
      .withColumn("fertility_permille",
        org.apache.spark.sql.functions.expr("n_pieces * 1000L div greatest(n_tokens, 1L)"))
      .withColumn("keep", col("fertility_permille") <= 1500L)
      .select(col("id"), col("n_tokens"), col("n_unk_words"), col("n_pieces"),
        col("fertility_permille"), col("keep"))
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(streamed === batch,
      "stream fertility verdicts must equal the batch encode report")
    assert(streamed.map(r => r._1 -> r._6).toMap ===
      Map(10L -> true, 11L -> false, 12L -> true))
    assert(streamed.find(_._1 == 12L).get._3 === 1L, "unk word counted")
  }

  test("surpriseGate: stateless bigram-model gate matches the batch scorer, unseen scores 64") {
    import graft.operators.QualitySignals
    import graft.streaming.StreamDoc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val yesterday = Seq((1L, "aaaa"), (2L, "aab")).toDF("doc_id", "text")
    val state = QualitySignals.collectBigramCounts(
      QualitySignals.bigramCounts(yesterday, "text"))

    val batchRows = Seq(
      (30L, "aaaa"),   // all aa (n=4 -> 61): 6100, keeps at 6200
      (31L, "aaxy"),   // (61+64+64)*100 div 3 = 6300 -> drops
      (32L, "x"))      // no bigrams: 0, keeps
    val input = MemoryStream[StreamDoc]
    val gated = StreamingOps.surpriseGate(input.toDS(), state, maxSurpriseX100 = 6200)
    val q = gated.writeStream.format("memory").queryName("surprise_gate_out")
      .outputMode("append").start()
    input.addData(batchRows.map { case (id, t) =>
      StreamDoc(id, ts("2021-01-01 10:00:00"), t) }: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("surprise_gate_out")
      .select("doc_id", "n_bigrams", "surprise_x100", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(streamed === Seq(
      (30L, 3L, 6100L, true), (31L, 3L, 6300L, false), (32L, 0L, 0L, true)))
    // the scored permilles replay bit-for-bit in the batch serving form
    // (which omits the bigram-free doc by contract)
    val batch = QualitySignals.bigramSurpriseAgainst(
        batchRows.toDF("doc_id", "text"), "doc_id", "text",
        QualitySignals.bigramCounts(yesterday, "text"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(streamed.filter(_._2 > 0).map(t => (t._1, t._3, t._2)) === batch)
  }

  test("oovGate: stateless vocab gate matches the batch oovRateAgainst decisions") {
    import graft.search.Lexical
    import graft.streaming.StreamDoc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // vocab trained offline on yesterday's corpus: {the, cat, sat}
    val yesterday = Seq((1L, "the cat sat the cat the")).toDF("id", "txt")
    val vocab = Lexical.vocabFromCounts(
      Lexical.termCounts(yesterday, "id", "txt"), 3)
    val vocabTerms = vocab.as[String].collect().toSeq
    assert(vocabTerms.toSet === Set("the", "cat", "sat"))

    val batchRows = Seq(
      (20L, "the cat sat"),              // 0 permille -> keep
      (21L, "the zyx qqq"),              // 666 -> drop at 500
      (22L, "zz zz zz zz"))              // 1000 -> drop
    val input = MemoryStream[StreamDoc]
    val gated = StreamingOps.oovGate(input.toDS(), vocabTerms, maxPermille = 500)
    val q = gated.writeStream.format("memory").queryName("oov_gate_out")
      .outputMode("append").start()
    input.addData(batchRows.map { case (id, t) =>
      StreamDoc(id, ts("2021-01-01 10:00:00"), t) }: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("oov_gate_out")
      .select("doc_id", "n_tokens", "oov_permille", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(streamed.map(t => (t._1, t._4)) === Seq((20L, true), (21L, false), (22L, false)))
    // the permille itself replays bit-for-bit in the batch scorer
    val batch = Lexical.oovRateAgainst(batchRows.toDF("doc_id", "text"),
        "doc_id", "text", vocab)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(streamed.map(t => (t._1, t._2, t._3)) === batch)
  }

  test("histQuantilesOverStream: readout equals the batch log-histogram on the same data") {
    import graft.streaming.{GroupedValue, QuantileReadout}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // skewed long-tail values across two groups, split over two batches
    val vals = (0 until 4000).map(i => ("a", (i.toLong * i * 131) % 1000000)) ++
      (0 until 900).map(i => ("b", (i % 30).toLong)) // identity buckets: exact
    val input = MemoryStream[GroupedValue]
    val qs = Seq(500, 900, 990)
    val est = StreamingOps.histQuantilesOverStream(input.toDS(), qs)
    val q = est.writeStream.format("memory").queryName("quant_out")
      .outputMode("update").start()
    val (b1, b2) = vals.splitAt(2500)
    input.addData(b1.map { case (g, v) => GroupedValue(g, v) }: _*)
    q.processAllAvailable()
    input.addData(b2.map { case (g, v) => GroupedValue(g, v) }: _*)
    q.processAllAvailable()
    q.stop()
    // last emitted readout per group = full-stream state
    val streamed = spark.table("quant_out").as[QuantileReadout].collect()
      .groupBy(_.group).map { case (g, rows) => g -> rows.maxBy(_.n) }
    val batch = graft.operators.Quantiles.histQuantiles(
        vals.toDF("g", "x"), "g", "x", qs)
      .select("g", "q_permille", "est").as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (g, rows) =>
        g -> rows.map(r => (r._2.toInt, r._3)).sortBy(_._1).toSeq
      }
    for (g <- Seq("a", "b")) {
      val s = streamed(g).ests.map(e => (e.qPermille, e.est)).sortBy(_._1)
      assert(s === batch(g),
        s"group $g: streaming readout $s must equal batch ${batch(g)}")
    }
    assert(streamed("a").n === 4000L && streamed("b").n === 900L)
  }

  test("cmsOverStream: running watch-hash estimates equal the batch CMS over the union") {
    import graft.streaming.{CmsReadout, GroupedHash}
    import graft.operators.CountMin
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 600 keys per group with skewed counts, split across two batches
    val rows = for {
      g <- Seq("a", "b"); i <- 0 until 600; _ <- 0 until (i % 5 + 1)
    } yield (g, graft.operators.Sketches.mix64(i * 2654435761L + g.hashCode))
    val watch = (0 until 8).map(i =>
      graft.operators.Sketches.mix64(i * 2654435761L + "a".hashCode))
    val input = MemoryStream[GroupedHash]
    val est = StreamingOps.cmsOverStream(input.toDS(), d = 4, w = 512, watch)
    val q = est.writeStream.format("memory").queryName("cms_out")
      .outputMode("update").start()
    val (b1, b2) = rows.splitAt(1000)
    input.addData(b1.map { case (g, h) => GroupedHash(g, h) }: _*)
    q.processAllAvailable()
    input.addData(b2.map { case (g, h) => GroupedHash(g, h) }: _*)
    q.processAllAvailable()
    q.stop()
    // final per-group readout must equal batch-built state probed the same way
    val streamed = spark.table("cms_out").as[CmsReadout].collect()
      .groupBy(_.group).map { case (g, rs) =>
        // update mode re-emits per batch with no row order guarantee;
        // counts only grow, so the cumulative row has the largest sum
        g -> rs.maxBy(_.ests.map(_.est).sum)
          .ests.map(e => (e.hash, e.est)).sortBy(_._1)
      }
    for (g <- Seq("a", "b")) {
      val batchState = rows.filter(_._1 == g).map(_._2).toDF("h")
        .agg(CountMin.cmsState(col("h"), 4, 512).as("st"))
        .head().getAs[Array[Byte]](0)
      val expected = watch.map(h =>
        (h, CountMin.cmsEstimateOf(batchState, h, 4, 512))).sortBy(_._1)
      assert(streamed(g) === expected,
        s"group $g: streaming estimates must equal batch CMS probes")
    }
    // the watch hashes belong to group a's key space: all its counts > 0
    assert(streamed("a").forall(_._2 > 0L))
  }

  test("nearDupFlags: ingest-time near-dup detection with state across batches") {
    import graft.streaming.{NearDupFlag, StreamDoc}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lorem = (0 until 40).map(i => s"word$i").mkString(" ")
    val loremNear = (0 until 40).map(i => if (i == 7) "CHANGED" else s"word$i").mkString(" ")
    val other = (0 until 40).map(i => s"tok$i").mkString(" ")
    val input = MemoryStream[StreamDoc]
    val flags = StreamingOps.nearDupFlags(input.toDS(), shingleLen = 3,
      k = 16, bands = 4, threshold = 0.5)
    val q = flags.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    input.addData(
      StreamDoc(1L, ts("2021-01-01 10:00:00"), lorem),
      StreamDoc(2L, ts("2021-01-01 10:01:00"), other))
    q.processAllAvailable()
    input.addData( // second micro-batch: state must carry the corpus over
      StreamDoc(3L, ts("2021-01-01 10:02:00"), loremNear), // near-dup of 1
      StreamDoc(4L, ts("2021-01-01 10:03:00"), lorem),     // exact dup of 1
      StreamDoc(5L, ts("2021-01-01 10:04:00"),
        (100 until 140).map(i => s"w$i").mkString(" ")))    // novel
    q.processAllAvailable()
    q.stop()
    // reduce per-band flags to per-doc verdicts: dup if ANY band matched
    val verdicts = spark.table("neardup_out").as[NearDupFlag].collect()
      .groupBy(_.docId).view
      .mapValues(_.flatMap(_.dupOf).headOption).toMap
    assert(verdicts(1L) === None)
    assert(verdicts(2L) === None)
    assert(verdicts(3L) === Some(1L), "near-dup must match the cross-batch survivor")
    assert(verdicts(4L) === Some(1L), "exact dup must match the cross-batch survivor")
    assert(verdicts(5L) === None)
  }

  test("ingestGate: snapshot keys drop at the bloom, maybes verify exactly, stream dups suppress cross-batch") {
    import graft.streaming.{IngestKey, NewKey}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // published snapshot: keys 100 and 200. The filter ALSO claims 300
    // (standing in for a false positive / stale filter entry) — layer 2's
    // exact verification must rescue it.
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.03)
    Seq(100L, 200L, 300L).foreach(bloom.putLong)
    val stateKeys = Seq(100L, 200L).toDF("key")

    val input = MemoryStream[IngestKey]
    val gated = StreamingOps.ingestGate(input.toDS(), bloom, stateKeys,
      watermark = "1 minute", horizonMs = 60 * 60 * 1000L)
    val q = gated.writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()

    // batch 1: snapshot dup (100), fresh key 1 twice (smaller id wins),
    // and the filter's phantom 300 (maybe -> verified new)
    input.addData(
      IngestKey(100L, 11L, ts("2021-01-01 10:00:00")),
      IngestKey(1L, 52L, ts("2021-01-01 10:00:30")),
      IngestKey(1L, 51L, ts("2021-01-01 10:00:10")),
      IngestKey(300L, 53L, ts("2021-01-01 10:00:20")))
    q.processAllAvailable()
    // batch 2: key 1 re-arrives (cross-batch suppress), key 400 is new,
    // snapshot key 200 drops at the bloom
    input.addData(
      IngestKey(1L, 61L, ts("2021-01-01 10:05:00")),
      IngestKey(400L, 62L, ts("2021-01-01 10:05:10")),
      IngestKey(200L, 63L, ts("2021-01-01 10:05:20")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ingest_out").as[NewKey].collect()
      .map(n => (n.key, n.id)).toSet
    assert(out === Set((1L, 51L), (300L, 53L), (400L, 62L)),
      s"got $out")
  }

  test("ngramQualityGate: streaming decisions replay the batch classifier gate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.classify.NgramScorer
    import graft.streaming.StreamDoc
    val B = 1 << 16
    val train = Seq(
      (1L, "quality prose common", true), (2L, "fine quality writing common", true),
      (3L, "spam junk common", false), (4L, "junk spam noise common", false))
      .toDF("id", "txt", "lab")
    val weights = NgramScorer.train(train, "txt", "lab = true", B)
    val wMap = NgramScorer.collectWeights(weights)

    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val arrivals = Seq(
      StreamDoc(10L, t0, "quality prose"), StreamDoc(11L, t0, "spam junk"),
      StreamDoc(12L, t0, "totally unseen"), StreamDoc(13L, t0, null))
    val input = MemoryStream[StreamDoc]
    val gated = StreamingOps.ngramQualityGate(input.toDS(), wMap, B, thresholdPpm = 0L)
    input.addData(arrivals: _*)
    val q = gated.writeStream.format("memory").queryName("ngram_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ngram_gate")
      .select("doc_id", "n_feats", "score_ppm", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSet

    val batch = NgramScorer.qualityGate(
        arrivals.map(d => (d.docId, d.text)).toDF("doc_id", "text"),
        "doc_id", "text", weights, B, thresholdPpm = 0L)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(streamed === batch, s"stream $streamed != batch $batch")
    assert(batch.exists(!_._4) && batch.exists(_._4), "fixture must split")
  }

  test("dsirGate: streaming admission replays the batch DSIR scorer") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.classify.Dsir
    import graft.streaming.StreamDoc
    val B = 1 << 16
    val target = Seq((101L, "old books fine books"), (102L, "rare books archive"))
      .toDF("id", "txt")
    val raw = Seq((1L, "old books fine books"), (2L, "rare books archive"),
      (3L, "click here buy now"), (4L, "free spam offer now")).toDF("id", "txt")
    val (lambda, const) = Dsir.lambdaWeights(
      Dsir.fitState(target, raw, "txt", B), B)
    val lamMap = Dsir.collectLambda(lambda)
    val cQ16 = const.head().getLong(0)

    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val arrivals = Seq(
      StreamDoc(10L, t0, "old books archive"), StreamDoc(11L, t0, "buy spam now"),
      StreamDoc(12L, t0, null))
    val input = MemoryStream[StreamDoc]
    val gated = StreamingOps.dsirGate(input.toDS(), lamMap, cQ16, B,
      thresholdQ16 = 0L)
    input.addData(arrivals: _*)
    val q = gated.writeStream.format("memory").queryName("dsir_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dsir_gate")
      .select("doc_id", "n_tokens", "score_q16", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSet

    val batch = Dsir.score(
        arrivals.map(d => (d.docId, d.text)).toDF("doc_id", "text"),
        "doc_id", "text", lambda, const, B)
      .withColumn("keep", col("score_q16") >= 0L)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(streamed === batch, s"stream $streamed != batch $batch")
    assert(batch.exists(!_._4) && batch.exists(_._4), "fixture must split")
  }

  test("gopherGate is streaming-safe: per-arrival flags equal the batch gate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // stateless projection => applies to a readStream frame unchanged;
    // this pins that it STAYS stateless (an accidental window/agg would
    // fail to start in append mode without a watermark)
    val rows = Seq(
      (1L, ("the cat sat with a dog and that was fine here " * 3).trim),
      (2L, "too short"),
      (3L, Seq.fill(30)("- bullet the a of and item").mkString("\n")))
    val input = MemoryStream[(Long, String)]
    val gated = graft.operators.QualitySignals.gopherGate(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", minTokens = 20)
    input.addData(rows: _*)
    val q = gated.writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("gopher_stream")
      .select("doc_id", "viol_mask", "keep").as[(Long, Long, Boolean)]
      .collect().toSet
    val batch = graft.operators.QualitySignals.gopherGate(
        rows.toDF("doc_id", "text"), "doc_id", "text", minTokens = 20)
      .select("doc_id", "viol_mask", "keep").as[(Long, Long, Boolean)]
      .collect().toSet
    assert(streamed === batch, s"stream $streamed != batch $batch")
    assert(batch.exists(!_._3) && batch.exists(_._3), "fixture must split")
  }

  test("psiOverStream: running PSI equals the batch psiDrift once the stream absorbed the batch") {
    import graft.streaming.{GroupedValue, PsiReadout}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // reference: mixture around small octaves; current: shifted upward
    val refVals = (0 until 1200).map(i => ((i % 40) + 1).toLong)
    val curVals = (0 until 800).map(i => (((i % 40) + 1) * 16).toLong) ++
      Seq(0L, 0L) // exercise the v=0 sentinel bucket
    val refPpm = graft.operators.Profiling.collectOctaveShares(
      refVals.map(Tuple1(_)).toDF("v"), "v")
    val input = MemoryStream[GroupedValue]
    val est = StreamingOps.psiOverStream(input.toDS(), refPpm)
    val q = est.writeStream.format("memory").queryName("psi_out")
      .outputMode("update").start()
    val (b1, b2) = curVals.splitAt(300)
    input.addData(b1.map(v => GroupedValue("g", v)): _*)
    q.processAllAvailable()
    input.addData(b2.map(v => GroupedValue("g", v)): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("psi_out").as[PsiReadout].collect().maxBy(_.n)
    val batch = graft.operators.Profiling.psiDrift(
        refVals.map(Tuple1(_)).toDF("v"), curVals.map(Tuple1(_)).toDF("v"), "v")
      .select("psi_q16ppm").as[Long].head()
    assert(streamed.n === curVals.length.toLong)
    assert(streamed.psiQ16ppm === batch,
      s"stream ${streamed.psiQ16ppm} != batch $batch")
    assert(batch > 0L, "a 4-octave shift must register")
  }

  test("hygieneGate: streaming verdicts replay the batch hygiene audit") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val rows = Seq(
      StreamDoc(1L, ts(1), "clean text here"),
      StreamDoc(2L, ts(2), "echo <|endoftext|> marker"),
      StreamDoc(3L, ts(3), "moji caf\u00C3\u00A9 bake"),
      StreamDoc(4L, ts(4), "ctrlhere"))
    val input = MemoryStream[StreamDoc]
    val q = StreamingOps.hygieneGate(input.toDS())
      .writeStream.format("memory").queryName("hyg_out")
      .outputMode("append").start()
    input.addData(rows.take(2): _*); q.processAllAvailable()
    input.addData(rows.drop(2): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hyg_out")
      .select("doc_id", "n_special", "n_mojibake", "n_ctrl", "clean")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    val batch = graft.operators.QualitySignals.hygieneAudit(
        rows.map(d => (d.docId, d.text)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(streamed === batch)
    assert(batch.count(!_._5) === 3, "three planted corruption classes flag")
  }

  test("mediaGate: real P6 decode gates arrivals; malformed quarantines, decisions replay in batch") {
    import graft.multimodal.Ppm
    import graft.streaming.MediaArrival
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // id=3 -> 7x6=42 px (in band), id=0 -> 4x3=12 px (below 20),
    // truncated payload -> quarantine
    val arrivals = Seq(
      MediaArrival(1L, ts(1), Ppm.synthPayload(3L)),
      MediaArrival(2L, ts(2), Ppm.synthPayload(0L)),
      MediaArrival(3L, ts(3), Ppm.synthPayload(3L).dropRight(1)))
    val input = MemoryStream[MediaArrival]
    val q = StreamingOps.mediaGate(input.toDS(), minPixels = 20L, maxPixels = 1000L)
      .writeStream.format("memory").queryName("media_gate_out")
      .outputMode("append").start()
    input.addData(arrivals: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("media_gate_out")
      .select("doc_id", "width", "height", "n_pixels", "keep")
      .as[(Long, Option[Long], Option[Long], Option[Long], Boolean)]
      .collect().toSeq.sortBy(_._1)
    assert(streamed.map(t => (t._1, t._5)) ===
      Seq((1L, true), (2L, false), (3L, false)))
    assert(streamed(0)._2 === Some(7L) && streamed(0)._3 === Some(6L))
    assert(streamed(2)._2 === None, "malformed payload quarantines with null dims")
    // the decisions replay bit-for-bit in the batch decode of the same payloads
    val batch = arrivals.map(a => (a.docId, a.payload)).toDF("doc_id", "payload")
      .select($"doc_id", Ppm.stats($"payload").as("st"))
      .select($"doc_id", $"st",
        element_at($"st", 1).as("width"), element_at($"st", 2).as("height"),
        (element_at($"st", 1) * element_at($"st", 2)).as("n_pixels"))
      .withColumn("keep", $"st".isNotNull &&
        $"n_pixels".between(20L, 1000L))
      .drop("st")
      .as[(Long, Option[Long], Option[Long], Option[Long], Boolean)]
      .collect().toSeq.sortBy(_._1)
    assert(streamed === batch)
  }

  test("audioGate: real WAV decode gates arrivals; silence and malformed drop, decisions replay in batch") {
    import graft.multimodal.Wav
    import graft.streaming.MediaArrival
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // hand-built near-silent clip: valid PCM, every sample 0 -> peak 0
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val silentBody = "WAVE".getBytes("US-ASCII") ++
      ("fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)) ++
      ("data".getBytes("US-ASCII") ++ le32(120) ++ Array.fill(120)(0.toByte))
    val silent = "RIFF".getBytes("US-ASCII") ++ le32(silentBody.length) ++ silentBody
    // id=3 -> 53 samples (in band, loud), id=0 -> 50 samples; band [52, 95]
    val arrivals = Seq(
      MediaArrival(1L, ts(1), Wav.synthPayload(3L)),
      MediaArrival(2L, ts(2), Wav.synthPayload(0L)),   // below band
      MediaArrival(3L, ts(3), silent),                 // in band, peak 0
      MediaArrival(4L, ts(4), Wav.synthPayload(3L).dropRight(1))) // malformed
    val input = MemoryStream[MediaArrival]
    val q = StreamingOps.audioGate(input.toDS(),
        minSamples = 52L, maxSamples = 95L, minPeak = 1L)
      .writeStream.format("memory").queryName("audio_gate_out")
      .outputMode("append").start()
    input.addData(arrivals: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("audio_gate_out")
      .select("doc_id", "sample_rate", "n_samples", "peak_abs", "keep")
      .as[(Long, Option[Long], Option[Long], Option[Long], Boolean)]
      .collect().toSeq.sortBy(_._1)
    assert(streamed.map(t => (t._1, t._5)) ===
      Seq((1L, true), (2L, false), (3L, false), (4L, false)))
    assert(streamed(0)._3 === Some(53L))
    assert(streamed(2)._4 === Some(0L), "silence decodes but drops on the peak floor")
    assert(streamed(3)._2 === None, "malformed payload quarantines with null stats")
    // decisions replay bit-for-bit in the batch decode of the same payloads
    val batch = arrivals.map(a => (a.docId, a.payload)).toDF("doc_id", "payload")
      .select($"doc_id", Wav.stats($"payload").as("st"))
      .select($"doc_id", $"st",
        element_at($"st", 2).as("sample_rate"),
        element_at($"st", 3).as("n_samples"),
        element_at($"st", 5).as("peak_abs"))
      .withColumn("keep", $"st".isNotNull &&
        $"n_samples".between(52L, 95L) && $"peak_abs" >= 1L)
      .drop("st")
      .as[(Long, Option[Long], Option[Long], Option[Long], Boolean)]
      .collect().toSeq.sortBy(_._1)
    assert(streamed === batch)
  }

  test("videoGate: frame-walk validation gates arrivals; decisions replay in batch") {
    import graft.multimodal.PpmSeq
    import graft.streaming.MediaArrival
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val arrivals = Seq(
      MediaArrival(1L, ts(1), PpmSeq.synthPayload(5L, 4)),             // in band
      MediaArrival(2L, ts(2), PpmSeq.synthPayload(5L, 1)),             // below: a still
      MediaArrival(3L, ts(3), PpmSeq.synthPayload(5L, 4).dropRight(1))) // truncated
    val input = MemoryStream[MediaArrival]
    val q = StreamingOps.videoGate(input.toDS(), minFrames = 2L, maxFrames = 100L)
      .writeStream.format("memory").queryName("video_gate_out")
      .outputMode("append").start()
    input.addData(arrivals: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("video_gate_out")
      .select("doc_id", "n_frames", "keep")
      .as[(Long, Option[Long], Boolean)].collect().toSeq.sortBy(_._1)
    assert(streamed === Seq((1L, Some(4L), true), (2L, Some(1L), false),
      (3L, None, false)))
  }

  test("domainGate: state-served verdicts gate arrivals; unknown source drops as no-evidence") {
    import graft.pipeline.Curation
    import graft.streaming.SourcedDoc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // yesterday's corpus: 'hi' is diverse, 'lo' is templated boilerplate
    val corpus = (1 to 6).map(i => (i.toLong, "hi", s"fresh words alpha$i beta$i gamma$i")) ++
      (7 to 12).map(i => (i.toLong, "lo", "same same same same same"))
    val state = Curation.sourceQualityState(
      corpus.toDF("doc_id", "source", "text"), "doc_id", "text", "source")
    val verdicts = Curation.sourceVerdictsFromState(state,
        minMeanTtrPpm = 500000L, minDocs = 5L)
      .as[(String, Long, Long, Boolean)].collect()
      .map { case (s, d, m, k) => s -> ((d, m, k)) }.toMap
    assert(verdicts("hi")._3 && !verdicts("lo")._3)

    val arrivals = Seq(
      SourcedDoc(20L, ts(1), "hi", "anything"),
      SourcedDoc(21L, ts(2), "lo", "anything"),
      SourcedDoc(22L, ts(3), "never-seen.example", "anything"))
    val input = MemoryStream[SourcedDoc]
    val q = StreamingOps.domainGate(input.toDS(), verdicts)
      .writeStream.format("memory").queryName("domain_gate_out")
      .outputMode("append").start()
    input.addData(arrivals: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("domain_gate_out")
      .select("doc_id", "source", "src_docs", "keep")
      .as[(Long, String, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(streamed.map(t => (t._1, t._4)) ===
      Seq((20L, true), (21L, false), (22L, false)))
    // known sources replay the state verdict's numbers bit-for-bit
    assert(streamed(0)._3 === verdicts("hi")._1)
    assert(streamed(1)._3 === verdicts("lo")._1)
    // unknown source is no-evidence: zero docs, null mean, drop
    assert(streamed(2)._3 === 0L)
    assert(spark.table("domain_gate_out").filter($"doc_id" === 22L)
      .select("src_mean_ttr_ppm").head().isNullAt(0))
  }
}
