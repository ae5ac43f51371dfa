package graft

import graft.streaming.StreamingOps
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
}
