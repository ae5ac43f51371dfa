package graft

import graft.dedup.SpanDedup

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // 12 shared tokens embedded mid-document in two otherwise-distinct docs
  private val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
  private val docs = Seq(
    (1L, s"unique one two three $shared tail one"),
    (2L, s"different prefix words here and more $shared closing words"),
    (3L, "totally clean document with no copied passage at all whatsoever"))
    .toDF("doc_id", "text")

  test("duplicatedSpans: maximal span boundaries around a planted shared passage") {
    val got = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1: shared run at token positions 4..15 -> one span [4, 16)
    // doc 2: shared run at positions 6..17 -> one span [6, 18)
    // doc 3: nothing
    assert(got === Seq((1L, 4L, 16L, 12L), (2L, 6L, 18L, 12L)))
  }

  test("duplicatedSpans: within-doc repetition alone does not fire (cross-doc only)") {
    val rep = Seq(
      (1L, s"$shared and then $shared"),
      (2L, "nothing in common with the first document at all here today"))
      .toDF("doc_id", "text")
    assert(SpanDedup.duplicatedSpans(rep, "doc_id", "text", k = 8).count() === 0)
  }

  test("dupSpanShare: exact permille, clean docs present, gate fires on heavy copies") {
    val got = SpanDedup.dupSpanShare(docs, "doc_id", "text", k = 8, maxPermille = 500)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // doc 1: 12 dup of 18 tokens -> 666 permille -> drop
    // doc 2: 12 dup of 20 tokens -> 600 permille -> drop
    // doc 3: clean -> keep
    assert(got === Seq(
      (1L, 18L, 12L, 666L, false),
      (2L, 20L, 12L, 600L, false),
      (3L, 10L, 0L, 0L, true)))
  }
}
