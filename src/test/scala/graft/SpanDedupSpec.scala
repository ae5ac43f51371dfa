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

  test("incremental spans equal batch spans on the union, restricted to the batch") {
    // history: docs 1-3; batch: doc 10 copies history's passage (state
    // hit), docs 11+12 share a NEW passage (within-batch hit), doc 13 clean
    val newShared = "mike november oscar papa quebec romeo sierra tango uniform victor"
    val batch = Seq(
      (10L, s"fresh start then $shared and an ending"),
      (11L, s"one opening $newShared first variant close"),
      (12L, s"two other openers $newShared second variant"),
      (13L, "absolutely original content nothing copied from anywhere at all"))
      .toDF("doc_id", "text")
    val state = SpanDedup.spanState(docs, "doc_id", "text", k = 8)
    val inc = SpanDedup.duplicatedSpansIncremental(state, batch, "doc_id", "text", k = 8)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val unionBatch = SpanDedup.duplicatedSpans(
        docs.unionByName(batch), "doc_id", "text", k = 8)
      .filter($"doc_id" >= 10L)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(inc === unionBatch,
      "incremental must reproduce the batch-on-union result for batch docs")
    assert(inc.map(_._1).toSet === Set(10L, 11L, 12L), "state hit + within-batch pair flagged")

    // the share gate composes the same way
    val share = SpanDedup.dupSpanShareIncremental(state, batch, "doc_id", "text",
        k = 8, maxPermille = 500)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(share.map(_._1) === Seq(10L, 11L, 12L, 13L), "every batch doc appears")
    assert(!share.find(_._1 == 10L).get._5, "state-passage doc dropped")
    assert(share.find(_._1 == 13L).get._5, "clean doc keeps")

    // delta = the batch's new keys only; state ∪ delta covers the batch
    val delta = SpanDedup.spanStateDelta(state, batch, "doc_id", "text", k = 8)
    val batchKeys = SpanDedup.spanState(batch, "doc_id", "text", k = 8)
    assert(delta.join(state, Seq("key"), "left_semi").count() === 0,
      "delta must not repeat state keys")
    assert(state.unionByName(delta).distinct().join(batchKeys, Seq("key"), "left_semi")
      .count() === batchKeys.count(), "state + delta must cover the batch's keys")
  }
}
