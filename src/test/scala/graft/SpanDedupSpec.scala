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

  test("maximalMatches: exact boundaries, length, and partners on a planted passage") {
    val got = SpanDedup.maximalMatches(docs, "doc_id", "text", k = 8, minTokens = 8)
      .orderBy("id_a", "id_b", "start_a")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // the 12-token passage sits at positions 4..15 of doc 1 and 6..17 of
    // doc 2; the match is maximal (neighbors differ on both sides) and
    // reported ONCE at its true variable length, not per window
    assert(got === Seq((1L, 2L, 4L, 6L, 12L)))
    // a threshold above the passage length filters it
    assert(SpanDedup.maximalMatches(docs, "doc_id", "text",
      k = 8, minTokens = 13).count() === 0)
  }

  test("maximalMatches: names the per-partner matches a fixed-k island stitches") {
    val p = "p1 p2 p3 p4 p5 p6 p7 p8"
    val q = "q1 q2 q3 q4 q5 q6 q7 q8"
    // doc 1 carries P immediately followed by Q; doc 2 shares only P,
    // doc 3 shares only Q — different partners, adjacent in doc 1
    val three = Seq(
      (1L, s"ax1 ax2 $p $q az1"),
      (2L, s"bx1 $p bz1 bz2 bz3"),
      (3L, s"cy1 cy2 cy3 $q cz1"))
      .toDF("doc_id", "text")
    val matches = SpanDedup.maximalMatches(three, "doc_id", "text", k = 8, minTokens = 8)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // the pair facts name each shared substring with its true partner
    assert(matches === Seq((1L, 2L, 2L, 1L, 8L), (1L, 3L, 10L, 3L, 8L)))
    // the fixed-k island merge on doc 1 stitches the two 8-token runs
    // (start gap 8 <= k) into ONE 16-token span — the bound, not the facts
    val spans = SpanDedup.duplicatedSpans(three, "doc_id", "text", k = 8)
      .filter($"doc_id" === 1L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans === Seq((1L, 2L, 18L, 16L)))
    // containment pin (the r13 VERDICT #5 contract): every maximal-match
    // region lies inside some fixed-k span of the same document
    val allSpans = SpanDedup.duplicatedSpans(three, "doc_id", "text", k = 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val regions = matches.flatMap { case (a, b, sa, sb, n) =>
      Seq((a, sa, sa + n), (b, sb, sb + n)) }
    regions.foreach { case (doc, s, e) =>
      assert(allSpans.exists { case (d, ss, se, _) => d == doc && ss <= s && e <= se },
        s"match region [$s,$e) of doc $doc must sit inside a fixed-k span")
    }
  }

  test("maximalMatches: maxDocFreq cap excludes ultra-hot windows from anchoring") {
    val p = "p1 p2 p3 p4 p5 p6 p7 p8"
    val hot = Seq(
      (1L, s"one $p"), (2L, s"two $p"), (3L, s"three $p"))
      .toDF("doc_id", "text")
    // default cap: all three pairs report the shared window
    assert(SpanDedup.maximalMatches(hot, "doc_id", "text", k = 8, minTokens = 8)
      .count() === 3)
    // cap 2 < the window's doc frequency 3: excluded from anchoring —
    // the documented quadratic bound at corpus scale
    assert(SpanDedup.maximalMatches(hot, "doc_id", "text", k = 8, minTokens = 8,
      maxDocFreq = 2).count() === 0)
  }
}
