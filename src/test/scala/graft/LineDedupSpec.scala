package graft

import graft.dedup.LineDedup
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta\nSHARED FOOTER\nunique one"),
    (2L, "gamma\nSHARED FOOTER\n\nunique two"), // blank line is structure
    (3L, "SHARED FOOTER"),                      // fully boilerplate
    (4L, "no footer here\nshared   FOOTER"))    // case/ws variant still hot
    .toDF("doc_id", "text")

  test("scrubHotLines removes corpus-hot lines, keeps order/case/blank lines") {
    val out = LineDedup.scrubHotLines(docs, "doc_id", "text", minDocFreq = 2)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "alpha beta\nunique one", 2L),
      (2L, "gamma\n\nunique two", 3L), // blank survives (never boilerplate)
      (3L, "", 0L),                    // fully-scrubbed doc stays, empty
      (4L, "no footer here", 1L)))     // normalized variant counted as hot
  }

  test("scrubHotLines with nothing hot is the identity (plus line counts)") {
    val out = LineDedup.scrubHotLines(docs, "doc_id", "text", minDocFreq = 10)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    val orig = docs.orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) === orig)
    assert(out.map(_._3) === orig.map(_._2.split("\n", -1).length.toLong))
  }

  test("scrubHotLines broadcasts the hot set (no corpus shuffle by line)") {
    val plan = LineDedup.scrubHotLines(docs, "doc_id", "text", minDocFreq = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"hot-line removal must be a broadcast anti join, got:\n$plan")
  }

  test("scrubRepeatedLines: first occurrence kept, blanks always survive, null propagates") {
    val in = Seq(
      (1L, "say it\nsay it\n\nSAY   it\nnew line\nsay it"), // norm-dups collapse to first
      (2L, "a\n\nb\n\nc"),                                  // blanks repeat freely
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = LineDedup.scrubRepeatedLines(in, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) === "say it\n\nnew line",
      s"got ${out(0).getString(1)}")
    assert(out(0).getLong(2) === 3L)
    assert(out(1).getString(1) === "a\n\nb\n\nc", "blank lines are structure, never dups")
    assert(out(1).getLong(2) === 5L)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2), "null text null-propagates")
  }

  test("incremental scrub equals the batch scrub on the union, restricted to the batch") {
    // a line hot only ACROSS the boundary (1 state + 1 batch occurrence at
    // minDocFreq 2) must fire; a line hot only within state must not
    // affect batch docs that lack it; a batch-only pair fires too
    val batch = Seq(
      (10L, "fresh alpha\nSHARED FOOTER\nnew promo line"),
      (11L, "other text\nnew promo line\nclosing"),
      (12L, "entirely unique content here"))
      .toDF("doc_id", "text")
    val state = LineDedup.lineState(docs, "doc_id", "text")
    val inc = LineDedup.scrubHotLinesIncremental(state, batch,
        "doc_id", "text", minDocFreq = 2)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    val unionRestricted = LineDedup.scrubHotLines(docs.unionByName(batch),
        "doc_id", "text", minDocFreq = 2)
      .filter($"doc_id" >= 10L)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(inc === unionRestricted,
      "incremental must reproduce the batch-on-union scrub for batch docs")
    assert(inc === Seq(
      (10L, "fresh alpha", 1L),              // footer (state-hot) + promo (pair) gone
      (11L, "other text\nclosing", 2L),      // batch-pair promo line gone
      (12L, "entirely unique content here", 1L)))

    // merged state = union's state (disjoint doc sets)
    val merged = LineDedup.mergeLineState(state,
        LineDedup.lineState(batch, "doc_id", "text"))
      .orderBy("key").as[(Long, Long)].collect().toSeq
    val unionState = LineDedup.lineState(docs.unionByName(batch), "doc_id", "text")
      .orderBy("key").as[(Long, Long)].collect().toSeq
    assert(merged === unionState, "mergeLineState must equal the union's state")
  }
}
