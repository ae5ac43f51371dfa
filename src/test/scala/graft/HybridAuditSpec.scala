package graft

import graft.dedup.NearDedup
import graft.functions.TextFunctions
import graft.search.Hybrid
import org.apache.spark.sql.functions._

/** RRF hybrid fusion and the banding quality-audit surface:
  * hand-computed fusion scores, loud rank validation, confusion-matrix
  * arithmetic, candidate/verified consistency, and the bounded-truth
  * guard. */
class HybridAuditSpec extends SparkSpec {

  private def ranked(rows: (Long, Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("query_id", "doc_id", "rank")
  }

  test("rrfFuse: hand-computed scores, agreement count, ordering") {
    val lex = ranked((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
    val vec = ranked((1L, 11L, 1L), (1L, 13L, 2L))
    val got = Hybrid.rrfFuse(Seq(lex, vec), topK = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    // doc 11: ranks 2 and 1 -> 1e6/62 + 1e6/61 (integer div)
    assert(got(11L)._1 === 1000000L / 62 + 1000000L / 61)
    assert(got(11L)._2 === 2L) // surfaced by both retrievers
    assert(got(10L)._1 === 1000000L / 61 && got(10L)._2 === 1L)
    // fused order: 11 (two lists) first, then 10, then 13, then 12
    val fusedRank = got.map { case (d, (_, _, rk)) => d -> rk }
    assert(fusedRank === Map(11L -> 1L, 10L -> 2L, 13L -> 3L, 12L -> 4L))
  }

  test("rrfFuse: zero or null rank fails loudly") {
    val bad = ranked((1L, 10L, 0L))
    val e = intercept[Exception] {
      Hybrid.rrfFuse(Seq(bad), topK = 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("rrfFuse")))
  }

  private def pairs(rows: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("id_a", "id_b")
  }

  test("pairRecallAudit: hand confusion matrix") {
    val r = NearDedup.pairRecallAudit(
      pairs((1L, 2L), (1L, 3L)), pairs((1L, 2L), (1L, 4L))).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((2L, 2L, 1L, 1L, 1L)))
    assert(r.getLong(5) === 500000L && r.getLong(6) === 500000L)
  }

  test("pairRecallAudit: empty candidate side yields null precision, zero recall") {
    val r = NearDedup.pairRecallAudit(
      pairs((1L, 2L)), pairs().limit(0)).head()
    assert(r.getLong(0) === 1L && r.getLong(1) === 0L)
    assert(r.isNullAt(5), "precision over zero candidates must be null")
    assert(r.getLong(6) === 0L)
  }

  private lazy val dupCorpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different text about spark shuffles and joins"),
      (4L, "another unrelated document discussing parquet row groups"))
      .toDF("doc_id", "text")
  }

  test("minhashCandidates is a superset of verified minhashPairs output") {
    val feats = TextFunctions.wordShingles(col("text"), 3)
    val verified = NearDedup.minhashPairs(dupCorpus, "doc_id", "text",
        shingleLen = 3, k = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = NearDedup.minhashCandidates(dupCorpus, "doc_id", feats,
        k = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty, "fixture must surface the planted near-dup")
    assert(verified.subsetOf(cands),
      s"verified $verified must be within candidates $cands")
    assert(verified.contains((1L, 2L)))
  }

  test("exactJaccardPairs: integer ppm and the planted pair") {
    val got = NearDedup.exactJaccardPairs(dupCorpus, "doc_id",
        TextFunctions.wordShingles(col("text"), 3), thresholdPpm = 300000L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // docs 1/2 share 7 of their 8+8 3-shingles (union 9): 7e6 div 9
    assert(got.keySet === Set((1L, 2L)))
    assert(got((1L, 2L)) === 7000000L / 9)
  }

  test("minhashCandidatesReplayable: slots match the hand-computed " +
    "fnv/splitmix pipeline on a one-shingle doc") {
    // one shingle -> every slot is exactly mix(fnv(shingle) ^ seed_i);
    // bucket b folds acc = b+1 through its 4 slots. Recompute in plain
    // Scala and require the banding to pair two docs with that identical
    // single shingle (identical slots -> identical buckets, all bands).
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "x")).toDF("doc_id", "text")
    val cands = NearDedup.minhashCandidatesReplayable(docs, "doc_id",
        TextFunctions.wordShingles(col("text"), 3), k = 32, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands === Set((1L, 2L)),
      "identical docs must collide in every band; the shingle-less doc in none")
  }

  test("minhashCandidatesReplayable: near-dup surfaced, audit counts consistent") {
    val feats = TextFunctions.wordShingles(col("text"), 3)
    val truth = NearDedup.exactJaccardPairs(dupCorpus, "doc_id", feats,
      thresholdPpm = 300000L)
    val cands = NearDedup.minhashCandidatesReplayable(dupCorpus, "doc_id",
      feats, k = 32, bands = 8)
    val r = NearDedup.pairRecallAudit(truth, cands).head()
    assert(r.getLong(0) === 1L) // the planted 7/9-jaccard pair
    assert(r.getLong(2) === 1L && r.getLong(4) === 0L,
      "j~0.78 pair must be caught at k=32/bands=8 with these fixed seeds")
    assert(r.getLong(6) === 1000000L)
  }

  test("exactJaccardPairs: sample bound fails loudly") {
    val s = spark
    import s.implicits._
    val big = (1L to 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      NearDedup.exactJaccardPairs(big, "doc_id",
        TextFunctions.wordShingles(col("text"), 2), 100000L,
        maxSampleRows = 10L)
    }
    assert(e.getMessage.contains("maxSampleRows"))
  }
}
