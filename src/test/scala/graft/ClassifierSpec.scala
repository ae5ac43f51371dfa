package graft

import graft.classify.NgramScorer
import org.apache.spark.sql.functions._

/** Hashed-n-gram linear quality classifier: training semantics, gate
  * behavior, hashing-trick collisions, and the state lifecycle
  * (merge / retract / incremental == single-pass). */
class ClassifierSpec extends SparkSpec {

  private val B = 1 << 16

  private def docs(rows: (Long, String, Boolean)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("id", "txt", "lab")
  }

  // a tiny planted corpus: positives talk quality, negatives talk spam;
  // "common" appears everywhere (should weigh ~0)
  private lazy val corpus = docs(
    (1L, "quality prose common", true),
    (2L, "quality writing common", true),
    (3L, "fine quality prose here common", true),
    (4L, "spam junk common", false),
    (5L, "junk spam spam common", false))

  test("train: discriminative features get signed weights, shared features ~0") {
    val w = NgramScorer.train(corpus, "txt", "lab", B)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def wOf(tok: String): Long = {
      val b = spark.range(1).select(
        graft.functions.expr.Fnv64.fnv64(lit(tok)).bitwiseAND(lit(B - 1L)))
        .head().getLong(0)
      w.getOrElse(b, 0L)
    }
    // quality: 3/3 pos docs, 0/2 neg -> (3+1)/5 - (0+1)/4 in ppm
    assert(wOf("quality") === 4L * 1000000 / 5 - 1000000 / 4)
    // spam: 0 pos, 2/2 neg
    assert(wOf("spam") === 1000000 / 5 - 3L * 1000000 / 4)
    // common: in every doc -> 4/5 - 3/4 in integer div ppm
    assert(wOf("common") === 4L * 1000000 / 5 - 3L * 1000000 / 4)
    // bigram features exist: "quality prose" seen in 2 pos docs
    assert(wOf("quality prose") === 3L * 1000000 / 5 - 1000000 / 4)
  }

  test("qualityGate: positives score above negatives; unseen-only doc scores 0") {
    val w = NgramScorer.train(corpus, "txt", "lab", B)
    val s = spark
    import s.implicits._
    val unl = Seq(
      (10L, "quality prose"), (11L, "spam junk"),
      (12L, "totally unseen tokens"), (13L, null.asInstanceOf[String]))
      .toDF("id", "txt")
    val out = NgramScorer.qualityGate(unl, "id", "txt", w, B, thresholdPpm = 0L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(10L)._3 > 0 && byId(10L)._4, "positive-feature doc clears the gate")
    assert(byId(11L)._3 < 0 && !byId(11L)._4, "negative-feature doc is dropped")
    assert(byId(12L)._2 > 0 && byId(12L)._3 === 0L, "unseen features score 0")
    assert(byId(13L)._2 === 0L && byId(13L)._3 === 0L, "null text -> 0 features, score 0")
  }

  test("bucket collision merges presence: distinct at bucket level") {
    // force total collision with 2 buckets: every feature lands in {0,1};
    // per-doc distinct buckets <= 2 regardless of token count
    val st = NgramScorer.countState(corpus, "txt", "lab", 2)
    val maxN = st.filter(col("bucket") >= 0).agg(max("n")).head().getLong(0)
    assert(maxN <= 5L, "presence counts docs, never raw token occurrences")
  }

  test("state lifecycle: merge of disjoint increments == single pass; retract inverts") {
    val a = corpus.filter(col("id") <= 2)
    val b = corpus.filter(col("id") > 2)
    val whole = NgramScorer.countState(corpus, "txt", "lab", B)
    val merged = NgramScorer.mergeStates(Seq(
      NgramScorer.countState(a, "txt", "lab", B),
      NgramScorer.countState(b, "txt", "lab", B)))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(canon(merged) === canon(whole))
    val retracted = NgramScorer.retractState(whole, b, "txt", "lab", B)
    assert(canon(retracted) === canon(NgramScorer.countState(a, "txt", "lab", B)),
      "retract(whole, b) must equal state(a) exactly")
    // weights from merged state equal weights trained in one pass
    def wCanon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wCanon(NgramScorer.weightsFromState(merged)) ===
      wCanon(NgramScorer.train(corpus, "txt", "lab", B)))
  }

  test("buckets must be a power of two") {
    intercept[IllegalArgumentException] {
      NgramScorer.train(corpus, "txt", "lab", 1000)
    }
  }
}
