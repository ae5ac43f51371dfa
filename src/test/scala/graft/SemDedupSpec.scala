package graft

import graft.similarity.SemDedup
import org.apache.spark.sql.functions._

/** SemDeDup-style within-cell semantic dedup: keep-the-outlier rule,
  * cell locality, and nCells=1 equivalence with the all-pairs rule. */
class SemDedupSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("id", "v")
  }

  test("keep-the-outlier: near-centroid copy drops, farthest member survives") {
    val cents = Seq(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f))
    val corpus = vecs(
      (1L, Seq(1f, 0f, 0f, 0f)),      // cell 0, cs = 1.0
      (2L, Seq(0.9f, 0.1f, 0f, 0f)),  // cell 0, cs ~ 0.994; cos(1,2) ~ 0.994
      (3L, Seq(0.1f, 0.9f, 0f, 0f)),  // cell 1, cs ~ 0.994
      (4L, Seq(0f, 1f, 0f, 0f)),      // cell 1, cs = 1.0; cos(3,4) ~ 0.994
      (5L, Seq(0f, 0f, 1f, 0f)))      // alone in its cell assignment
    val out = SemDedup.semDedup(corpus, "id", "v", cents, eps = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    SemDedup.releaseFrames()
    assert(out === Map(1L -> false, 2L -> true, 3L -> true, 4L -> false, 5L -> true),
      s"got $out — each eps-pair must keep its farthest-from-centroid member")
  }

  test("cross-cell near-dups are not candidates (the documented approximation)") {
    val cents = Seq(Seq(1f, 0.1f, 0f, 0f), Seq(1f, -0.1f, 0f, 0f))
    // two near-identical vectors that straddle the cell boundary
    val corpus = vecs(
      (1L, Seq(1f, 0.01f, 0f, 0f)),
      (2L, Seq(1f, -0.01f, 0f, 0f)))
    val out = SemDedup.semDedup(corpus, "id", "v", cents, eps = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    SemDedup.releaseFrames()
    assert(out.map(_._3).forall(identity), "different cells -> no pair -> both kept")
    assert(out.map(t => t._1 -> t._2).toMap === Map(1L -> 0L, 2L -> 1L))
  }

  test("incremental batch decisions equal the batch run over the union, restricted to the batch") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = graft.similarity.Knn.strideCentroids(embs, "vec_id", "embedding", 8)
    val stateRows = embs.filter(col("vec_id") % 3 =!= 0)
    val batchRows = embs.filter(col("vec_id") % 3 === 0)

    // persist state through parquet — the serving lifecycle
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup").toString
    SemDedup.semDedupState(stateRows, "vec_id", "embedding", cents)
      .write.mode("overwrite").parquet(s"$dir/state")
    val state = spark.read.parquet(s"$dir/state")

    val inc = SemDedup.semDedupIncremental(state, batchRows, "vec_id", "embedding",
        cents, eps = 0.45)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    SemDedup.releaseFrames()

    val full = SemDedup.semDedup(embs, "vec_id", "embedding", cents, eps = 0.45)
      .filter(col("id") % 3 === 0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    SemDedup.releaseFrames()
    assert(inc === full,
      "locality of the dominance rule must make incremental == full-run-restricted")

  }

  test("upsert: a re-ingested id's STALE state copy never dominates the batch") {
    val cents = Seq(Seq(1f, 0f, 0f, 0f))
    // stale id-1 sits low on the keep order (cs ~0.707) and would
    // dominate batch id 2 at eps=0.7 — unless the batch's fresh id-1
    // (cs 1.0, which does NOT dominate id 2) replaces it first
    val stateV = vecs((1L, Seq(0.5f, 0.5f, 0f, 0f)))
    val batch = vecs((1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0.99f, 0.01f, 0f, 0f)))
    val state = SemDedup.semDedupState(stateV, "id", "v", cents)
    val out = SemDedup.semDedupIncremental(state, batch, "id", "v", cents, eps = 0.7)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    SemDedup.releaseFrames()
    assert(out === Map(1L -> false, 2L -> true),
      s"got $out — id 2 kept proves the stale copy was superseded; " +
        "id 1 drops to its own batch neighbor id 2 (lower cent_sim)")
  }

  test("nCells=1 equals the global all-pairs dominance rule on real embeddings") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = SemDedup.semDedupStride(embs, "vec_id", "embedding", 1, eps = 0.45)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    SemDedup.releaseFrames()

    // independent reference: all-pairs cosine + the same dominance rule,
    // with cent_sim vs the single stride centroid
    val cent = graft.similarity.Knn.strideCentroids(embs, "vec_id", "embedding", 1)
    val rows = embs.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val c0 = cent.head.toArray
    val cs = rows.map { case (id, v) => id -> r6(cos(v, c0)) }.toMap
    val expected = rows.map { case (idB, vb) =>
      val dominated = rows.exists { case (idA, va) =>
        idA != idB && r6(cos(va, vb)) >= 0.45 &&
          (cs(idA) < cs(idB) || (cs(idA) == cs(idB) && idA < idB))
      }
      idB -> !dominated
    }.toMap
    assert(out === expected)
    assert(expected.values.exists(!_), "fixture must produce at least one drop")
  }
}
