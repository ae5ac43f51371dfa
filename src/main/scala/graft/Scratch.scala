package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract).
  * Current mode: round-8 scale probes for the two new curation families —
  * NgramScorer (hashed-n-gram classifier train + score) and SemDedup
  * (within-cell semantic dedup) — each at 1x and 10x synthetic scale so
  * the scaladoc scale claims are numbers, not assertions. Earlier rounds'
  * probe results live in the scaladocs of the operators they measured
  * (centralityPpm, densifyAndFill, robustOutliersByGroup,
  * joinFanoutProfile, bigramSurprise/oovRate, minhash/simhash replicas,
  * incremental dedup batches, the Hamming-join rewrite vs cross join).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- NgramScorer: ~40-token docs over a zipf-ish 20k-word vocab
    //      (w = hash % (1 + hash % 20000) skews mass to low ids);
    //      label = id parity. Train = bounded (bucket,label) shuffle;
    //      score = broadcast weight join, corpus never shuffles. ----
    for (n <- Seq(100000, 1000000)) {
      val docs = spark.range(n.toLong)
        .select(col("id"),
          array_join(transform(sequence(lit(0), lit(39)),
            j => concat(lit("w"),
              pmod(hash(col("id") * 40 + j), lit(1) + pmod(hash(j), lit(20000))))),
            " ").as("text"))
        .persist()
      docs.count()
      val w = time(s"ngram train n=$n") {
        val w0 = graft.classify.NgramScorer.train(docs, "text", "id % 2 = 0", 1 << 18)
          .persist()
        w0.count()
        w0
      }
      time(s"ngram score n=$n") {
        noop(graft.classify.NgramScorer.scoreAgainst(docs, "id", "text", w, 1 << 18))
      }
      w.unpersist(); docs.unpersist()
    }

    // ---- SemDedup: deterministic pseudo-random dim-16 vectors; cells
    //      scale with n (~160 vectors/cell), so candidate volume is
    //      sigma m_cell^2 ~ n * 160, linear in n — the claim under test. ----
    for ((n, cells) <- Seq((20000, 128), (200000, 1024))) {
      val vecs = spark.range(n.toLong)
        .select(col("id"),
          transform(sequence(lit(0), lit(15)),
            j => (pmod(hash(col("id") * 16 + j), lit(1000)) / lit(500.0) -
              lit(1.0)).cast("float")).as("v"))
        .persist()
      vecs.count()
      time(s"semDedup n=$n cells=$cells eps=0.9") {
        noop(graft.similarity.SemDedup.semDedupStride(vecs, "id", "v", cells, 0.9))
      }
      graft.similarity.SemDedup.releaseFrames()
      vecs.unpersist()
    }
    spark.stop()
  }
}
