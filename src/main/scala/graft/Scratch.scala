package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract).
  * Current mode: round-9 scale probes for the round-8 families that
  * lacked the 10x house-convention numbers — per-group closed-form OLS
  * (q165), time-RANGE trailing windows (q169), per-group weighted quota
  * sampling (q172), and the retrieval-eval harness (q173) — plus the
  * BPE `learnMerges` per-step cost at growing k (the r8 VERDICT #6
  * practical-k question: each merge step is 2 Spark actions, so cost
  * must be linear in k with a small constant). Earlier rounds' probe
  * results live in the scaladocs of the operators they measured.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- q165 family: fitLinearByGroup, 1000 groups, y = 3x + bounded
    //      deterministic noise. Cost must be ONE map-side-combinable
    //      aggregation: flat-ish per row, no group-count sensitivity. ----
    for (n <- Seq(1000000L, 10000000L)) {
      val rows = spark.range(n).select(
        pmod(col("id"), lit(1000)).as("g"),
        pmod(col("id") * 7, lit(10000)).as("x"),
        (pmod(col("id") * 7, lit(10000)) * 3 + pmod(hash(col("id")), lit(100))).as("y"))
      time(s"fitLinearByGroup n=$n groups=1000") {
        noop(graft.operators.Regression.fitLinearByGroup(rows, Seq("g"), "x", "y"))
      }
    }

    // ---- q169 family: timeRangeAgg, 1h trailing RANGE window over
    //      (key, ts). One shuffle on the key; per-row cost is the
    //      range-frame scan, bounded by events-per-hour-per-key. ----
    for (n <- Seq(1000000L, 10000000L)) {
      val ev = spark.range(n).select(
        pmod(col("id"), lit(n / 1000)).as("k"),
        timestamp_micros(lit(1700000000000000L) +
          pmod(hash(col("id")), lit(86400L * 30)) * 1000000L).as("ts"),
        pmod(col("id"), lit(97)).as("v"))
      time(s"timeRangeAgg n=$n keys=${n / 1000} window=1h") {
        noop(graft.operators.Windows.timeRangeAgg(ev, Seq("k"), "ts", 3600L,
          Map("n_1h" -> count(lit(1)), "sum_1h" -> sum(col("v")))))
      }
    }

    // ---- q172 family: weightedQuotaPerGroup, 100 groups, quota 100.
    //      One shuffle on the group key; WindowGroupLimit should prune
    //      rows past the quota before the final sort of each group. ----
    for (n <- Seq(1000000L, 10000000L)) {
      val rows = spark.range(n).select(col("id"),
        pmod(col("id"), lit(100)).as("g"),
        (pmod(col("id") * 13, lit(1000)) + 1).as("w"))
      time(s"weightedQuotaPerGroup n=$n groups=100 quota=100") {
        noop(graft.operators.Sampling.weightedQuotaPerGroup(rows, Seq("g"), "id", "w", 100))
      }
    }

    // ---- q173 family: rankedEval over q queries x k=10 ranked rows.
    //      O(queries * k): two pre-aggregations + one join + one
    //      per-query aggregate, all on the same (query_id[, doc_id])
    //      partitioning. ----
    for (q <- Seq(100000L, 1000000L)) {
      // doc_id = hashbase*16 + position: unique within a query by
      // construction (rankedEval raise_errors on duplicates, by design)
      val sys = spark.range(q * 10).select(
        (col("id") / 10).cast("long").as("query_id"),
        (pmod(hash(col("id")), lit(100000)) * 16 + pmod(col("id"), lit(10))).as("doc_id"),
        (pmod(col("id"), lit(10)) + 1).as("rank"))
      val truth = spark.range(q * 5).select(
        (col("id") / 5).cast("long").as("query_id"),
        (pmod(hash(col("id") + 7), lit(100000)) * 16 + pmod(col("id"), lit(5)) + 10).as("doc_id"))
      time(s"rankedEval queries=$q k=10 truth=5") {
        noop(graft.search.Metrics.rankedEval(sys, truth))
      }
    }

    // ---- BPE training at REALISTIC k (VERDICT r9 #5): the r9 probes
    //      stopped at k=24 and extrapolated; this measures the batched
    //      trainer at k=256 directly — per-step wall, plus the merge
    //      table's parquet round-trip at that size (the model artifact
    //      a serving session loads). The synthetic corpus carries
    //      ~30k distinct words over a wide symbol alphabet so 256
    //      merges never run dry; every pass runs at distinct-word
    //      cardinality, so per-step cost should stay the measured
    //      small constant (linear in k), with the batched argmax
    //      amortizing driver actions across accepted merges per pass. ----
    for (nDocs <- Seq(100000L)) {
      val docs = spark.range(nDocs).select(col("id"),
        array_join(transform(sequence(lit(0), lit(29)),
          j => concat(lit("w"), pmod(hash(col("id") * 30 + j), lit(30000)))), " ").as("text"))
        .persist()
      docs.count()
      for (k <- Seq(6, 24)) {
        time(s"learnMerges nDocs=$nDocs k=$k") {
          val (m, w) = graft.search.BpeVocab.learnMerges(docs, "text", k)
          require(m.size == k, s"expected $k merges, got ${m.size}")
          graft.search.BpeVocab.release(w)
        }
        time(s"learnMergesBatched nDocs=$nDocs k=$k") {
          val (m, w) = graft.search.BpeVocab.learnMergesBatched(docs, "text", k)
          require(m.size == k, s"expected $k merges, got ${m.size}")
          graft.search.BpeVocab.release(w)
        }
      }
      for (k <- Seq(64, 256)) {
        val merges = time(s"learnMergesBatched nDocs=$nDocs k=$k") {
          val (m, w) = graft.search.BpeVocab.learnMergesBatched(docs, "text", k)
          require(m.size == k, s"expected $k merges, got ${m.size}")
          graft.search.BpeVocab.release(w)
          m
        }
        val dir = java.nio.file.Files.createTempDirectory("graft_bpe_k").toString
        time(s"merge-table parquet round-trip k=$k") {
          graft.search.BpeVocab.mergesToDF(spark, merges)
            .write.mode("overwrite").parquet(s"$dir/merges")
          val loaded = graft.search.BpeVocab.mergesFromDF(
            spark.read.parquet(s"$dir/merges"))
          require(loaded == merges, s"k=$k merge table must round-trip exactly")
        }
      }
      docs.unpersist()
    }

    // ---- image near-dup at scale (r10): aHash is one codegen
    //      projection; the pair stage rides the chunk-pair multi-index,
    //      so cost must track candidate/output volume, not n². Three
    //      regimes, n/10 docs per planted image identity:
    //      (a) linear-formula tiny images — the DEGENERATE case the
    //          first probe run caught: the closed-form pixel formula is
    //          affine in id mod 256, so 100k "identities" collapse to
    //          <= ~5k distinct rasters → duplicate clusters of hundreds
    //          of docs whose PAIRWISE enumeration is quadratic output
    //          (1M docs ran 396 s producing pair lists nobody should
    //          ask for — dedup of mega-clusters wants representatives,
    //          the q51/q52 path, not pairs). Kept at 100k as the
    //          documented trap.
    //      (b) hashed-pixel tiny (4x3 upsampled) — honest clusters,
    //          isolates the CHUNK-ENTROPY effect: upsampling duplicates
    //          grid columns/rows, collapsing the 8-bit row chunks into
    //          small value subspaces → hot candidate buckets.
    //      (c) hashed-pixel 16x12 — full chunk entropy, the realistic
    //          image-corpus shape. (b) vs (c) at the same n is the
    //          entropy experiment with everything else equal. ----
    def imageProbe(tag: String, n: Long,
                   payload: org.apache.spark.sql.Column, maxHamming: Int): Unit = {
      val sigs = time(s"image aHash $tag n=$n") {
        spark.range(n).select(col("id"),
          graft.multimodal.Ppm.aHash(payload).as("sig"))
          .localCheckpoint(true)
      }
      time(s"image neardup pairs $tag n=$n maxHamming=$maxHamming") {
        noop(graft.dedup.NearDedup.simhashPairsFromSigs(sigs, maxHamming)
          .groupBy("hamming").count())
      }
      graft.CheckpointBlocks.release(sigs)
    }
    {
      import graft.multimodal.Ppm
      def gid(n: Long) = pmod(col("id"), lit(n / 10)).cast("long")
      def tinyLinear(n: Long) = when(pmod(col("id"), lit(3)) === 0,
        Ppm.synthPerturbed(gid(n))).otherwise(Ppm.synth(gid(n)))
      imageProbe("tiny-linear-degenerate", 100000L, tinyLinear(100000L),
        maxHamming = 6)
      imageProbe("tiny-hashed-4x3", 1000000L,
        Ppm.synthHashed(gid(1000000L), 4, 3), maxHamming = 6)
      imageProbe("hashed-16x12", 1000000L,
        Ppm.synthHashed(gid(1000000L), 16, 12), maxHamming = 6)
    }
    spark.stop()
  }
}
