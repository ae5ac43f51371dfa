package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract).
  * Current mode: the round-11 probe — BPE training at k=4096, the
  * production-vocabulary scale the r10 VERDICT flagged as still
  * extrapolated (measured to k=256 at ~0.24 s/merge, 16 min projected).
  * Same worst-case corpus as the r10 probes (100k docs, ~30k distinct
  * words over a dense symbol alphabet, so merges never run dry and
  * every pass runs at full distinct-word cardinality), plus the
  * k=4096 merge-table parquet round-trip (the model artifact a serving
  * session loads). Earlier rounds' probe results live in the scaladocs
  * of the operators they measured and in SCALE.md.
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

    // optional arg selects one probe section (reruns stay cheap):
    //   "hamming" = the incremental-Hamming probe, "bpe" = the k=4096 run
    val mode = args.headOption.getOrElse("all")

    // ---- simhashPairsIncremental house-convention probe: 1M-sig state
    //      materialized to parquet (the persisted-snapshot deployment
    //      shape), 10k-sig batch. Signatures = planted identities with a
    //      few flipped bits, ~10 docs per identity — honest clusters.
    //      Compare: incremental batch dedup vs the full recompute. ----
    if (mode == "all" || mode == "hamming") {
      import org.apache.spark.sql.DataFrame
      def noop(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      // identity = (id mod 1e6) div 10, so the batch's 2e6+k ids land on
      // the SAME identities as state ids k — real state-batch near-dups;
      // per doc, 0-2 bits flipped off the identity signature
      def sigs(n: Long, offset: Long) = spark.range(n).select(
        (col("id") + offset).as("id"),
        expr("""cast(hash(cast((id % 1000000) div 10 as string)) as bigint) * 2654435761
                ^ (case when id % 10 % 3 >= 1 then shiftleft(cast(1 as bigint), cast(id % 61 as int)) else cast(0 as bigint) end)
                ^ (case when id % 10 % 3 = 2 then shiftleft(cast(1 as bigint), cast((id * 7) % 61 as int)) else cast(0 as bigint) end)""")
          .as("sig"))
      val dir = java.nio.file.Files.createTempDirectory("graft_hstate").toString
      val st = graft.dedup.NearDedup.simhashState(sigs(1000000L, 0L), maxHamming = 4)
      time("simhash state build+persist (1M sigs)") {
        st.keys.write.mode("overwrite").parquet(s"$dir/keys")
        st.sigs.write.mode("overwrite").parquet(s"$dir/sigs")
      }
      val loaded = graft.dedup.SimhashState(
        spark.read.parquet(s"$dir/keys"), spark.read.parquet(s"$dir/sigs"))
      val batch = sigs(10000L, 2000000L).localCheckpoint(true)
      time("simhashPairsIncremental batch=10k vs 1M state") {
        noop(graft.dedup.NearDedup.simhashPairsIncremental(loaded, batch, maxHamming = 4))
      }
      val all = sigs(1000000L, 0L).unionByName(batch)
      time("simhashPairsFromSigs FULL recompute 1.01M sigs") {
        noop(graft.dedup.NearDedup.simhashPairsFromSigs(all, maxHamming = 4))
      }
      graft.CheckpointBlocks.release(batch)
    }

    if (mode == "all" || mode == "bpe") for (nDocs <- Seq(100000L)) {
      val docs = spark.range(nDocs).select(col("id"),
        array_join(transform(sequence(lit(0), lit(29)),
          j => concat(lit("w"), pmod(hash(col("id") * 30 + j), lit(30000)))), " ").as("text"))
        .persist()
      docs.count()
      for (k <- Seq(4096)) {
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
    spark.stop()
  }
}
