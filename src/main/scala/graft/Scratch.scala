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

    for (nDocs <- Seq(100000L)) {
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
