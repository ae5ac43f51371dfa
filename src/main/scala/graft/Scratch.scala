package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract).
  * Current mode: round-8 session-2 scale probes for the new operators —
  * bucketed co-located join (write-once shuffle amortization),
  * replayable verified near-dup pairs (cost tracks candidates),
  * weighted priority sampling (TakeOrdered, no shuffle),
  * source-quality gate (one tokenize pass + narrow shuffle), and the
  * htmlToText regex chain (per-row codegen cost) — each at 1x and 10x
  * synthetic scale so the scaladoc scale claims are numbers, not
  * assertions. Earlier rounds' probe results live in the scaladocs of
  * the operators they measured.
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

    // ---- bucketed join: two per-key aggregates over n rows, written
    //      bucketed on the key once, then joined REPEATEDLY — the
    //      amortization claim: the repeat join pays no exchange. ----
    val wh = sys.props("java.io.tmpdir") + "/graft_scratch_wh"
    for (n <- Seq(1000000L, 10000000L)) {
      val keys = n / 50
      def side(tag: String) = spark.range(n)
        .select(pmod(hash(col("id") + lit(tag.hashCode)), lit(keys)).as("k"),
          col("id").as("v"))
        .groupBy("k").agg(count(lit(1)).as(s"n_$tag"), sum("v").as(s"s_$tag"))
      time(s"bucketed write 2x n=$n keys=$keys") {
        graft.sources.Layout.writeBucketed(side("a"), wh, "sc_bkt_a", "k", 32)
        graft.sources.Layout.writeBucketed(side("b"), wh, "sc_bkt_b", "k", 32)
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      time(s"bucketed join x3 n=$n") {
        for (_ <- 1 to 3)
          noop(spark.table("sc_bkt_a").join(spark.table("sc_bkt_b"), "k"))
      }
      time(s"plain join x3 n=$n (counterfactual: shuffles both sides every time)") {
        for (_ <- 1 to 3) noop(side("a").join(side("b"), "k"))
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }

    // ---- verified near-dup pairs on the replayable path: docs of ~40
    //      tokens with every 100th a near-copy of its predecessor; cost
    //      must track candidate volume (banding), never n^2. ----
    for (n <- Seq(20000L, 200000L)) {
      val docs = spark.range(n)
        // every 100th doc copies its predecessor's token stream
        .select(col("id"),
          when(pmod(col("id"), lit(100)) === 99, col("id") - 1)
            .otherwise(col("id")).as("__base"))
        .select(col("id"),
          array_join(transform(sequence(lit(0), lit(39)),
            j => concat(lit("w"),
              pmod(hash(col("__base") * 40 + j), lit(50000)))), " ").as("text"))
        .persist()
      docs.count()
      val feats = graft.functions.TextFunctions.wordShingles(col("text"), 3)
      time(s"verifiedPairsReplayable n=$n") {
        noop(graft.dedup.NearDedup.verifiedPairsReplayable(
          docs, "id", feats, k = 32, bands = 8, thresholdPpm = 300000L))
      }
      docs.unpersist()
    }

    // ---- weighted sample + source gate + htmlToText, 1x/10x ----
    for (n <- Seq(1000000L, 10000000L)) {
      val rows = spark.range(n)
        .select(col("id"), (pmod(col("id"), lit(1000)) + 1).as("w"))
      time(s"weightedPrioritySample n=$n k=1000") {
        noop(graft.operators.Sampling.weightedPrioritySample(rows, "id", "w", 1000))
      }
    }
    for (n <- Seq(100000L, 1000000L)) {
      val docs = spark.range(n)
        .select(col("id"), concat(lit("src"), pmod(col("id"), lit(1000))).as("source"),
          array_join(transform(sequence(lit(0), lit(39)),
            j => concat(lit("w"), pmod(hash(col("id") * 40 + j), lit(20000)))),
            " ").as("text"))
        .persist()
      docs.count()
      time(s"sourceQualityGate n=$n sources=1000") {
        noop(graft.pipeline.Curation.sourceQualityGate(
          docs, "id", "text", "source", 500000L, 5L))
      }
      time(s"htmlToText n=$n") {
        noop(docs.select(col("id"), graft.functions.TextFunctions.htmlToText(
          concat(lit("<html><body><h1>t</h1><p>"), col("text"),
            lit("</p></body></html>"))).as("x")))
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
