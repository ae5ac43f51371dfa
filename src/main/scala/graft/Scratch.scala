package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract).
  * Current mode: round-8 scale probes for the three round-7 families
  * that had no measured 10x number yet — centralityPpm (q121's
  * PageRank), densifyAndFill (q123's grid explode), and
  * robustOutliersByGroup (q130's distributed med/MAD) — each at 1x and
  * 10x synthetic scale so the scaladoc scale claims are numbers, not
  * assertions. Earlier rounds' probe results live in the scaladocs of
  * the operators they measured (joinFanoutProfile, bigramSurprise/
  * oovRate, minhash/simhash 10x replicas, incremental dedup batches,
  * the Hamming-join rewrite vs cross join).
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

    // ---- centralityPpm: near-dup pair graph = many small clusters
    //      (chains of ~5) + one mega-hub touching 2% of nodes (the skew
    //      regime the decimal-sum fix protects) ----
    for (n <- Seq(100000, 1000000)) {
      val nodes = spark.range(n.toLong)
      val chain = nodes.filter(col("id") % 5 =!= 4)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      val hub = nodes.filter(col("id") % 50 === 0)
        .select(lit(n.toLong).as("a"), col("id").as("b"))
      val pairs = chain.unionByName(hub).persist()
      pairs.count()
      time(s"centralityPpm n=$n edges=${pairs.count()} iters=3") {
        noop(graft.dedup.Clusters.centralityPpm(pairs, "a", "b"))
      }
      pairs.unpersist()
    }

    // ---- densifyAndFill: keys with 50 observed ticks over a ~500-tick
    //      span -> ~10x grid explode per key ----
    for (k <- Seq(20000, 200000)) {
      val obs = spark.range(k.toLong * 50)
        .select((col("id") % k).as("key"),
          (expr(s"(id div $k) * 10") + pmod(hash(col("id")), lit(7))
            .cast("long")).as("tick"),
          (col("id") % 1000).cast("double").as("v"))
        .groupBy("key", "tick").agg(max(col("v")).as("v"))
        .persist()
      obs.count()
      time(s"densifyAndFill keys=$k obs=${obs.count()}") {
        noop(graft.operators.Windows.densifyAndFill(obs, "key", "tick", Seq("v")))
      }
      obs.unpersist()
    }

    // ---- robustOutliersByGroup: heavy-tailed values over 1000 groups ----
    for (n <- Seq(1000000, 10000000)) {
      val vals = spark.range(n.toLong)
        .select((col("id") % 1000).as("g"),
          (pmod(hash(col("id")), lit(1000)) *
            when(col("id") % 97 === 0, 10000L).otherwise(1L)).cast("long").as("v"))
        .persist()
      vals.count()
      time(s"robustOutliersByGroup n=$n groups=1000") {
        noop(graft.operators.Quantiles.robustOutliersByGroup(vals, "g", "v"))
      }
      graft.operators.Quantiles.releaseFrames()
      vals.unpersist()
    }
    spark.stop()
  }
}
