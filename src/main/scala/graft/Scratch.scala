package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract).
  * Current mode: round-7 second-block probes — (a) joinFanoutProfile's
  * cost vs actually materializing a skew-exploding join, (b) the
  * corpus-scan text scorers (bigramSurprise, oovRate) at 1x vs 10x
  * corpus. Earlier rounds' probe results live in the scaladocs of the
  * operators they measured.
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

    // ---- probe A: pricing a fan-out join WITHOUT running it ----------
    // 2M-row sides, 100k keys, plus ONE hot key carrying 3k x 4k rows:
    // the inner join output is ~12M rows from that key alone.
    val n = 2000000L
    val left = spark.range(n).select(
      when(col("id") < 3000, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(100000L)) + 1).as("k"))
    val right = spark.range(n).select(
      when(col("id") < 4000, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(7)), lit(100000L)) + 1).as("k"))
    // session/codegen warmup so the first timed job isn't charged for it
    time("warmup (scan both sides)") { left.count(); right.count() }
    for (attempt <- 1 to 2) {
      time(s"joinFanoutProfile attempt $attempt (2M x 2M rows, 100k keys, 1 hot)") {
        graft.operators.Profiling.joinFanoutProfile(left, right, Seq("k"), 5).collect()
      }
      graft.operators.Profiling.releaseProfiles()
    }
    val prof = graft.operators.Profiling.joinFanoutProfile(left, right, Seq("k"), 5).collect()
    graft.operators.Profiling.releaseProfiles()
    println(s"[scratch] top key: ${prof.head}")
    // the honest counterfactual: MATERIALIZE the join output (noop sink,
    // Bench's full-materialization contract) — a count() never builds rows
    time("materialize the actual join (noop sink)") {
      left.join(right, "k")
        .write.format("noop").mode("overwrite").save()
    }
    println(s"[scratch] join output rows: ${prof.map(_.getLong(3)).sum} from top-5 keys alone")

    // ---- probe B: corpus text scorers, 1x vs 10x ---------------------
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 2000).map(i => s"tok$i")
    def corpus(mult: Int) = (0 until 5000 * mult).map { i =>
      (i.toLong, Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text").repartition(spark.sparkContext.defaultParallelism)

    for (mult <- Seq(1, 10)) {
      val df = corpus(mult).persist()
      df.count()
      time(s"bigramSurprise ${mult}x (${5000 * mult} docs)") {
        graft.operators.QualitySignals.bigramSurprise(df, "doc_id", "text")
          .agg(sum("surprise_x100")).collect()
      }
      time(s"oovRate ${mult}x") {
        graft.search.Lexical.oovRate(df, "doc_id", "text", 500)
          .agg(sum("oov_permille")).collect()
      }
      df.unpersist()
    }
    spark.stop()
  }
}
