package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract).
  * Current mode: round-7 third-block probe — the Hamming-join planner
  * rule (plans.ApproxHammingJoinRewrite) vs the cross join it replaces,
  * at two corpus sizes. Earlier rounds' probe results live in the
  * scaladocs of the operators they measured (joinFanoutProfile,
  * bigramSurprise/oovRate, minhash/simhash 10x replicas, incremental
  * dedup batches).
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

    // 64-bit fingerprints with 5% planted near-dups at Hamming <= 3;
    // the rest random (expected pairwise distance 32 — far from radius)
    def sigDf(n: Int) = {
      val rnd = new scala.util.Random(3)
      val base = Array.fill(n)(rnd.nextLong())
      val planted = (0 until n / 20).map { i =>
        val flips = rnd.shuffle((0 until 64).toList).take(i % 3 + 1)
        (n + i.toLong, flips.foldLeft(base(i))((s, b) => s ^ (1L << b)))
      }
      (base.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toSeq ++ planted)
        .toDF("id", "sig")
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    }

    for (n <- Seq(60000, 150000)) {
      val df = sigDf(n)
      df.count() // materialize outside the timers
      df.createOrReplaceTempView("sigs")
      def pairs() = spark.sql(
        """SELECT a.id AS ia, b.id AS ib FROM sigs a, sigs b
          |WHERE a.id < b.id AND bit_count(a.sig ^ b.sig) <= 3""".stripMargin)
      // count OUTSIDE the timers: the timed cost is ONE materialization
      // of each plan, the equality check a separate (untimed) execution
      spark.conf.unset("spark.graft.rewrite.hammingJoin")
      time(s"cross join n=$n (noop sink)") {
        pairs().write.format("noop").mode("overwrite").save()
      }
      val exact = pairs().count()
      spark.conf.set("spark.graft.rewrite.hammingJoin", "true")
      time(s"rewrite   n=$n (noop sink)") {
        pairs().write.format("noop").mode("overwrite").save()
      }
      val rewritten = pairs().count()
      spark.conf.unset("spark.graft.rewrite.hammingJoin")
      println(s"[scratch] n=$n pairs: cross=$exact rewrite=$rewritten " +
        s"(must be equal — exact recall)")
      df.unpersist()
    }
    spark.stop()
  }
}
