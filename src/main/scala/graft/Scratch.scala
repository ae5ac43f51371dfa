package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract).
  * Current mode: round-7 probe — ApproxJaccardJoinRewrite vs the brute
  * cross join it replaces, at a corpus size where the cross join is
  * still runnable (the point of the rule is the regime where it is
  * not). Earlier rounds' probe results live in the scaladocs of the
  * operators they measured.
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

    // deterministic corpus: nBase 40-word docs over a 1000-word vocab,
    // plus nDup near-dups (single substitution, Jaccard(3-shingles) ~0.85)
    val nBase = sys.env.getOrElse("SCRATCH_N", "1500").toInt
    val nDup = nBase / 10
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 1000).map(i => s"w$i")
    val base = (0 until nBase).map { i =>
      (i.toLong, Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = (0 until nDup).map { i =>
      val words = base(i)._2.split(" ")
      words(rnd.nextInt(words.length)) = "sub"
      (1000000L + i, words.mkString(" "))
    }
    import spark.implicits._
    (base ++ dups).toDF("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
      .createOrReplaceTempView("probe_docs")
    val pairs = nBase.toLong + nDup
    println(s"[scratch] corpus ${pairs} docs, ~${pairs * pairs / 2 / 1000000}M candidate pairs")

    def q = spark.sql(
      """SELECT a.doc_id AS ia, b.doc_id AS ib
        |FROM probe_docs a, probe_docs b
        |WHERE a.doc_id < b.doc_id
        |  AND jaccard_sim(word_shingles(a.text, 3), word_shingles(b.text, 3))
        |      >= CAST(0.5 AS DOUBLE)""".stripMargin)

    val key = "spark.graft.rewrite.approxJaccardJoin"
    spark.conf.set(key, "true")
    val approx = time("rewrite ON (minhash-banded)")(q.collect().toSet)
    spark.conf.unset(key)
    val exact = time("rewrite OFF (cross join)")(q.collect().toSet)
    val recall = approx.intersect(exact).size.toDouble / math.max(exact.size, 1)
    println(f"[scratch] exact=${exact.size} approx=${approx.size} " +
      f"precision=${approx.subsetOf(exact)} recall=$recall%.3f")
    spark.stop()
  }
}
