package graft

import graft.dedup.NearDedup
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)

    val mh = NearDedup.minhashPairs(docs, "doc_id", "text",
      shingleLen = 3, k = 64, bands = 16, threshold = 0.5)
    println("[scratch] minhash pairs: " +
      time("q24 minhash")(mh.count()))

    val ng = NearDedup.ngramJaccardPairs(docs, "doc_id", "text",
      blockCol = "lang", n = 3, threshold = 0.3)
    println("[scratch] ngram pairs: " +
      time("q26 ngram")(ng.count()))
    ng.explain("formatted")
    spark.stop()
  }
}
