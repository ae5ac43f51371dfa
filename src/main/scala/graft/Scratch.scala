package graft

import graft.dedup.NearDedup
import graft.similarity.Knn
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract).
  * Current mode: 10x scale probe — replicate the sf0.1 documents and
  * embeddings (with shifted ids) to ~50k docs and check that the dedup /
  * ANN operators scale like their cost models claim.
  */
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

    val docs0 = Tables.documents(spark, dir)
    val embs0 = Tables.embeddings(spark, dir)
    val n = docs0.count()
    // 10x replicas with distinct ids; replicas of the same doc are exact
    // dups of each other, so pair volume genuinely grows
    val docs10 = (0 until 10).map(i =>
      docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L)))
      .reduce(_ unionByName _)
    val embs10 = (0 until 10).map(i =>
      embs0.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000L)))
      .reduce(_ unionByName _)
    docs10.write.mode("overwrite").parquet("/tmp/scale_docs")
    embs10.write.mode("overwrite").parquet("/tmp/scale_embs")
    val docs = spark.read.parquet("/tmp/scale_docs")
    val embs = spark.read.parquet("/tmp/scale_embs")
    println(s"[scratch] scaled docs: ${docs.count()} (from $n)")

    println("[scratch] minhash pairs@10x: " + time("q24 minhash 10x")(
      NearDedup.minhashPairs(docs, "doc_id", "text", 3, 64, 16, 0.5,
        maxBucketSize = 400).count()))
    println("[scratch] exact dedup@10x: " + time("q09 exact 10x")(
      NearDedup.exactByContent(docs, "doc_id", "text").count()))
    println("[scratch] simhash pairs@10x: " + time("q25 simhash 10x")(
      NearDedup.simhashPairs(docs, "doc_id", "text", 6).count()))
    println("[scratch] lsh knn@10x: " + time("q28 lsh 10x")(
      Knn.lshTopK(embs.filter(col("vec_id") < 10), embs,
        "vec_id", "embedding", 64, 5, 16, 4).count()))
    spark.stop()
  }
}
