package graft

import graft.dedup.NearDedup
import graft.similarity.Knn
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract).
  * Current mode: round-6 probes — IVF-SQ8 read volume vs float IVF from
  * parquet-persisted indexes at 25x the sf0.1 embeddings, and the
  * size-gated incremental-dedup backfill path (shuffle fallback vs
  * broadcast). Earlier rounds' probe results live in the scaladocs of the
  * operators they measured.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      if (!d.exists()) 0L
      else d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }

    // ---- IVF-SQ8 vs float IVF: serving-path read volume ----
    val e0 = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val e25 = (0 until 25).map(i =>
      e0.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000L)))
      .reduce(_ unionByName _)
    e25.write.mode("overwrite").parquet("/tmp/scale_embs")
    val embs = spark.read.parquet("/tmp/scale_embs")
    println(s"[scratch] scaled embeddings: ${embs.count()}")
    val queries = embs.filter(col("vec_id") < 50)

    val fIdx = Knn.buildIvfIndex(embs, "vec_id", "embedding", nCells = 64, iters = 0)
    fIdx.cells.write.mode("overwrite").parquet("/tmp/ivf_float_cells")
    val sIdx = Knn.buildIvfSq8Index(embs, "vec_id", "embedding", nCells = 64)
    sIdx.codes.write.mode("overwrite").parquet("/tmp/ivf_sq8_codes")
    println(s"[scratch] index bytes on disk: float=${dirBytes("/tmp/ivf_float_cells")} " +
      s"sq8=${dirBytes("/tmp/ivf_sq8_codes")}")

    val floatServing = graft.similarity.IvfIndex(fIdx.centroids,
      spark.read.parquet("/tmp/ivf_float_cells"))
    val sq8Serving = graft.similarity.IvfSq8Index(sIdx.centroids,
      spark.read.parquet("/tmp/ivf_sq8_codes"))
    time("float IVF probe (50 queries, k=10, nProbe=8)")(
      Knn.ivfTopKFromIndex(floatServing, queries, "vec_id", "embedding",
        k = 10, nProbe = 8).count())
    time("SQ8 IVF probe (50 queries, k=10, nProbe=8)")(
      Knn.ivfSq8TopK(sq8Serving, queries, "vec_id", "embedding",
        k = 10, nProbe = 8).count())
    // the vector-fetch cost itself: bytes a serving scan reads to
    // materialize every stored vector representation once (the probe
    // above mixes in the query-side scan and join plumbing)
    val (_, mFloat) = Metrics.measure(spark) {
      spark.read.parquet("/tmp/ivf_float_cells")
        .agg(sum(element_at(col("cvec"), 1))).collect()
    }
    val (_, mSq8) = Metrics.measure(spark) {
      spark.read.parquet("/tmp/ivf_sq8_codes")
        .agg(sum(element_at(col("codes"), 1)), sum(col("maxabs"))).collect()
    }
    println(s"[scratch] vector-fetch read bytes: float=${mFloat.inputBytes} " +
      s"sq8=${mSq8.inputBytes} (ratio ${mFloat.inputBytes.toDouble / math.max(1, mSq8.inputBytes)})")

    // ---- size-gated incremental dedup: backfill falls back to shuffle ----
    val st = NearDedup.embeddingState(embs, "vec_id", "embedding",
      dim = 64, nBits = 48, bands = 6, reuseSketches = false)
    st.buckets.write.mode("overwrite").parquet("/tmp/emb_state_buckets")
    st.vectors.write.mode("overwrite").parquet("/tmp/emb_state_vectors")
    val served = graft.dedup.EmbeddingState(
      spark.read.parquet("/tmp/emb_state_buckets"),
      spark.read.parquet("/tmp/emb_state_vectors"))
    val backfill = embs.select((col("vec_id") + lit(500000000L)).as("vec_id"),
      transform(col("embedding"), x => (x.cast("double") + lit(0.05)).cast("float"))
        .as("embedding"))
    println("[scratch] corpus-sized backfill, size gate ACTIVE (shuffle path): " +
      time("backfill gated")(
        NearDedup.embeddingPairsIncremental(served, backfill, "vec_id", "embedding",
          dim = 64, threshold = 0.9, nBits = 48, bands = 6,
          broadcastMaxRows = 10000L).count()))
    NearDedup.releaseSketches()
    // the gate's counterfactual: forcing the broadcast path on a
    // corpus-sized backfill (round-5's q59 fixture shape) dies in the
    // broadcast build — print the failure instead of crashing the probe
    try println("[scratch] same backfill, gate DISABLED (forced broadcast): " +
      time("backfill broadcast")(
        NearDedup.embeddingPairsIncremental(served, backfill, "vec_id", "embedding",
          dim = 64, threshold = 0.9, nBits = 48, bands = 6,
          broadcastMaxRows = Long.MaxValue).count()))
    catch { case e: Throwable =>
      println(s"[scratch] forced-broadcast backfill FAILED (the gate's point): " +
        e.getMessage.linesIterator.next())
    }
    NearDedup.releaseSketches()
    spark.stop()
  }
}
