package graft

import graft.dedup.NearDedup
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract).
  * Current mode: round-6 probe — phase timing of the q78 embedding
  * admission pipeline (the slowest bench query at 5.4 s on 2,350
  * vectors: where does overhead-dominated time actually go?).
  * Earlier rounds' probe results live in the scaladocs of the
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

    // exact q78 fixture
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    def shiftBy(src: org.apache.spark.sql.DataFrame, offset: Long) =
      src.select((col("vec_id") + lit(offset)).as("vec_id"),
        transform(col("embedding"),
          x => (x.cast("double") + lit(0.05)).cast("float")).as("embedding"))
    val batch = shiftBy(e.filter(col("vec_id") % 10 === 0), 1000000L)
      .unionByName(shiftBy(e.filter(col("vec_id") % 20 === 0), 2000000L))
      .unionByName(e.filter(col("vec_id") % 10 === 1)
        .select((col("vec_id") + lit(3000000L)).as("vec_id"),
          transform(col("embedding"),
            x => (-x.cast("double")).cast("float")).as("embedding")))

    (1 to 2).foreach { it =>
      spark.catalog.clearCache()
      println(s"[scratch] ---- iteration $it ----")
      val state = time("embeddingState construct (lazy)")(
        NearDedup.embeddingState(e, "vec_id", "embedding",
          dim = 64, nBits = 48, bands = 6))
      val batchN = time("batch.count")(batch.count())
      val base = batch.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val pairs = time("pairs construct (lazy)")(
        NearDedup.embeddingPairsIncremental(state, base, "id", "vec",
          dim = 64, threshold = 0.9, nBits = 48, bands = 6))
      val flags = base.select(col("id")).withColumn("__b", lit(true))
      val pf = pairs
        .join(flags.select(col("id").as("id_a"), col("__b").as("a_b")), Seq("id_a"), "left")
        .join(flags.select(col("id").as("id_b"), col("__b").as("b_b")), Seq("id_b"), "left")
      val dropIds = pf
        .filter(col("a_b").isNotNull || col("b_b").isNotNull)
        .select(when(col("b_b").isNotNull, col("id_b")).otherwise(col("id_a")).as("id"))
        .distinct()
      val accepted = time("anti-join + localCheckpoint")(
        base.join(dropIds, Seq("id"), "left_anti").localCheckpoint())
      val acceptedN = time("accepted.count")(accepted.count())
      NearDedup.releaseSketches()
      val delta = time("delta state (lazy)")(
        NearDedup.embeddingState(accepted, "id", "vec",
          dim = 64, nBits = 48, bands = 6, reuseSketches = false))
      time("final noop write")(
        accepted.select(col("id").as("vec_id")).orderBy(col("vec_id"))
          .write.mode("overwrite").format("noop").save())
      println(s"[scratch] batchN=$batchN acceptedN=$acceptedN deltaBuckets=${delta.buckets.columns.length}")
    }
    spark.stop()
  }
}
