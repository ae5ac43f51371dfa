package graft

import graft.dedup.{Ingest, LineDedup, NearDedup}
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract).
  * Current mode: round-5 probes — the new corpus-scrub/ingest operators at
  * 10x the sf0.1 documents (~50k docs), plus a regression check that the
  * incremental-dedup upsert fix (state-sketch anti join) left the
  * increment cost unchanged. Earlier rounds' probe results live in the
  * scaladocs of the operators they measured.
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

    val docs0 = Tables.documents(spark, dir)
    val docs10 = (0 until 10).map(i =>
      docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L)))
      .reduce(_ unionByName _)
    docs10.write.mode("overwrite").parquet("/tmp/scale_docs")
    val docs = spark.read.parquet("/tmp/scale_docs")
    println(s"[scratch] scaled docs: ${docs.count()}")

    // line dedup at 10x with the q61 planting: cost must track lines
    // scanned + kept volume; the hot set stays tiny and broadcast
    val aug = docs.select(col("doc_id"),
      concat_ws("\n", col("text"),
        when(col("doc_id") % 5 === 0, lit("promo code SAVE20")),
        lit("-- corpus newsletter footer --"),
        concat(lit("ref "), col("doc_id"))).as("text"))
    println("[scratch] line dedup@10x: " + time("q61 line dedup 10x")(
      LineDedup.scrubHotLines(aug, "doc_id", "text", minDocFreq = 50).count()))

    // bloom ingest gate: 500-doc batch vs 50k-doc state. The comparison
    // point is the plain anti join, which hash-shuffles both sides.
    val withFp = docs.select(col("doc_id"),
      graft.functions.HashFunctions.fingerprint64(col("text")).as("fp"))
    withFp.select("fp").write.mode("overwrite").parquet("/tmp/scale_state_fp")
    val stateFp = spark.read.parquet("/tmp/scale_state_fp")
    val batch = docs0.filter(col("doc_id") < 500)
      .select((col("doc_id") + lit(99000000L)).as("doc_id"),
        graft.functions.HashFunctions.fingerprint64(col("text")).as("fp"))
    println("[scratch] bloom ingest@10x-state: " + time("q62 bloom ingest 10x")(
      Ingest.newRows(stateFp, batch, "fp", expectedStateKeys = 60000).count()))
    println("[scratch] plain anti join (same inputs): " + time("anti join 10x")(
      batch.join(stateFp, Seq("fp"), "left_anti").count()))
    // steady-state shape: filter prebuilt once per snapshot, reused per batch
    val bloom = stateFp.stat.bloomFilter("fp", 60000, 0.03)
    println("[scratch] bloom ingest@10x-state (prebuilt filter): " +
      time("q62 prebuilt 10x")(
        Ingest.newRowsWithBloom(stateFp, batch, "fp", bloom).count()))

    // regression check: the upsert fix adds a broadcast anti join of state
    // sketches against batch ids — increment cost must stay where the
    // round-4 probe put it (~1 s for a 500-doc batch vs 50k-doc state)
    val incState0 = NearDedup.minhashState(docs, "doc_id", "text",
      maxBucketSize = 400, reuseSketches = false)
    incState0.buckets.write.mode("overwrite").parquet("/tmp/scale_state_buckets")
    incState0.sketches.write.mode("overwrite").parquet("/tmp/scale_state_sketches")
    val incState = graft.dedup.MinhashState(
      spark.read.parquet("/tmp/scale_state_buckets"),
      spark.read.parquet("/tmp/scale_state_sketches"))
    val docBatch = docs0.filter(col("doc_id") < 500)
      .withColumn("doc_id", col("doc_id") + lit(99000000L))
    println("[scratch] incremental@10x-state small batch (post-upsert-fix): " +
      time("q58 incremental 10x (500-doc batch)")(
        NearDedup.minhashPairsIncremental(incState, docBatch, "doc_id", "text",
          maxBucketSize = 400).count()))
    NearDedup.releaseSketches()
    // second run with warm page cache/JIT — the round-4 probe measured in
    // this state (it ran after a full-batch increment on the same state)
    println("[scratch] incremental@10x-state small batch (warm): " +
      time("q58 incremental 10x (500-doc batch, warm)")(
        NearDedup.minhashPairsIncremental(incState, docBatch, "doc_id", "text",
          maxBucketSize = 400).count()))
    NearDedup.releaseSketches()
    spark.stop()
  }
}
