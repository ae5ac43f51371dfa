package graft

import graft.dedup.Ingest
import graft.functions.expr.BloomMightContain
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val state = (1L to 100L).map(k => (k, s"state-$k")).toDF("k", "v")
  private lazy val batch = (50L to 150L).map(k => (k, s"batch-$k")).toDF("k", "v")

  test("newRows equals the plain anti join (bloom only prunes, never changes the answer)") {
    val got = Ingest.newRows(state.select("k"), batch, "k",
        expectedStateKeys = 100)
      .as[(Long, String)].collect().toSet
    val want = batch.join(state.select("k"), Seq("k"), "left_anti")
      .as[(Long, String)].collect().toSet
    assert(got === want)
    assert(got.map(_._1) === (101L to 150L).toSet)
  }

  test("newRows stays exact under a deliberately undersized, high-fpp bloom") {
    // tiny bits + 40% fpp: lots of false positives, all verified away
    val got = Ingest.newRows(state.select("k"), batch, "k",
        expectedStateKeys = 10, fpp = 0.4)
      .select("k").as[Long].collect().toSet
    assert(got === (101L to 150L).toSet)
  }

  test("diffSnapshots labels added/removed/changed/unchanged per id") {
    val prev = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "fp")
    val cur = Seq((2L, 20L), (3L, 31L), (4L, 40L)).toDF("id", "fp")
    val got = Ingest.diffSnapshots(prev, cur, "id", "fp")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("diffSchemas reports added/removed/retyped columns, silent on unchanged") {
    import org.apache.spark.sql.types._
    val prev = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("score", IntegerType)))
    val cur = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("score", DoubleType), StructField("lang", StringType)))
    val got = Ingest.diffSchemas(prev, cur)
      .map(c => (c.column, c.status, c.prevType, c.curType)).toSet
    assert(got === Set(
      ("score", "retyped", Some("int"), Some("double")),
      ("lang", "added", None, Some("string"))))
    assert(Ingest.diffSchemas(prev, prev).isEmpty)
  }

  test("bloom probe has no false negatives; probe is codegen, not a UDF") {
    val bloom = state.stat.bloomFilter("k", 100, 0.03)
    val missed = state.filter(!BloomMightContain.bloom_might_contain(col("k"), bloom))
    assert(missed.count() === 0, "every inserted key must probe true")
    val plan = batch.filter(
        BloomMightContain.bloom_might_contain(col("k"), bloom))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"probe must stay native:\n$plan")
  }

  test("bloomState/bloomMergeState: merged increments equal the one-pass filter byte-for-byte") {
    val s = spark
    import s.implicits._
    val keys = (0 until 3000).map(i => (i % 3, i * 2654435761L)).toDF("inc", "k")
    val onePass = keys.agg(Ingest.bloomState(col("k"), 5000L).as("st"))
      .head().getAs[Array[Byte]]("st")
    val incs = (0 until 3).map(i =>
      keys.filter(col("inc") === i).agg(Ingest.bloomState(col("k"), 5000L).as("st")))
      .reduce(_ unionByName _)
    val dir = java.nio.file.Files.createTempDirectory("bloom_state").toString
    incs.write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(Ingest.bloomMergeState(col("st")).as("m"))
      .head().getAs[Array[Byte]]("m")
    assert(java.util.Arrays.equals(merged, onePass),
      "insertion sets bits and merge ORs them: the two builds must be identical")
    // the rehydrated merged state answers probes like the one-pass filter
    val f = Ingest.bloomFromState(merged)
    assert((0 until 3000).forall(i => f.mightContainLong(i * 2654435761L)),
      "no false negatives through persist + merge")
    // differently-sized increment states must fail loudly, not mis-merge
    val wrong = keys.limit(10).agg(Ingest.bloomState(col("k"), 50000L).as("st"))
    intercept[Exception] {
      incs.unionByName(wrong).agg(Ingest.bloomMergeState(col("st")).as("m")).head()
    }
  }
}
