package graft

import graft.sources.Layout
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget training shards: two-level prefix scan == the global
  * single-window reference, determinism under repartitioning, balance
  * audit, loud-failure contract, and the partitioned-write round trip. */
class ShardingSpec extends SparkSpec {

  private def corpus(n: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (i.toLong, 10L + (i % 37))).toDF("id", "toks")
  }

  private def reference(df: org.apache.spark.sql.DataFrame, budget: Long) = {
    val w = Window.orderBy(col("__k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col("id").as("doc_id"), col("toks").as("n_tokens"))
      .withColumn("__k",
        graft.functions.expr.Fnv64.fnv64(col("doc_id").cast("string")))
      .withColumn("offset_tokens", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("shard", expr(s"offset_tokens div $budget"))
      .select("doc_id", "n_tokens", "offset_tokens", "shard")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("two-level scan equals the global single-window reference") {
    val c = corpus(500)
    val got = Layout.trainingShards(c, "id", "toks", budgetTokens = 700L,
      scanBuckets = 16)
    assert(canon(got) === canon(reference(c, 700L)))
  }

  test("deterministic under input repartitioning and bucket count") {
    val c = corpus(300)
    val a = canon(Layout.trainingShards(c, "id", "toks", 500L, scanBuckets = 8))
    val b = canon(Layout.trainingShards(c.repartition(13), "id", "toks", 500L,
      scanBuckets = 256))
    assert(a === b)
  }

  test("shards are token-balanced within one document of the budget") {
    val budget = 400L
    val shards = Layout.trainingShards(corpus(400), "id", "toks", budget)
    val audit = Layout.shardAudit(shards).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val maxDoc = 10L + 36L
    val lastShard = audit.keys.max
    audit.foreach { case (s, tok) =>
      assert(tok <= budget + maxDoc, s"shard $s carries $tok tokens")
      if (s != lastShard) assert(tok >= budget - maxDoc,
        s"non-final shard $s underfilled: $tok")
    }
  }

  test("oversized documents occupy their start shard; ids may skip") {
    val s = spark
    import s.implicits._
    val c = Seq((1L, 5L), (2L, 1000L), (3L, 5L), (4L, 5L)).toDF("id", "toks")
    val got = Layout.trainingShards(c, "id", "toks", 10L, scanBuckets = 4)
    assert(canon(got) === canon(reference(c, 10L)))
  }

  test("null token count fails loudly") {
    val s = spark
    import s.implicits._
    val c = Seq((1L, Some(5L)), (2L, None)).toDF("id", "toks")
    val e = intercept[Exception] {
      Layout.trainingShards(c, "id", "toks", 10L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("trainingShards")))
  }

  test("partitioned write round-trips with within-shard offset order") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val shards = Layout.trainingShards(corpus(200), "id", "toks", 500L)
    Layout.writeTrainingShards(shards, dir)
    val back = spark.read.parquet(dir)
    // partition-column type inference reads `shard` back as int
    assert(canon(back.select(col("doc_id"), col("n_tokens"),
        col("offset_tokens"), col("shard").cast("long")))
      === canon(shards))
  }
}
