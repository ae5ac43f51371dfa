package graft

import graft.operators.{Aggregates, Dedup, Windows}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("latestPerKey: deterministic winner incl. timestamp ties") {
    val df = Seq(
      (1, ts("2021-01-01 00:00:00"), "old"),
      (1, ts("2021-02-01 00:00:00"), "new"),
      (2, ts("2021-01-01 00:00:00"), "tie-a"),
      (2, ts("2021-01-01 00:00:00"), "tie-b"))
      .toDF("k", "t", "v")
    // tie broken by v desc -> "tie-b" must win, every run
    val out = Dedup.latestPerKey(df, Seq("k"), Seq(col("t").desc, col("v").desc))
      .orderBy("k").select("k", "v").as[(Int, String)].collect()
    assert(out === Seq((1, "new"), (2, "tie-b")))
  }

  test("mergeIncremental: delta overrides state per key, union by name") {
    val state = Seq((1, ts("2021-01-01 00:00:00"), "a"), (2, ts("2021-01-01 00:00:00"), "b"))
      .toDF("k", "t", "v")
    val delta = Seq((2, ts("2021-02-01 00:00:00"), "b2"), (3, ts("2021-02-01 00:00:00"), "c"))
      .toDF("k", "t", "v")
    val out = Dedup.mergeIncremental(state, delta, Seq("k"), Seq(col("t").desc, col("k")))
      .orderBy("k").select("k", "v").as[(Int, String)].collect()
    assert(out === Seq((1, "a"), (2, "b2"), (3, "c")))
  }

  test("sessionize: new session after gap, per key") {
    val df = Seq(
      ("u1", ts("2021-01-01 10:00:00")),
      ("u1", ts("2021-01-01 10:10:00")),  // <30min -> same session
      ("u1", ts("2021-01-01 11:00:00")),  // 50min gap -> new session
      ("u2", ts("2021-01-01 10:00:00")))
      .toDF("user", "t")
    val out = Windows.sessionize(df, "user", "t", gapSeconds = 1800)
      .orderBy("user", "t").select("user", "session_seq")
      .as[(String, Long)].collect()
    assert(out === Seq(("u1", 1L), ("u1", 1L), ("u1", 2L), ("u2", 1L)))
  }

  test("shareOfTotal sums to 1 and has no single-partition window") {
    val df = (1 to 100).map(i => (s"g${i % 4}", i)).toDF("g", "x")
    val out = Aggregates.shareOfTotal(df, Seq("g"))
    assert(math.abs(out.agg(sum("share")).as[Double].head() - 1.0) < 1e-6)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), "share-of-total must not use a global window")
  }

  test("distinctCountHistogram matches a hand computation") {
    val df = Seq(("u1", "a"), ("u1", "b"), ("u1", "a"), ("u2", "a"), ("u3", "a"), ("u3", "b"))
      .toDF("k", "v")
    val out = Aggregates.distinctCountHistogram(df, "k", "v")
      .orderBy("n_distinct").as[(Long, Long)].collect()
    assert(out === Seq((1L, 1L), (2L, 2L))) // one key saw 1 value; two keys saw 2
  }

  test("saltedJoin matches a plain join on skewed data") {
    import graft.operators.Skew
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i))
      .toDF("k", "v")
    val right = (0L to 6L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = left.join(right, "k")
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 8)
    assert(salted.count() === plain.count())
    assert(salted.agg(sum("v")).as[Long].head() === plain.agg(sum("v")).as[Long].head())
  }

  test("saltedCount matches a plain groupBy count") {
    import graft.operators.Skew
    val df = (1 to 1000).map(i => (s"k${i % 3}", i)).toDF("k", "v")
    val got = Skew.saltedCount(df, "k").orderBy("k").as[(String, Long)].collect()
    val want = df.groupBy("k").count().orderBy("k").as[(String, Long)].collect()
    assert(got.toSeq === want.toSeq)
  }

  test("topK plans TakeOrderedAndProject (no global sort shuffle)") {
    val df = (1 to 1000).map(i => (i, i * 2)).toDF("a", "b")
    val top = Aggregates.topK(df, Seq(col("b").desc), 5)
    assert(top.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    assert(top.select("a").as[Int].collect().toSeq === Seq(1000, 999, 998, 997, 996))
  }
}
