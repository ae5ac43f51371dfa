package graft

import graft.operators.Regression
import org.apache.spark.sql.functions._

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("fitLinearMicros: exact line is recovered exactly in one step") {
    // y = 3x + 10, x = 0..4: xbar = 2 exactly, sum(xc) = 0, so iteration 1
    // lands on w0 = mean(y) = 16, w1 = 3 (in micros) and residuals vanish —
    // iterations 2 and 3 must not move.
    val df = (0 to 4).map(x => (x.toLong, 3L * x + 10L)).toDF("x", "y")
    val (trail, xbar) = Regression.fitLinearMicros(df, "x", "y", iters = 3)
    assert(xbar === 2L)
    assert(trail.map(s => (s.iter, s.w0_u, s.w1_u)) ===
      Seq((1, 16000000L, 3000000L), (2, 16000000L, 3000000L), (3, 16000000L, 3000000L)))
  }

  test("fitLinearMicros: bit-identical across partitionings") {
    val rows = (0 until 400).map(i => ((i % 57).toLong, (i % 57) * 7L + (i % 13).toLong))
    val one = spark.sparkContext.parallelize(rows, 1).toDF("x", "y")
    val many = spark.sparkContext.parallelize(rows.reverse, 7).toDF("x", "y")
    val a = Regression.fitLinearMicros(one, "x", "y", iters = 3)
    val b = Regression.fitLinearMicros(many, "x", "y", iters = 3)
    assert(a === b, "fixed-point fit must not depend on partitioning or row order")
  }

  test("fitLinearMicros: negative slope exercises the sign-explicit division") {
    // y = 100 - 2x, x = 0..10 (exact mean 5): slope negative and exact
    val df = (0 to 10).map(x => (x.toLong, 100L - 2L * x)).toDF("x", "y")
    val (trail, _) = Regression.fitLinearMicros(df, "x", "y", iters = 2)
    assert(trail.head.w1_u === -2000000L)
    assert(trail.last.w1_u === -2000000L)
    assert(trail.last.w0_u === 90000000L) // mean of 100-2x at x = 5
  }

  test("residualGate: golden fixed-point values (independent simulation)") {
    // 10 on-line rows (y = 100 + 5x, x = 0..9) + 1 outlier (10, 300).
    // Σx = 55, n = 11 → xbar = 5 exactly, Σxc = 0: iteration 1 IS the
    // OLS fit and stays put. Golden values from an independent BigInt
    // reimplementation of the update rule (bit-exactness is the
    // operator's contract, so the test pins exact micros, not bands).
    val df = ((0 to 9).map(x => (x.toLong, x.toLong, 100L + 5L * x)) :+ (10L, 10L, 300L))
      .toDF("id", "x", "y")
    val (trail, xbar) = Regression.fitLinearMicros(df.select("x", "y"), "x", "y", iters = 3)
    assert(xbar === 5L)
    assert(trail.map(s => (s.w0_u, s.w1_u)).distinct ===
      Seq((138636363L, 11818181L)), "converged at iteration 1, then fixed")

    val out = Regression.residualGate(df, "x", "y", iters = 3, tolDenom = 10)
      .orderBy("id")
    assert(out.columns.toSeq === Seq("id", "x", "y", "pred_u", "resid_u", "keep"))
    val rows = out.select("id", "resid_u", "keep").as[(Long, Long, Boolean)].collect().toSeq
    assert(rows.find(_._1 == 10L).get._2 === -102272732L, "outlier residual, exact")
    assert(rows.filter(_._3).map(_._1) === Seq(2L, 3L, 4L),
      "exactly the rows within 10% of the dragged fit are kept")
    assert(rows.find(_._1 == 3L).get._2 === 1L, "x=3 sits one micro off the line")
  }
}
