package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-completion event funnel ("signup -> view -> purchase"): per key,
  * `t_<step_i>` is the earliest event of step i at or after the key's
  * `t_<step_i-1>`, and `steps_completed` counts the consecutive prefix of
  * steps reached. One row per key that has ANY event — keys that never
  * reach step 1 come back with all-null times and steps_completed = 0, so
  * conversion rates fall out of a single groupBy downstream.
  *
  * Scale shape: ONE hash shuffle total. Each step is a full-partition
  * window min over the same `partitionBy(key)` — Catalyst reuses the one
  * exchange across all k window passes and the final per-key collapse
  * (no per-step join, no per-step shuffle, no event-time sort: unbounded
  * frames need no ordering). Funnel state per key is k timestamps, never
  * the key's event list.
  *
  * Determinism: `min` over timestamps has no ties to break — a key's
  * step-i time is unique even when several events share it.
  */
object Funnel {

  def firstCompletion(events: DataFrame, keyCol: String, tsCol: String,
                      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    require(steps.distinct == steps, "funnel: steps must be distinct")
    val w = Window.partitionBy(col(keyCol))
    var df = events.select(col(keyCol), col(tsCol).as("__ts"),
      col(typeCol).as("__tp"))
    steps.zipWithIndex.foreach { case (step, i) =>
      // a null previous step nulls the condition -> min(null) stays null:
      // later steps can only complete after every earlier one did
      val cond: Column =
        if (i == 0) col("__tp") === step
        else col("__tp") === step && col("__ts") >= col(s"__t${i - 1}")
      df = df.withColumn(s"__t$i", min(when(cond, col("__ts"))).over(w))
    }
    val times = steps.indices.map(i => min(col(s"__t$i")).as(s"t_${steps(i)}"))
    val completed = steps.indices.map(i =>
      when(col(s"t_${steps(i)}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    df.groupBy(col(keyCol))
      .agg(times.head, times.tail: _*)
      .withColumn("steps_completed", completed)
  }
}
