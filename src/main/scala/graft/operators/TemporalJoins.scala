package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: backward as-of join
  * and bounded-interval range join. Both are composed from existing
  * operators (SURVEY §2 custom-operator preference (a): composition before
  * custom plans) in shapes that survive 100 TB:
  *
  *  - the as-of join is ONE shuffle on the key (union + running
  *    `last(ignoreNulls)`) — never a per-row backward scan and never a
  *    range-expanded join;
  *  - the range join buckets both sides into interval-width time bins, so
  *    each left row meets only the 2 bins that can contain matches
  *    (shuffle on (key, bin)), not the whole key partition.
  */
object TemporalJoins {

  /** Backward (inclusive) as-of join: for every left row, attach the
    * latest right row of the same key with `rightTs <= leftTs`, as a
    * struct column `outCol` (null when no prior right row exists).
    *
    * Mechanics: tag right rows side=0 and left rows side=1, union, and
    * take `last(payload, ignoreNulls)` over a running window ordered by
    * (ts, side, tie). Right-before-left at equal timestamps makes the
    * match inclusive; `tieCol` makes the winner among equal-timestamp
    * right rows deterministic (greatest tie value wins).
    *
    * Scale shape: one hash shuffle on `keyCols` and a single sort within
    * partitions — the same cost as any windowed aggregate over the union.
    * No join product is ever materialized, so skew in match fan-out
    * cannot blow up intermediate size. Probe-backed (Scratch, 10x events
    * = 1M rows, 10x distinct users, same per-user density): 0.27 s vs
    * 0.65 s for the sf0.1 bench run at 1/10 the rows — cost tracks the
    * one shuffle, i.e. sub-linear wall-clock growth at 32 cores, not the
    * quadratic a per-key backward scan would show.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTs: String, rightTs: String,
                   payloadCols: Seq[String], tieCol: String,
                   outCol: String = "asof"): DataFrame = {
    val payload = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payload.as("p")).schema("p").dataType
    val leftRowType = left.select(struct(col("*")).as("l")).schema("l").dataType

    val keyC = keyCols.map(col)
    val r = right.select(
      keyC :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        col(tieCol).as("__tie") :+ payload.as("__asof") :+
        lit(null).cast(leftRowType).as("__lrow"): _*)
    val l = left.select(
      keyC :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(r.schema("__tie").dataType).as("__tie") :+
        lit(null).cast(payloadType).as("__asof") :+
        struct(col("*")).as("__lrow"): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__matched", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lrow.*"), col("__matched").as(outCol))
  }

  /** [[asofBackward]] with a STALENESS BOUND — the point-in-time join a
    * feature store actually needs: a match older than `toleranceSec` is
    * no match (a "latest profile" from three years ago is not a feature,
    * it is leakage of the assumption that state lives forever). For every
    * left row: the latest same-key right row with `rightTs <= leftTs`
    * AND `leftTs − rightTs <= toleranceSec`, as struct `outCol`, plus
    * `asof_age_us` (microseconds from match to left row; null when no
    * in-tolerance match — both columns null together).
    *
    * Same one-key-shuffle scale shape as [[asofBackward]] (the bound is
    * a post-window projection, not a range-expanded join); comparison at
    * MICROsecond precision via `unix_micros` (both ts columns must be
    * TIMESTAMP), replayable as `epoch_us` in the oracle.
    */
  def asofBackwardWithin(left: DataFrame, right: DataFrame,
                         keyCols: Seq[String], leftTs: String, rightTs: String,
                         payloadCols: Seq[String], tieCol: String,
                         toleranceSec: Long,
                         outCol: String = "asof"): DataFrame = {
    require(toleranceSec >= 0,
      s"asofBackwardWithin: toleranceSec must be nonnegative, got $toleranceSec")
    val matched = asofBackward(left,
      right.withColumn("__mts", col(rightTs)), keyCols, leftTs, rightTs,
      payloadCols :+ "__mts", tieCol, "__m")
    matched
      .withColumn("__age",
        unix_micros(col(leftTs)) - unix_micros(col("__m.__mts")))
      .withColumn(outCol,
        when(col("__age") <= toleranceSec * 1000000L,
          struct(payloadCols.map(f => col(s"__m.$f")): _*)))
      .withColumn("asof_age_us",
        when(col("__age") <= toleranceSec * 1000000L, col("__age")))
      .drop("__m", "__age")
  }

  /** Bounded-interval range join: inner-join left and right rows of the
    * same key where `rightTs` falls in `[leftTs + lowerSec, leftTs +
    * upperSec]` (bounds inclusive, in seconds; `lowerSec` is typically
    * negative). Left and right must have disjoint non-key column names.
    *
    * Mechanics: both sides bucket into time bins of width
    * `upperSec - lowerSec`; a left row's window can only overlap the two
    * bins its shifted endpoints fall in (`sequence` of at most 2 bin ids),
    * so the equi-join on (key, bin) meets every true match exactly once —
    * a right row lives in exactly one bin, so no post-join dedup is
    * needed — and the exact BETWEEN predicate then discards the bin
    * false-positives. Shuffle is on (key, bin): bounded fan-out of 2x on
    * the left, 1x on the right, versus the unbounded key-partition
    * cross product of the naive same-key join.
    *
    * Bins are computed from epoch SECONDS with floor division (event
    * times here are post-1970; pre-epoch timestamps would need floor
    * rather than `div` truncation).
    *
    * Probe-backed (Scratch, 10x events = 1M rows, 10x users): 1.36 s for
    * 635k output rows vs 0.59 s for the sf0.1 bench run (100k rows, 64k
    * output) — wall-clock tracks output volume (the true match count),
    * not the key-partition pair space, which is the property that holds
    * at 100 TB.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                leftTs: String, rightTs: String,
                lowerSec: Long, upperSec: Long): DataFrame = {
    require(upperSec >= lowerSec,
      s"rangeJoin: upperSec ($upperSec) must be >= lowerSec ($lowerSec)")
    val binSec = math.max(upperSec - lowerSec, 1L)
    // double cast: TIMESTAMP_NTZ (parquet timestamp[us] without tz — what
    // the fixtures carry) cannot cast to LONG directly; NTZ -> TIMESTAMP
    // resolves through the session zone (pinned UTC in GraftSession), and
    // a plain TIMESTAMP column passes through unchanged
    def epochSec(c: String) = s"cast(cast(`$c` as timestamp) as long)"
    val l = left.withColumn("__bin", explode(sequence(
      expr(s"(${epochSec(leftTs)} + ($lowerSec)) div $binSec"),
      expr(s"(${epochSec(leftTs)} + ($upperSec)) div $binSec"))))
    val r = right.withColumn("__bin", expr(s"${epochSec(rightTs)} div $binSec"))
    l.join(r, keyCols :+ "__bin")
      .filter(col(rightTs).between(
        col(leftTs) + expr(s"INTERVAL '$lowerSec' SECOND"),
        col(leftTs) + expr(s"INTERVAL '$upperSec' SECOND")))
      .drop("__bin")
  }

  /** Interval-overlap join: inner-join left and right rows of the same
    * key whose CLOSED tick intervals `[leftStart, leftEnd]` and
    * `[rightStart, rightEnd]` intersect — the span-conflict shape
    * (overlapping annotation spans over one document, concurrent
    * sessions of one user, double-booked maintenance windows). Ticks are
    * plain longs ([[graft.operators.Windows.densifyAndFill]]'s
    * convention: epoch seconds, days, byte offsets — the caller owns the
    * unit), and left/right must have disjoint non-key column names.
    *
    * Mechanics — the [[rangeJoin]] bin trick generalized to two
    * variable-length sides: every interval explodes to the `binTicks`-
    * wide bins it covers, the equi-join runs on (key, bin), and each
    * true pair is kept EXACTLY ONCE by the first-shared-bin filter
    * (`bin == greatest(first bin of either side)` — the multiplicity
    * idea the similarity rewrites use, with arithmetic instead of a
    * band scan) before the exact `ls <= re AND rs <= le` predicate
    * discards bin-neighbor false positives. Shuffle carries
    * (span/binTicks + 1)-way fan-out per row — `binTicks` should sit
    * near the TYPICAL interval length (too small explodes long
    * intervals; too large degrades toward the key-partition cross
    * product). `maxBinsPerRow` turns one wild interval into a loud
    * failure instead of a billion-row explode (the densify contract);
    * a null endpoint or an inverted interval (end < start) contributes
    * nothing — unknown/malformed spans cannot conflict.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                          leftStart: String, leftEnd: String,
                          rightStart: String, rightEnd: String,
                          binTicks: Long, maxBinsPerRow: Long = 4096L): DataFrame = {
    require(binTicks > 0, s"intervalOverlapJoin: binTicks must be positive, got $binTicks")
    require(maxBinsPerRow > 0,
      s"intervalOverlapJoin: maxBinsPerRow must be positive, got $maxBinsPerRow")
    def binsOf(s: String, e: String) = {
      val lo = s"cast(`$s` as long) div $binTicks"
      val hi = s"cast(`$e` as long) div $binTicks"
      when(col(s).isNull || col(e).isNull || col(e) < col(s), lit(null))
        .when(expr(s"($hi) - ($lo)") > maxBinsPerRow,
          raise_error(concat(lit("intervalOverlapJoin: interval ["), col(s),
            lit(", "), col(e), lit(s"] covers more than $maxBinsPerRow bins of $binTicks"))))
        .otherwise(sequence(expr(lo), expr(hi)))
    }
    val l = left.withColumn("__bin", explode(binsOf(leftStart, leftEnd)))
    val r = right.withColumn("__bin", explode(binsOf(rightStart, rightEnd)))
    l.join(r, keyCols :+ "__bin")
      // exactly-once: of the bins a true pair shares, keep the FIRST —
      // which is the larger of the two start bins
      .filter(col("__bin") === greatest(
        expr(s"cast(`$leftStart` as long) div $binTicks"),
        expr(s"cast(`$rightStart` as long) div $binTicks")))
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .drop("__bin")
  }
}
