package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Bounded-memory frequency sketches for corpus-scale profiling.
  *
  * The motivating gap: "which tokens/urls/shingles are frequent?" at
  * 100 TB cannot start with `groupBy(item).count()` — that shuffles one
  * row per DISTINCT item (billions for web-scale token/url columns) just
  * to throw almost all of them away. A Misra-Gries summary gives the
  * candidate set in ONE scan with `width` counters per partial aggregate:
  * map-side partials shuffle at most `width` (item, count) entries per
  * partition — the reducer merges 32 bounded maps, not 10⁹ distinct keys.
  *
  * Misra-Gries merge (Agarwal et al., "Mergeable Summaries", PODS'12):
  * sum counters, then subtract the (width+1)-th largest counter from all
  * and drop the non-positive. The merged summary keeps the one-pass
  * guarantee: any item with true count > n/(width+1) is present, for ANY
  * merge tree — so the candidate set may vary with partitioning, but its
  * guaranteed-superset property does not. [[heavyHitters]] therefore
  * recounts candidates EXACTLY in a second bounded pass and filters on
  * the exact threshold, making the final output deterministic and
  * SQL-replayable (the oracle is plain GROUP BY + HAVING).
  *
  * Reference scope: the reference profiles value frequencies driver-side
  * after collect (redshift-etl-notebook.ipynb cells 35-38, small dims);
  * this is the same report shape made safe for columns whose distinct
  * count is itself corpus-scale.
  */
object Sketches {

  /** Driver-visible result of the sketch phase: candidate items only
    * (counts are re-derived exactly; MG counts are lower bounds and NOT
    * deterministic across merge orders, so they never leave the sketch).
    */
  final case class MgCandidates(items: Seq[String])

  /** Misra-Gries sketch as a typed, mergeable [[Aggregator]]: Spark runs
    * `reduce` map-side (partial aggregation) and `merge` on the single
    * reduce group — the classic distributed-sketch dataflow with no
    * custom RDD code. Buffer is a bounded mutable map (kryo-encoded; it
    * only serializes on partial-result exchange, width entries max).
    */
  final class MisraGries(width: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], MgCandidates] {
    require(width > 0, s"MisraGries: width must be positive, got $width")

    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def reduce(m: mutable.HashMap[String, Long], v: String): mutable.HashMap[String, Long] = {
      if (v != null) { m.update(v, m.getOrElse(v, 0L) + 1L); shrink(m) }
      m
    }

    def merge(a: mutable.HashMap[String, Long],
              b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
      shrink(a)
      a
    }

    /** Subtract the (width+1)-th largest counter, drop the non-positive.
      * For a single increment this degenerates to the textbook
      * "decrement all by 1 when full" step.
      */
    private def shrink(m: mutable.HashMap[String, Long]): Unit =
      if (m.size > width) {
        val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(width)
        m.filterInPlace((_, c) => c > cut)
      }

    def finish(m: mutable.HashMap[String, Long]): MgCandidates =
      MgCandidates(m.keys.toSeq.sorted)

    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    def outputEncoder: Encoder[MgCandidates] = Encoders.product[MgCandidates]
  }

  /** The sketch as an untyped aggregate column, usable in `df.agg`. */
  def misraGries(itemCol: Column, width: Int): Column =
    udaf(new MisraGries(width), Encoders.STRING).apply(itemCol)

  /** Exact heavy hitters in two bounded passes: items of `itemCol` whose
    * exact count c satisfies `c * minShareDenom > n` (share strictly
    * above 1/minShareDenom of all rows), with exact counts and integer
    * share_ppm — no full `groupBy(item)` over the distinct space ever
    * runs.
    *
    * Pass 1: Misra-Gries global aggregate (one scan, bounded partials)
    * → at most `width` candidates on the driver. Sound because
    * `width >= minShareDenom` implies n/(width+1) < n/minShareDenom: no
    * qualifying item can be missing from the sketch.
    * Pass 2: one scan recounting ONLY the candidates (an `isin` filter
    * the scanner prunes with; the groupBy shuffles ≤ width keys), plus
    * the row total from the same pass via a grouping on a constant.
    *
    * Output: (item, cnt, share_ppm), exact and merge-order-independent.
    */
  def heavyHitters(items: DataFrame, itemCol: String,
                   minShareDenom: Long, width: Int): DataFrame = {
    require(minShareDenom > 1, s"heavyHitters: minShareDenom must be > 1, got $minShareDenom")
    require(width >= minShareDenom,
      s"heavyHitters: width ($width) must be >= minShareDenom ($minShareDenom) for the no-false-negative guarantee")

    val cands: Seq[String] = items
      .agg(misraGries(col(itemCol), width).as("mg"))
      .select(col("mg.items"))
      .head().getSeq[String](0)

    val total = items.agg(count(col(itemCol)).cast("long").as("n"))
    val counted = items
      .filter(col(itemCol).isin(cands: _*))
      .groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    counted
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(minShareDenom) > col("n"))
      // `div`, not `/`: integer floor quotient on both engines (the q83
      // precedent) — a double quotient truncated can flap on .999… reprs.
      .select(col("item"), col("cnt"), expr("cnt * 1000000L div n").as("share_ppm"))
  }
}
