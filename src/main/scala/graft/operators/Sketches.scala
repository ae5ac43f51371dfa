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

    // Amortization slack: the buffer may hold up to 2·width entries
    // before a purge, so the O(width log width) cut-selection runs once
    // per `width` NEW-key inserts (existing-key increments never grow the
    // map) — O(log width) amortized, vs a full sort on every new key once
    // the map was full. The purge itself is unchanged (cut at the
    // (width+1)-th largest counter), and its soundness argument is purge-
    // schedule-independent, so batching purges keeps the same guarantee;
    // `finish` purges back to <= width so the candidate contract holds.
    private val purgeAt = 2 * width

    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def reduce(m: mutable.HashMap[String, Long], v: String): mutable.HashMap[String, Long] = {
      if (v != null) {
        m.update(v, m.getOrElse(v, 0L) + 1L)
        if (m.size >= purgeAt) shrink(m)
      }
      m
    }

    def merge(a: mutable.HashMap[String, Long],
              b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
      if (a.size >= purgeAt) shrink(a)
      a
    }

    /** The textbook purge, batched: subtract the (width+1)-th largest
      * counter (`cut`) from EVERY counter and drop the non-positive —
      * for a purge on a single overflow this degenerates to "decrement
      * all by 1 when full". The subtraction is what carries the
      * guarantee: every purge removes >= cut*(width+1) total mass, so
      * the cuts sum to <= n/(width+1), any key's total loss is bounded
      * by that sum, and a key with true count > n/(width+1) must end
      * positive — present. Dropping below the cut WITHOUT decrementing
      * survivors (an earlier form of this purge) loses exactly that
      * accounting: survivors then witness every purge at full strength,
      * the cut never drains, and a heavy key arriving in between purges
      * can be evicted at each one — the spec pins the counterexample.
      */
    private def shrink(m: mutable.HashMap[String, Long]): Unit =
      if (m.size > width) {
        purgeCount += 1
        val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(width)
        m.filterInPlace((_, c) => c > cut)
        m.mapValuesInPlace((_, c) => c - cut)
      }

    /** Purges run on this instance — the amortization contract's
      * observable (MetricsSpec pins purges <= n/width, which is what
      * makes the per-row cost O(log width) amortized); driving a single
      * instance directly is the intended use, the distributed path has
      * one instance per partial.
      */
    private[graft] var purgeCount: Long = 0L

    def finish(m: mutable.HashMap[String, Long]): MgCandidates = {
      shrink(m)
      MgCandidates(m.keys.toSeq.sorted)
    }

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

  // ---- distinct-count sketches -------------------------------------------
  //
  // `groupBy(g).agg(countDistinct(x))` shuffles one row per distinct
  // (g, x) pair — at 100 TB that is the full key space moved across the
  // wire to answer a question whose answer is one number per group. Both
  // sketches below shuffle O(k) / O(m) bytes per group per partition
  // instead, and both are MERGEABLE (Agarwal et al., PODS'12): the merge
  // of two sketches equals the sketch of the union, for any merge tree —
  // so Spark's partial-aggregation dataflow computes them exactly, and
  // the same state can be persisted and merged across daily increments.
  //
  // Both estimators are INTEGER-EXACT given the sketch state (BigInt
  // floor arithmetic, replayed in DuckDB HUGEINT) and both hash with
  // FNV-1a 64 ([[graft.functions.expr.Fnv64]]) so the oracle recomputes
  // every hash from raw values in SQL. Determinism: sketch state is a
  // pure set function of the input (k smallest distinct / per-bucket max),
  // independent of row order and partitioning — unlike Misra-Gries above,
  // no exact second pass is needed.

  /** splitmix64 finalizer (Steele/Lea/Flood 2014, public domain). Both
    * sketches apply it to their input hash: their estimators are ORDER
    * STATISTICS of the hash values (k-th min / leading-zero ranks), and a
    * byte-fold hash like FNV-1a is uniform enough for bucketing but NOT
    * in its order statistics on short structured keys (measured: KMV over
    * fnv("v_0".."v_19999") estimates 9.7k for 20k true — 2× off; with
    * this finalizer 18.6k). The oracle replays the mix with an
    * overflow-free split multiply (HUGEINT is signed 128-bit: a direct
    * 64×64 product overflows it).
    */
  def mix64(h: Long): Long = {
    var x = h
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** KMV sketch state: the k smallest DISTINCT hash values (unsigned
    * order), tracked via the order-preserving transform t = h ^ MinValue.
    */
  final case class KmvEstimate(estDistinct: Long, sketchFilled: Long)

  /** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002).
    * Input: 64-bit hashes. State: the k smallest distinct values in
    * UNSIGNED hash order, as a sorted Array[Long] of the order-preserving
    * transforms — bounded at k longs, and a plain array because kryo
    * cannot round-trip scala TreeSet/TreeMap buffers. Estimator: with
    * U_k the k-th smallest distinct unsigned hash over the 2^64 domain,
    * the expected gap spacing gives n̂ = (k-1) * 2^64 / U_k (floor, exact
    * in BigInt); if fewer than k distinct hashes exist the count is
    * exact.
    */
  final class Kmv(k: Int) extends Aggregator[Long, Array[Long], KmvEstimate] {
    require(k > 1, s"Kmv: k must be > 1, got $k")

    private def flip(h: Long): Long = h ^ Long.MinValue

    /** Insert transformed value `t` into sorted `arr`, keeping at most k
      * distinct ascending entries — no-op when t is present or above the
      * k-th min of a full sketch (the common case after warm-up).
      */
    private def insert(arr: Array[Long], t: Long): Array[Long] = {
      val idx = java.util.Arrays.binarySearch(arr, t)
      if (idx >= 0) arr
      else {
        val ins = -idx - 1
        if (arr.length < k) {
          val out = new Array[Long](arr.length + 1)
          System.arraycopy(arr, 0, out, 0, ins)
          out(ins) = t
          System.arraycopy(arr, ins, out, ins + 1, arr.length - ins)
          out
        } else if (ins < k) {
          val out = new Array[Long](k)
          System.arraycopy(arr, 0, out, 0, ins)
          out(ins) = t
          System.arraycopy(arr, ins, out, ins + 1, k - ins - 1)
          out
        } else arr
      }
    }

    def zero: Array[Long] = Array.emptyLongArray
    def reduce(arr: Array[Long], h: Long): Array[Long] = insert(arr, flip(mix64(h)))
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = b.foldLeft(a)(insert)

    def finish(arr: Array[Long]): KmvEstimate =
      if (arr.length < k) KmvEstimate(arr.length.toLong, arr.length.toLong)
      else {
        val uk = BigInt(arr(k - 1)) + (BigInt(1) << 63) // unsigned k-th min
        val est = (BigInt(k - 1) << 64) / uk
        // clamp: uk below (k-1)·2^64/2^63 would overflow the Long and
        // silently wrap negative (the oracle's CAST AS BIGINT raises
        // instead) — saturate rather than emit garbage
        KmvEstimate(est.min(BigInt(Long.MaxValue)).toLong, k.toLong)
      }

    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[KmvEstimate] = Encoders.product[KmvEstimate]
  }

  /** KMV as an untyped aggregate column over a 64-bit hash column. */
  def kmvDistinct(hashCol: Column, k: Int): Column =
    udaf(new Kmv(k), Encoders.scalaLong).apply(hashCol)

  /** HLL result: registers-set count, max register, integer estimate. */
  final case class HllEstimate(estDistinct: Long, filled: Long, maxRank: Long)

  /** HyperLogLog registers (Flajolet et al. 2007) with an integer-exact
    * estimator. m = 2^p registers per group (fixed 2^p bytes of state —
    * the classic "4 KB counts a billion" sketch); register j holds the
    * max rank (leading-zero count + 1 of the hash suffix) seen for bucket
    * j = top p bits. Merge = element-wise max.
    *
    * Estimator (raw HLL, no small-range branch — that needs `ln`, which
    * is not bit-stable across engines; exact small counts are KMV's job):
    * with R = max register and N = Σ_j 2^(R - r_j) (integer; empty
    * registers contribute 2^R), the harmonic mean gives
    * n̂ = α_m · m² / Σ 2^(-r_j) = α_m · m² · 2^R / N, with
    * α_m = 0.7213/(1 + 1.079/m) carried as the exact rational
    * 7213000·m / (10000·(1000·m + 1079)) so the floor quotient is
    * bit-identical in BigInt and DuckDB HUGEINT.
    */
  final class Hll(p: Int) extends Aggregator[Long, Array[Byte], HllEstimate] {
    require(p >= 4 && p <= 16, s"Hll: p must be in [4,16], got $p")
    private val m = 1 << p

    def zero: Array[Byte] = new Array[Byte](m)

    def reduce(regs: Array[Byte], h0: Long): Array[Byte] = {
      val h = mix64(h0)
      val bucket = (h >>> (64 - p)).toInt
      val w = h << p
      val rank = if (w == 0) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rank > regs(bucket)) regs(bucket) = rank.toByte
      regs
    }

    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var j = 0
      while (j < m) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
      a
    }

    def finish(regs: Array[Byte]): HllEstimate = {
      var maxR = 0
      var filled = 0L
      var j = 0
      while (j < m) {
        if (regs(j) > maxR) maxR = regs(j)
        if (regs(j) > 0) filled += 1
        j += 1
      }
      var n = BigInt(0)
      j = 0
      while (j < m) { n += BigInt(1) << (maxR - regs(j)); j += 1 }
      val alphaNum = BigInt(7213000L) * m
      val alphaDen = BigInt(10000L) * (1000L * m + 1079L)
      val est = alphaNum * m * m * (BigInt(1) << maxR) / (alphaDen * n)
      HllEstimate(est.toLong, filled, maxR.toLong)
    }

    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[HllEstimate] = Encoders.product[HllEstimate]
  }

  /** HLL as an untyped aggregate column over a 64-bit hash column. */
  def hllDistinct(hashCol: Column, p: Int): Column =
    udaf(new Hll(p), Encoders.scalaLong).apply(hashCol)

  // ---- sketch-state persistence ------------------------------------------
  //
  // The mergeability that makes the sketches exact under Spark's partial
  // aggregation is also what makes them INCREMENTAL: persist the register
  // array next to a snapshot, and the next day's distinct count is
  // merge(yesterday's state, today's batch state) — no recount of
  // yesterday's keys, which at 100 TB is the difference between reading
  // one table and reading every table since ingest began. These two
  // aggregators expose that state as a BINARY column (2^p bytes) and
  // re-aggregate persisted states by element-wise max.

  /** HLL registers as a persistable BINARY column (no estimate — state,
    * not answer). Same reduce/merge as [[Hll]].
    */
  final class HllState(p: Int) extends Aggregator[Long, Array[Byte], Array[Byte]] {
    private val inner = new Hll(p)
    def zero: Array[Byte] = inner.zero
    def reduce(regs: Array[Byte], h: Long): Array[Byte] = inner.reduce(regs, h)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inner.merge(a, b)
    def finish(regs: Array[Byte]): Array[Byte] = regs
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def hllState(hashCol: Column, p: Int): Column =
    udaf(new HllState(p), Encoders.scalaLong).apply(hashCol)

  /** Merged result: the estimate columns of [[Hll]] plus the merged
    * register state, so a merge's output can itself be persisted as the
    * next increment's base.
    */
  final case class HllMerged(estDistinct: Long, filled: Long, maxRank: Long,
                             state: Array[Byte])

  /** Re-aggregate persisted register states: element-wise max (the HLL
    * merge), then the same integer-exact estimator as [[Hll]] — so
    * `estimate(merge(states))` over increments equals the estimate a
    * single pass over the union would produce, exactly.
    */
  final class HllMerge(p: Int) extends Aggregator[Array[Byte], Array[Byte], HllMerged] {
    private val inner = new Hll(p)
    private val m = 1 << p
    def zero: Array[Byte] = new Array[Byte](m)
    def reduce(a: Array[Byte], in: Array[Byte]): Array[Byte] = {
      require(in.length == m, s"HllMerge: state has ${in.length} registers, expected $m")
      inner.merge(a, in)
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inner.merge(a, b)
    def finish(regs: Array[Byte]): HllMerged = {
      val e = inner.finish(regs)
      HllMerged(e.estDistinct, e.filled, e.maxRank, regs)
    }
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[HllMerged] = Encoders.product[HllMerged]
  }

  def hllMergeState(stateCol: Column, p: Int): Column =
    udaf(new HllMerge(p), Encoders.BINARY).apply(stateCol)

  // KMV state round-trip, parity with the HLL pair above: the sorted
  // k-minimum-values array is as persistable as HLL's registers (merge =
  // set-union of transforms, keep the k smallest), so a daily pipeline
  // can carry EITHER sketch across increments. State encodes as
  // big-endian longs, ascending — at most 8k bytes.

  private[graft] def kmvToBytes(arr: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(arr.length * 8)
    arr.foreach(bb.putLong)
    bb.array()
  }

  private[graft] def kmvFromBytes(b: Array[Byte]): Array[Long] = {
    require(b.length % 8 == 0,
      s"kmv state must be whole big-endian longs, got ${b.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(b)
    Array.fill(b.length / 8)(bb.getLong)
  }

  /** KMV sorted-array state as a persistable BINARY column (state, not
    * answer). Same reduce/merge as [[Kmv]].
    */
  final class KmvState(k: Int) extends Aggregator[Long, Array[Long], Array[Byte]] {
    private val inner = new Kmv(k)
    def zero: Array[Long] = inner.zero
    def reduce(arr: Array[Long], h: Long): Array[Long] = inner.reduce(arr, h)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    def finish(arr: Array[Long]): Array[Byte] = kmvToBytes(arr)
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def kmvState(hashCol: Column, k: Int): Column =
    udaf(new KmvState(k), Encoders.scalaLong).apply(hashCol)

  /** Merged result: the estimate columns of [[Kmv]] plus the merged
    * state, so a merge's output can itself be persisted as the next
    * increment's base.
    */
  final case class KmvMerged(estDistinct: Long, sketchFilled: Long,
                             state: Array[Byte])

  /** Re-aggregate persisted KMV states: sorted-array set-union keeping
    * the k smallest (the KMV merge), then the same integer-exact
    * estimator as [[Kmv]] — `estimate(merge(states))` over increments
    * equals the estimate of one pass over the union, exactly.
    *
    * `k` MUST equal the k the states were built with. A state built with
    * LARGER k is rejected (its length can exceed k — below, the guard);
    * a state built with smaller k is undetectable (it looks like a
    * legitimately part-filled sketch) and would silently read as an
    * exact count when it is a truncated sketch — the caller owns k
    * consistency, as with [[HllMerge]]'s register width.
    */
  final class KmvMerge(k: Int) extends Aggregator[Array[Byte], Array[Long], KmvMerged] {
    private val inner = new Kmv(k)
    def zero: Array[Long] = inner.zero
    def reduce(a: Array[Long], in: Array[Byte]): Array[Long] = {
      val s = kmvFromBytes(in)
      require(s.length <= k,
        s"KmvMerge(k=$k): state holds ${s.length} values — built with a larger k")
      inner.merge(a, s)
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    def finish(arr: Array[Long]): KmvMerged = {
      val e = inner.finish(arr)
      KmvMerged(e.estDistinct, e.sketchFilled, kmvToBytes(arr))
    }
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[KmvMerged] = Encoders.product[KmvMerged]
  }

  def kmvMergeState(stateCol: Column, k: Int): Column =
    udaf(new KmvMerge(k), Encoders.BINARY).apply(stateCol)

  // ---- KMV set operations (Beyer et al., SIGMOD'07, "On Synopses for
  // Distinct-Value Estimation Under Multiset Operations"). Two KMV
  // states built over the SAME hash pipeline support set-operation
  // estimates WITHOUT touching the raw data again: with L the k
  // smallest of A ∪ B — computable from the two truncated states alone
  // — and K∩ = |{t ∈ L : t ∈ state(A) ∧ t ∈ state(B)}|, ρ̂ = K∩/|L|
  // estimates the Jaccard similarity and D̂∩ = ρ̂ · D̂∪(L) the
  // intersection size. Membership against the TRUNCATED states is
  // sound: any t ∈ L is among the k smallest of the union, hence among
  // the k smallest of whichever side contains it. This is the audit
  // primitive for cross-corpus overlap at 100 TB — per-snapshot states
  // a pipeline already persists (q100) answer "how much does corpus A
  // share with corpus B" in O(k) per pair, where the exact answer is a
  // full distinct-key join of both corpora.

  /** Set-operation estimates from two KMV states: `unionEst` /
    * `interEst` (distinct counts), `jaccardPermille` (integer parts per
    * thousand), `mergedFilled` = |L|. Exact when the union holds fewer
    * than k distinct hashes (both sketches part-filled).
    */
  final case class KmvOverlap(unionEst: Long, interEst: Long,
                              jaccardPermille: Long, mergedFilled: Long)

  /** JVM form of the estimator — all integer arithmetic (BigInt floor,
    * permille ratios), replayed exactly by the q105 oracle. Both states
    * MUST come from the same k and the same hash column; a state built
    * with a larger k is rejected (same guard as [[KmvMerge]]).
    */
  def kmvOverlapOf(a: Array[Byte], b: Array[Byte], k: Int): KmvOverlap = {
    require(k > 1, s"kmvOverlapOf: k must be > 1, got $k")
    val sa = kmvFromBytes(a)
    val sb = kmvFromBytes(b)
    require(sa.length <= k && sb.length <= k,
      s"kmvOverlapOf(k=$k): state holds ${sa.length.max(sb.length)} values — " +
        "built with a larger k")
    // flipped transforms sort ascending == unsigned hash order (Kmv)
    val merged = (sa ++ sb).distinct.sorted.take(k)
    val ell = merged.length
    val inter = merged.count(t =>
      java.util.Arrays.binarySearch(sa, t) >= 0 &&
        java.util.Arrays.binarySearch(sb, t) >= 0)
    val unionEst =
      if (ell < k) ell.toLong
      else {
        val uk = BigInt(merged(k - 1)) + (BigInt(1) << 63)
        ((BigInt(k - 1) << 64) / uk).min(BigInt(Long.MaxValue)).toLong
      }
    // inter <= k and unionEst <= Long.Max keep the product inside BigInt
    // comfortably; the quotient never exceeds unionEst
    val interEst =
      if (ell == 0) 0L else (BigInt(inter) * BigInt(unionEst) / ell).toLong
    val jac = if (ell == 0) 0L else inter * 1000L / ell
    KmvOverlap(unionEst, interEst, jac, ell.toLong)
  }

  /** Column form of [[kmvOverlapOf]] over two BINARY state columns. Runs
    * once per group PAIR (a handful of rows over pre-reduced states),
    * never per data row — a udf is the honest tool here, there is no
    * codegen win to chase on the cold path.
    */
  def kmvOverlap(a: Column, b: Column, k: Int): Column =
    udf((x: Array[Byte], y: Array[Byte]) => kmvOverlapOf(x, y, k)).apply(a, b)
}
