package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005):
  * point-FREQUENCY estimates over columns whose distinct count is itself
  * corpus-scale, in `d × w` longs of state per group.
  *
  * The gap it fills next to [[Sketches.MisraGries]]: MG yields the
  * guaranteed-superset heavy-hitter CANDIDATE SET (and [[Sketches
  * .heavyHitters]] then recounts it exactly), but it cannot answer "how
  * often did THIS key occur?" for an arbitrary key — once evicted, a key
  * is gone. CMS keeps a fixed counter matrix instead: row j hashes every
  * key into `w` buckets and counts collisions, and the point estimate
  * `min_j counts[j][bucket_j(key)]` is ALWAYS an overcount (each row's
  * cell holds the key's true count plus its colliders), within εn with
  * high probability for w = e/ε, d = ln(1/δ). An overcount is the safe
  * direction for the use this engine puts it to — rate-limiting / spam
  * gates on url or token frequency at ingest, where a false "too
  * frequent" drops one good row but a false "rare" admits a flood.
  *
  * Distribution contract, same family as q95/q100/q102: the state is one
  * plain long matrix that merges by ELEMENTWISE ADDITION, so Spark's
  * partial aggregation computes it exactly for any merge tree, per-
  * increment states persist as BINARY and combine by re-aggregation, and
  * `estimate(merge(states)) == estimate(one pass over the union)` —
  * exactly, not approximately. Bucket hashing is splitmix64 over the
  * row-seeded input hash ([[Sketches.mix64]], the same finalizer the
  * KMV/HLL sketches use) with power-of-two `w`, so the oracle replays
  * every cell and every probe in SQL from raw values.
  */
object CountMin {

  /** Row seeds: splitmix64 of the row index — fixed, engine-independent
    * constants (the q106 oracle interpolates them as literals).
    */
  def seeds(d: Int): Array[Long] = Array.tabulate(d)(j => Sketches.mix64(j + 1L))

  private def requireShape(d: Int, w: Int): Unit = {
    require(d > 0, s"CountMin: depth must be positive, got $d")
    require(w > 1 && (w & (w - 1)) == 0,
      s"CountMin: width must be a power of two > 1, got $w")
  }

  /** Bucket of input hash `h` in row `j`: mix64(h ^ seed_j) & (w-1) —
    * for power-of-two w the mask equals unsigned mod, which is what the
    * oracle's UBIGINT `%` computes.
    */
  private[graft] def bucketOf(h: Long, seed: Long, w: Int): Int =
    (Sketches.mix64(h ^ seed) & (w - 1)).toInt

  /** CMS counter matrix as a typed mergeable [[Aggregator]] over 64-bit
    * input hashes, finishing to the persistable BINARY form (d*w
    * big-endian longs, row-major — 16 KB at d=4, w=512).
    */
  final class Cms(d: Int, w: Int) extends Aggregator[Long, Array[Long], Array[Byte]] {
    requireShape(d, w)
    private val sds = seeds(d)

    def zero: Array[Long] = new Array[Long](d * w)

    def reduce(st: Array[Long], h: Long): Array[Long] = {
      var j = 0
      while (j < d) { st(j * w + bucketOf(h, sds(j), w)) += 1L; j += 1 }
      st
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    def finish(st: Array[Long]): Array[Byte] = Sketches.kmvToBytes(st)

    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** CMS state as an aggregate BINARY column over a 64-bit hash column. */
  def cmsState(hashCol: Column, d: Int, w: Int): Column =
    udaf(new Cms(d, w), Encoders.scalaLong).apply(hashCol)

  /** Re-aggregate persisted CMS states: elementwise addition — the
    * cross-increment merge. States must share (d, w); a wrong-shape
    * state fails loudly on length.
    */
  final class CmsMerge(d: Int, w: Int)
      extends Aggregator[Array[Byte], Array[Long], Array[Byte]] {
    requireShape(d, w)
    private val n = d * w

    def zero: Array[Long] = new Array[Long](n)

    def reduce(a: Array[Long], in: Array[Byte]): Array[Long] = {
      val s = Sketches.kmvFromBytes(in)
      require(s.length == n,
        s"CmsMerge(d=$d, w=$w): state holds ${s.length} counters, expected $n")
      var i = 0
      while (i < n) { a(i) += s(i); i += 1 }
      a
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < n) { a(i) += b(i); i += 1 }
      a
    }

    def finish(st: Array[Long]): Array[Byte] = Sketches.kmvToBytes(st)

    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def cmsMergeState(stateCol: Column, d: Int, w: Int): Column =
    udaf(new CmsMerge(d, w), Encoders.BINARY).apply(stateCol)

  /** Takedown: subtract a removal set's CMS matrix from a persisted
    * state cell-by-cell — because the matrix is a pure multiset sum,
    * `retract(cms(all), cms(removed)) == cms(all \ removed)` EXACTLY,
    * re-hashing only the removed rows ([[Retraction]] contract for the
    * binary-matrix state shape). A cell going negative fails loudly:
    * the removal set contains rows never ingested. Unlike CMS, the
    * irreversible sketches (KMV/HLL minima, Bloom bits) cannot retract —
    * their takedown path is re-merging surviving increment states.
    */
  def cmsRetractOf(state: Array[Byte], removal: Array[Byte],
                   d: Int, w: Int): Array[Byte] = {
    requireShape(d, w)
    val a = Sketches.kmvFromBytes(state)
    val b = Sketches.kmvFromBytes(removal)
    require(a.length == d * w && b.length == d * w,
      s"cmsRetractOf(d=$d, w=$w): states hold ${a.length}/${b.length} counters, expected ${d * w}")
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) {
      out(i) = a(i) - b(i)
      require(out(i) >= 0L,
        s"cmsRetractOf: cell $i would go negative (${a(i)} - ${b(i)}) — removal set was never ingested")
      i += 1
    }
    Sketches.kmvToBytes(out)
  }

  /** Point estimate for input hash `h` against a persisted state:
    * min over rows of the key's cell — >= the true count, always.
    */
  def cmsEstimateOf(state: Array[Byte], h: Long, d: Int, w: Int): Long = {
    requireShape(d, w)
    val st = Sketches.kmvFromBytes(state)
    require(st.length == d * w,
      s"cmsEstimateOf(d=$d, w=$w): state holds ${st.length} counters, expected ${d * w}")
    val sds = seeds(d)
    var best = Long.MaxValue
    var j = 0
    while (j < d) {
      val c = st(j * w + bucketOf(h, sds(j), w))
      if (c < best) best = c
      j += 1
    }
    best
  }

  /** Column form of [[cmsEstimateOf]]: probe a state column with a hash
    * column. Meant for PROBE sets (a watchlist, a candidate list) joined
    * against one broadcast state row — rows are few and the state is
    * pre-reduced, so a udf is the honest tool; the corpus-scale work
    * already happened inside the aggregator.
    */
  def cmsEstimate(state: Column, hashCol: Column, d: Int, w: Int): Column =
    udf((s: Array[Byte], h: Long) => cmsEstimateOf(s, h, d, w))
      .apply(state, hashCol)

  /** Inner-product estimate between two CMS states sharing (d, w, seeds):
    * `min_j  Σ_i  a[j][i] * b[j][i]` — the Cormode-Muthukrishnan join-size
    * estimator. For relations L, R sketched on their join key, the true
    * equi-join output size is `Σ_k l_k * r_k`; each CMS row's dot product
    * equals that sum PLUS cross-key collision products, so the estimate
    * is ALWAYS an overcount, within εn₁n₂ w.h.p. for the usual (d, w).
    *
    * This is the sketch-scale form of [[Profiling.joinFanoutProfile]]:
    * the profile computes the exact per-key explosion from two per-key
    * count aggregations (a shuffle of one row per distinct key); this
    * answers the ONE question "how big is the output?" from two 16 KB
    * mergeable states that may already exist from ingest — nothing
    * key-cardinality-sized moves at all, and states built per increment
    * combine by addition before estimating. An overcount is again the
    * safe direction: a pre-flight gate that vetoes a join for being too
    * big errs toward asking for the salting/pre-aggregation review.
    *
    * Per-row dot products run in BigInt (two 63-bit counts multiply past
    * Long for corpus-scale cells) and the result returns as
    * DECIMAL(38,0)-safe BigDecimal — the oracle replays every cell and
    * every product in HUGEINT.
    */
  def cmsInnerProductOf(a: Array[Byte], b: Array[Byte], d: Int, w: Int): BigInt = {
    requireShape(d, w)
    val sa = Sketches.kmvFromBytes(a)
    val sb = Sketches.kmvFromBytes(b)
    require(sa.length == d * w && sb.length == d * w,
      s"cmsInnerProductOf(d=$d, w=$w): states hold ${sa.length}/${sb.length} counters, expected ${d * w}")
    var best: BigInt = null
    var j = 0
    while (j < d) {
      var dot = BigInt(0)
      var i = 0
      while (i < w) {
        val x = sa(j * w + i)
        val y = sb(j * w + i)
        if (x != 0 && y != 0) dot += BigInt(x) * BigInt(y)
        i += 1
      }
      if (best == null || dot < best) best = dot
      j += 1
    }
    best
  }

  /** Column form of [[cmsInnerProductOf]]: estimate an equi-join's output
    * size from two one-row broadcast states. DECIMAL(38,0) output — the
    * products can exceed 63 bits long before the true join size does.
    * The udf hands back the digits as a string and the cast types them:
    * a BigDecimal-returning udf would be inferred as DECIMAL(38,18),
    * whose ~1e20 integer cap sits exactly in the regime the BigInt math
    * exists for (ANSI mode would throw on the biggest joins — the ones
    * the gate is FOR); the string path keeps the full 38-digit range.
    */
  def cmsJoinSize(stateA: Column, stateB: Column, d: Int, w: Int): Column =
    udf((a: Array[Byte], b: Array[Byte]) =>
      if (a == null || b == null) null
      else cmsInnerProductOf(a, b, d, w).toString)
      .apply(stateA, stateB).cast("decimal(38,0)")
}
