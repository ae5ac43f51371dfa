package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-probe data generator: replicate an sf-directory `factor`x with
  * key-consistent shifts, producing a corpus that is BIGGER, not merely
  * DUPLICATED — the distinction that decides whether a 10x run measures
  * the engine or measures fixture degeneracy:
  *
  *  - Every id/foreign-key column shifts by `replica * 1e9`, so joins,
  *    uniqueness guards (rankedEval, BpeVocab.encode, StateStore pk
  *    gates), and watermark fixtures keep their invariants per replica.
  *  - `documents.text` goes through a per-replica CHARACTER ROTATION (a
  *    cyclic derangement of [a-z], [A-Z], [0-9]; whitespace/punctuation
  *    untouched): within a replica the corpus is exactly isomorphic to
  *    the original — token counts, lengths, line structure, and every
  *    set-overlap relationship (word shingles, char shingles, token
  *    sets) are preserved bit-for-bit in STRUCTURE — while across
  *    replicas every letter-bearing token and char shingle differs, so
  *    planted near-dup clusters stay at their sf0.1 size instead of
  *    growing 10x and exploding pairwise outputs quadratically. (The
  *    first r11 generator suffixed each token with `~r<k>` instead;
  *    measured on the full suite, that salt INFLATED within-replica
  *    char-6-shingle Jaccard — every token pair shared the salt motif —
  *    blowing q38's pair output from 256 to 2.6M and q25's to 42x. A
  *    uniform character permutation adds NO shared content anywhere.)
  *  - `embeddings.embedding` multiplies by a per-replica deterministic
  *    +-1 sign pattern: within-replica inner products are EXACTLY
  *    preserved (s_j^2 = 1, so every within-replica cosine — and thus
  *    every planted near-dup — survives bit-for-bit in structure), while
  *    cross-replica cosines collapse to ~0 (random sign agreement), so
  *    vector dedup fixtures likewise scale without mega-clusters.
  *  - Dimension tables (region, nation) stay single-copy: scaling facts
  *    against fixed dims is exactly the 100-TB shape.
  *
  * The known, DESIGNED exceptions at 10x: q34/q154/q155 route through
  * `exactCosinePairs`/`exactJaccardPairs`, whose loud guards count the
  * input first and raise above their audit caps (10k vectors / 5k docs).
  * At sf1 those three queries must FAIL with the guard message — the
  * guard firing on a production-sized input is the behavior the audit
  * operators promise, and the bench artifact records it as such.
  *
  * Usage: `graft.ScaleData <inDir> <outDir> <factor>`.
  */
object ScaleData {

  private val Off = 1000000000L

  /** Deterministic +-1 sign for (replica, element) — splitmix64 avalanche
    * parity, replica 0 all +1 (identity copy). */
  private def sign(r: Int, j: Int): Float =
    if (r == 0) 1.0f
    else {
      var z = r.toLong * 64L + j + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= (z >>> 31)
      if ((z & 1L) == 0L) 1.0f else -1.0f
    }

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorStr) = args
    val factor = factorStr.toInt
    require(factor >= 1 && factor <= 100, s"factor $factor out of range")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$inDir/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scaledata] $t: ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }
    def shifted(df: DataFrame, r: Int, keys: Seq[String]): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(r * Off)))
    def replicated(t: String, keys: Seq[String],
                   extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until factor).map(r => extra(shifted(read(t), r, keys), r))
        .reduce(_ unionByName _)

    // dims: single copy — facts scale against fixed dims
    write("region", read("region"))
    write("nation", read("nation"))

    write("customer", replicated("customer", Seq("c_custkey")))
    write("supplier", replicated("supplier", Seq("s_suppkey")))
    write("part", replicated("part", Seq("p_partkey")))
    write("orders", replicated("orders", Seq("o_orderkey", "o_custkey")))
    write("lineitem", replicated("lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey")))
    write("events", replicated("events", Seq("event_id", "user_id")))

    write("documents", replicated("documents", Seq("doc_id"), (df, r) =>
      if (r == 0) df
      else {
        // cyclic rotations are derangements for non-zero offsets; r*7 mod
        // 26 and r*3 mod 10 are non-zero for every r in 1..9
        def rot(s: String, k: Int) = s.drop(k) + s.take(k)
        val lower = "abcdefghijklmnopqrstuvwxyz"
        val upper = lower.toUpperCase
        val digits = "0123456789"
        val kL = (r * 7) % 26
        val kD = (r * 3) % 10
        df.withColumn("text", translate(col("text"),
          lower + upper + digits,
          rot(lower, kL) + rot(upper, kL) + rot(digits, kD)))
      }))

    write("embeddings", replicated("embeddings", Seq("vec_id"), (df, r) =>
      if (r == 0) df
      else {
        val signs = array((0 until 64).map(j => lit(sign(r, j))): _*)
        df.withColumn("embedding",
          zip_with(col("embedding"), signs, (x, s) => x * s))
      }))

    spark.stop()
  }
}
