package graft.similarity

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * scan the corpus once, rank per query. Scale path: LSH-bucketed
  * candidates, exact re-rank inside buckets — corpus shuffles once on a
  * compact bucket key instead of being crossed with every query.
  */
object Knn {

  /** Brute-force top-k: queries x corpus scored with the native CosineSim
    * expression. The query side is broadcast, so the corpus is scanned
    * exactly once with no shuffle; ranking uses a per-query window over
    * |Q|*k candidate rows after a TakeOrdered-style pushdown... actually
    * the window runs over |Q|*|corpus| scored rows, so this is the
    * CORRECT-but-O(|Q|*N) baseline — use lshTopK for large query sets.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(VectorFunctions.cosine(col("qvec"), col("cvec")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** LSH-bucketed approximate top-k: hyperplane signature per vector;
    * candidates = corpus vectors sharing a signature band with the query;
    * exact cosine re-rank within candidates. Recall is tunable via
    * (nBits, bands); verified against brute force in the test suite.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, dim: Int, k: Int,
              nBits: Int = 16, bands: Int = 4): DataFrame = {
    val bits = nBits / bands
    def withBands(df: DataFrame, side: String): DataFrame = {
      val sig = VectorFunctions.hyperplaneSignature(col(vecCol), dim, nBits)
      df.select(col(idCol).as(s"${side}_id"), col(vecCol).as(s"${side}_vec"), sig.as("sig"))
        .select(col(s"${side}_id"), col(s"${side}_vec"),
          explode(array((0 until bands).map(bnd =>
            struct(lit(bnd).as("band"),
              shiftrightunsigned(col("sig"), bnd * bits)
                .bitwiseAND(lit((1L << bits) - 1)).as("bucket"))): _*)).as("bb"))
        .select(col(s"${side}_id"), col(s"${side}_vec"),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    }
    val qb = withBands(queries, "query")
    val cb = withBands(corpus, "neighbor")
    val candidates = cb.join(broadcast(qb), Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine",
        round(VectorFunctions.cosine(col("query_vec"), col("neighbor_vec")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
