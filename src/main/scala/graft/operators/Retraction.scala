package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact state RETRACTION for count-shaped states — the takedown half of
  * the state family's lifecycle. Ingesting an increment merges its state
  * in by addition (q95/q100/.../q117); deleting documents (a takedown, a
  * right-to-be-forgotten request, a bad-crawl rollback) must take their
  * contribution back OUT, and at 100 TB "rebuild the state from the
  * survivors" is not an answer. Count-shaped states are abelian-group
  * valued, so the removed documents' OWN state subtracts exactly:
  *
  *   retract(state(all), state(removed)) == state(all \ removed)
  *
  * row-for-row — only the removed docs are ever re-read. This holds for
  * every per-key count family (vocab term counts q113, bigram LM q117,
  * line document-frequencies q104, log-histogram buckets q102, CMS
  * matrices q106/q116) and does NOT hold for the irreversible sketches —
  * KMV/HLL minima and Bloom bits cannot un-see a key (documented on each;
  * their takedown answer is rebuild, which their increments-forms make a
  * bounded re-merge of surviving increment states).
  *
  * Zero-count keys are DROPPED (state(all \ removed) never materializes
  * them), and a key going NEGATIVE fails loudly — it means the removal
  * set contains documents that were never ingested into this state, and
  * silently clamping would hide a bookkeeping bug upstream.
  *
  * Scale shape: one unionByName + one map-side-combinable sum at
  * distinct-key cardinality — the exact shape of the state merge itself.
  */
object Retraction {

  def subtract(state: DataFrame, removal: DataFrame, keyCols: Seq[String],
               cntCol: String): DataFrame = {
    require(keyCols.nonEmpty, "Retraction.subtract: need at least one key column")
    def shaped(df: DataFrame, negate: Boolean) = {
      val c = col(cntCol).cast("long")
      df.select(keyCols.map(col) :+ (if (negate) -c else c).as(cntCol): _*)
    }
    shaped(state, negate = false)
      .unionByName(shaped(removal, negate = true))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(cntCol)).as(cntCol))
      // the negative guard lives in the FILTER predicate, not a projected
      // column: a projection would be column-pruned away by a consumer
      // that never reads the count (.select(keys), .count()) and the
      // contract's loud failure would silently not fire
      .filter(when(col(cntCol) < 0, raise_error(concat(
          lit(s"Retraction.subtract: negative $cntCol for key ("),
          concat_ws(",", keyCols.map(k => col(k).cast("string")): _*),
          lit(") — the removal set contains rows never ingested into this state"))))
        .otherwise(col(cntCol) =!= 0))
  }
}
