package graft

import org.apache.spark.sql.DataFrame

/** Explicit storage reclamation for `localCheckpoint`-backed frames.
  *
  * An eager `localCheckpoint(true)` truncates lineage by materializing
  * the frame into executor block storage — but those blocks live on the
  * checkpointed RDD, NOT in the cache manager, so `frame.unpersist()` is
  * a silent no-op on them and reclamation otherwise waits for driver GC
  * + ContextCleaner. Any operator that hands a checkpoint-backed frame
  * to a caller (BPE training's words frame, materialized signature
  * frames, audit outputs) pairs with this: call [[release]] when done
  * and the blocks free immediately instead of accumulating one corpus
  * copy per call in a long-lived session (the Verify/Bench driver).
  *
  * Safe on any frame — plans without a LogicalRDD have nothing to
  * collect. After release the frame is unusable (lineage was truncated;
  * Spark logs a WARN to that effect), which is the point: release only
  * what you have dropped.
  */
object CheckpointBlocks {
  def release(frame: DataFrame): Unit =
    frame.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))
}
