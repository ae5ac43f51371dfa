package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.graftbridge.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Runtime observability: executor-side task totals for the jobs a block
  * actually ran — the RUNTIME complement of the static plan audits
  * (PlanAuditSpec asserts what the plan SAYS; this measures what the
  * cluster DID). Production uses: sizing `spark.sql.shuffle.partitions`
  * from real shuffle volume, catching a silent broadcast→shuffle
  * regression in CI, and verifying scale contracts ("state never
  * shuffles") with numbers instead of plan-string matching.
  */
object Metrics {

  /** Totals across every task that completed inside a [[measure]] block.
    * `resultBytes` is the driver-bound task-result volume — the number
    * that catches a "distributed" build quietly collecting data. */
  case class TaskTotals(
      tasks: Long,
      inputRecords: Long,
      inputBytes: Long,
      shuffleWriteBytes: Long,
      shuffleReadBytes: Long,
      memorySpillBytes: Long,
      diskSpillBytes: Long,
      resultBytes: Long)

  /** Runs `f`, returning its result plus the task totals of the jobs it
    * triggered. The listener is scoped to the block (registered before,
    * drained and removed after), but it observes the whole SparkContext —
    * run measurement blocks one at a time, not concurrently.
    */
  def measure[T](spark: SparkSession)(f: => T): (T, TaskTotals) = {
    val tasks = new LongAdder; val inRec = new LongAdder; val inBytes = new LongAdder
    val swb = new LongAdder; val srb = new LongAdder
    val memSpill = new LongAdder; val diskSpill = new LongAdder
    val resBytes = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          tasks.increment()
          inRec.add(m.inputMetrics.recordsRead)
          inBytes.add(m.inputMetrics.bytesRead)
          swb.add(m.shuffleWriteMetrics.bytesWritten)
          srb.add(m.shuffleReadMetrics.totalBytesRead)
          memSpill.add(m.memoryBytesSpilled)
          diskSpill.add(m.diskBytesSpilled)
          resBytes.add(m.resultSize)
        }
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    try {
      val r = f
      ListenerBridge.waitUntilEmpty(sc)
      (r, TaskTotals(tasks.sum, inRec.sum, inBytes.sum, swb.sum, srb.sum,
        memSpill.sum, diskSpill.sum, resBytes.sum))
    } finally sc.removeSparkListener(listener)
  }
}
