package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** The listener bus delivers events asynchronously; a measurement taken
  * right after an action can miss the last task-end events. Draining the
  * bus is `private[spark]`, so this one-liner lives in the spark package
  * (same pattern as [[org.apache.spark.sql.graftbridge.GraftColumnBridge]]
  * for the Column/Expression bridge).
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
