package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for test pins (the
  * [[org.apache.spark.sql.graftshim.ColumnBridge]] discipline: one
  * tiny bridge in an org.apache.spark subpackage instead of
  * reflection). Job-count pins previously slept a fixed 1.5-2 s hoping
  * the bus had drained — slow AND racy on a loaded box (late
  * onJobStart events arrive after the sleep and undercount the pin,
  * ADVICE r19). `waitUntilEmpty` blocks until every queued event has
  * been delivered. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
