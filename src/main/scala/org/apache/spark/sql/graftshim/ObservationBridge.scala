package org.apache.spark.sql
package graftshim

/** Bridge to `private[sql]` Observation internals — the non-blocking
  * metrics read behind the bounded-wait guard in
  * [[graft.operators.Similarity]]'s assignmentStats (ADVICE r19: the
  * public `get` blocks forever when the observed CollectMetrics node
  * is dropped from the executed plan). The [[ColumnBridge]] access
  * discipline: scope only, no logic. */
object ObservationBridge {
  def getOrEmpty(obs: Observation): Map[String, Any] = obs.getOrEmpty
}
