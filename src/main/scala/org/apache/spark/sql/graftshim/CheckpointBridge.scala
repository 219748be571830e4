package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to free the block-manager storage behind a
  * `localCheckpoint`ed Dataset. `Dataset.unpersist` only talks to the
  * cache manager (`.cache()`/`.persist()` entries); a local checkpoint
  * is a persisted RDD referenced by a `LogicalRDD` leaf, whose blocks
  * otherwise live until the context cleaner GCs the plan — which a
  * long-lived session re-training models in a loop never lets happen
  * promptly (the accumulation the round-16 advice flagged in
  * `LangId.train`/`QualityClassifier.train`).
  *
  * Lives under `org.apache.spark.sql` for access scope only (the
  * [[ColumnBridge]] pattern); keep this file free of other logic. */
object CheckpointBridge {
  /** Unpersist the RDDs behind every `LogicalRDD` leaf of `df`'s plan
    * (non-blocking); a no-op for plans without one. Call once the
    * checkpointed frame's results have been fully consumed — any later
    * action on `df` would recompute from a missing block and fail. */
  def free(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }
}
