package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** T10 — declarative reconcile of a desired query set, the Spark analogue
  * of the reference's only real algorithm: upsert every connector named in
  * `CONNECTOR_NAMES` and prune unmanaged ones via the Connect REST API
  * (reference `main.sh:146-196`: PUT per name at `main.sh:155-165`, list
  * at `main.sh:117-128`, delete-non-desired at `main.sh:190-195`).
  *
  * Here the "connector registry" is a map of named `DataStreamWriter`s and
  * the "worker state" is `spark.streams.active`: reconcile starts every
  * desired query not yet running and stops every running query not in the
  * desired set. Idempotent — calling it repeatedly converges, like the
  * reference's reconcile-on-boot loop.
  *
  * MULTI-WORKER SCOPE (the reference's `?forward=true` leader
  * forwarding, `main.sh:155-159`): this reconcile is single-session by
  * construction — `spark.streams` is a per-SparkSession
  * StreamingQueryManager, so "the worker state" here is one driver's
  * queries. A Connect cluster forwards the PUT to the group leader so
  * any worker can accept a config; the Spark-native equivalent of that
  * topology is not N coordinating sessions but ONE driver owning all
  * streaming queries over a cluster of executors — worker membership,
  * rebalance, and leader election are what Spark's driver/executor
  * split already provides. Where several DRIVERS must share a desired
  * set (e.g. blue/green), the composition is external: point each
  * driver's reconcile at a partition of the desired map (the analogue
  * of Connect task assignment), never at the same query names — two
  * sessions starting the same checkpointed query would race on the
  * checkpoint lock. */
object Reconcile {

  /** Bring the set of active streaming queries in line with `desired`
    * (name → un-started writer). Returns the (started, stopped) query
    * names that actually succeeded. One failing query must not abort
    * the rest — the reference's loop logs-and-continues per connector
    * (`main.sh:164`), and a thrown stop() would otherwise leave the
    * remaining stops undone and nothing started; failures go through
    * the bounded-retry [[stop]] or are reported on stderr and retried
    * by the next reconcile tick (the loop is idempotent). */
  def apply(spark: SparkSession,
      desired: Map[String, DataStreamWriter[Row]]): (Seq[String], Seq[String]) = {
    // unnamed queries (name == null) are ad-hoc user streams — never
    // managed, never pruned (and they'd NPE the name sort below)
    val active = spark.streams.active.filter(_.name != null).map(q => q.name -> q).toMap
    val toStart = desired.keySet.diff(active.keySet).toSeq.sorted
    val toStop = active.keySet.diff(desired.keySet).toSeq.sorted
    val stopped = toStop.filter(n => stop(spark, n))
    val started = toStart.filter { n =>
      try { desired(n).queryName(n).start(); true }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[reconcile] start $n failed: ${e.getMessage}"); false
      }
    }
    (started, stopped)
  }

  /** List running managed queries, like `GET /connectors`
    * (reference `main.sh:117-128`). */
  def list(spark: SparkSession): Seq[String] =
    spark.streams.active.map(_.name).filter(_ != null).toSeq.sorted

  /** Stop one query with bounded retry, like the reference's
    * `delete_connector` 8×2s loop (`main.sh:130-141`). No non-local
    * returns (they surface as NonLocalReturnControl inside try/catch)
    * and only NonFatal errors trigger a retry. */
  def stop(spark: SparkSession, name: String, retries: Int = 8): Boolean = {
    var done = false
    var attempt = 0
    while (!done && attempt < retries) {
      spark.streams.active.find(_.name == name) match {
        case Some(q) =>
          try { q.stop(); done = true }
          catch { case scala.util.control.NonFatal(_) => Thread.sleep(100) }
        case None => done = true
      }
      attempt += 1
    }
    done || spark.streams.active.forall(_.name != name)
  }
}
