package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** T7 — arbitrary stateful processing (SURVEY §2.8). The Connect runtime
  * keeps per-task state (source offsets) in a compacted topic (reference
  * `main.sh:63`); the Spark analogue for user-defined per-key state is
  * `flatMapGroupsWithState` over a typed `KeyValueGroupedDataset`.
  *
  * Scale: state lives in the executor state store partitioned by key —
  * no driver involvement; per-key state size here is O(1).
  */
object Stateful {

  /** Per-key running aggregate record emitted each micro-batch. */
  case class KeyAgg(key: Long, n: Long, total: Double)

  implicit val keyAggEnc: Encoder[KeyAgg] = Encoders.product[KeyAgg]
  implicit val stateEnc: Encoder[(Long, Double)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)

  /** Running (count, sum) per key across micro-batches — the canonical
    * flatMapGroupsWithState shape. Works on a streaming Dataset in
    * Update mode; on a batch Dataset it degenerates to a per-key agg. */
  def runningPerKey(ds: Dataset[(Long, Double)]): Dataset[KeyAgg] =
    ds.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[(Long, Double), KeyAgg](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          Iterator(KeyAgg(key, n, s))
      }

  /** T7, modern form — the same running per-key aggregate on Spark 4's
    * `transformWithState`: named typed state handles (ValueState with
    * optional TTL), timers, and state-schema evolution — the successor
    * API to flatMapGroupsWithState. Requires the RocksDB state store
    * provider (`spark.sql.streaming.stateStore.providerClass`). */
  class RunningAggProcessor extends StatefulProcessor[Long, (Long, Double), KeyAgg] {
    @transient private var agg: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[(Long, Double)]("agg", stateEnc, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timers: TimerValues): Iterator[KeyAgg] = {
      val (n0, s0) = if (agg.exists()) agg.get() else (0L, 0.0)
      var n = n0; var s = s0
      rows.foreach { case (_, v) => n += 1; s += v }
      agg.update((n, s))
      Iterator(KeyAgg(key, n, s))
    }
  }

  /** [[runningPerKey]] expressed on transformWithState (streaming only —
    * the new API has no batch degeneration path). */
  def runningPerKeyTws(ds: Dataset[(Long, Double)]): Dataset[KeyAgg] =
    ds.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new RunningAggProcessor,
        TimeMode.None(), OutputMode.Update(), keyAggEnc)

  /** [[RunningAggProcessor]] with a state TTL — the bounded-state form
    * for unbounded key spaces (session-scoped per-user aggregates over a
    * 100 TB event stream): a key idle past `ttlMillis` has its state
    * evicted by the store, so the next sighting restarts from zero and
    * total state size tracks the ACTIVE key set, not the all-time one.
    * TTL requires processing-time mode. */
  class RunningAggProcessorTtl(ttlMillis: Long)
      extends StatefulProcessor[Long, (Long, Double), KeyAgg] {
    @transient private var agg: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[(Long, Double)]("agg", stateEnc,
        TTLConfig(java.time.Duration.ofMillis(ttlMillis)))
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timers: TimerValues): Iterator[KeyAgg] = {
      val (n0, s0) = if (agg.exists()) agg.get() else (0L, 0.0)
      var n = n0; var s = s0
      rows.foreach { case (_, v) => n += 1; s += v }
      agg.update((n, s))
      Iterator(KeyAgg(key, n, s))
    }
  }

  /** [[runningPerKeyTws]] with per-key state TTL. */
  def runningPerKeyTtl(ds: Dataset[(Long, Double)], ttlMillis: Long): Dataset[KeyAgg] =
    ds.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new RunningAggProcessorTtl(ttlMillis),
        TimeMode.ProcessingTime(), OutputMode.Update(), keyAggEnc)

  /** Cross-batch exactly-once-per-key dedup: emit a key's row only the
    * first time the key is ever seen (state = seen marker). */
  def firstSeenOnly[V](ds: Dataset[(Long, V)])(implicit ev: Encoder[(Long, V)]): Dataset[(Long, V)] =
    ds.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[Boolean, (Long, V)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, V)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) }
      }(Encoders.scalaBoolean, ev)
}
