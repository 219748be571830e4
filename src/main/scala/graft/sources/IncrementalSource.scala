package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable incremental source modes (SURVEY §2.1 S2/S3). Connect keeps
  * each source task's offsets in a compacted Kafka topic (reference
  * `main.sh:63`) so a restarted task resumes exactly where the last
  * committed poll ended; the engine mirrors that with a durable offset
  * file per source, written with the same tmp-write + atomic-rename
  * pointer flip as the CDC state store
  * ([[graft.streaming.StreamOps.applyBatch]]).
  *
  * Delivery contract is Connect's: **at-least-once**. [[Poll.commit]]
  * advances the offset only when the caller says the batch was
  * delivered — a crash between poll and commit re-reads the same rows
  * on the next poll, never skips them. Offsets are tiny (one (ts, id)
  * pair), so durability costs one small file write per poll, not a
  * shuffle.
  *
  * Scale: the resume predicate is pushed into the scan
  * (`id > lastId` / `(ts, id) > (lastTs, lastId)` — parquet row-group
  * skipping, or the WHERE clause a real JDBC source appends), and the
  * committed offset is a single bounded `max` aggregate.
  */
object IncrementalSource {

  /** A polled batch plus the handle that durably commits its offset.
    * `commit()` is a no-op on an empty batch (offset unchanged). */
  final case class Poll(batch: DataFrame, commit: () => Unit)

  // ---- offset persistence (the offsets-topic analogue) ----

  private def pointer(root: Path) = new Path(root, "_SOURCE_OFFSET")

  /** Stored (tsMicros, id) offset, if any poll ever committed. */
  def readOffset(spark: SparkSession, stateDir: String): Option[(Long, Long)] = {
    val root = new Path(stateDir)
    val p = pointer(root)
    AtomicPointer.read(spark.sparkContext.hadoopConfiguration, p).map { txt =>
      val parts = txt.split(",")
      require(parts.length == 2, s"malformed source offset '$txt' at $p")
      (parts(0).toLong, parts(1).toLong)
    }
  }

  /** Durably record the offset: tmp write + atomic overwrite-rename, so
    * a crash mid-commit leaves the previous offset intact (re-poll, not
    * data loss). */
  def writeOffset(spark: SparkSession, stateDir: String,
      tsMicros: Long, id: Long): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new Path(stateDir)
    root.getFileSystem(hconf).mkdirs(root)
    AtomicPointer.write(hconf, new Path(root, "_SOURCE_OFFSET.tmp"),
      pointer(root), s"$tsMicros,$id")
  }

  // ---- S2: incrementing mode ----

  /** One `mode=incrementing` poll: the batch upper bound is PINNED at
    * poll time (one bounded max aggregate against the source), so the
    * batch is the closed interval `lastId < id <= pinnedMax` and
    * `commit()` records the pinned bound. Deriving the bound lazily at
    * commit time would re-scan the source and fold in rows that arrived
    * AFTER delivery — silently skipping them forever. Rows beyond the
    * pin land in the next poll.
    *
    * `maxRowsPerPoll` (the Confluent JDBC source's `batch.max.rows` /
    * Kafka's `maxOffsetsPerTrigger` analogue) bounds one poll: the pin
    * becomes the `maxRowsPerPoll`-th smallest new id instead of the
    * global max, so a large backlog (first poll against a year of
    * history, a source that burst while the pipeline was down) drains
    * across several bounded polls instead of one giant batch that
    * overwhelms the sink. `commit()` still advances only to the
    * DELIVERED high-water mark — the remaining backlog is simply what
    * the next poll sees. The bound is computed as a per-partition
    * bottom-k + k-row merge (TakeOrderedAndProject), never a global
    * sort. */
  def pollIncrementing(df: DataFrame, idCol: String, stateDir: String,
      maxRowsPerPoll: Int = Int.MaxValue): Poll = {
    require(maxRowsPerPoll > 0, "maxRowsPerPoll must be positive")
    val spark = df.sparkSession
    val lastId = readOffset(spark, stateDir).map(_._2).getOrElse(Long.MinValue)
    // NULL-id rows are never captured, matching the Connect JDBC source
    // (the incrementing column must be non-nullable there) — made
    // explicit here rather than left to three-valued `>` semantics
    val fresh = df.where(col(idCol).isNotNull && col(idCol) > lastId)
    // unbounded: one max aggregate. Bounded: max over the k smallest new
    // ids (limit(Int.MaxValue) would plan a driver-side global sort —
    // keep the unbounded path a plain aggregate)
    val mx = (if (maxRowsPerPoll == Int.MaxValue) fresh
      else fresh.select(col(idCol)).orderBy(col(idCol)).limit(maxRowsPerPoll))
      .agg(max(col(idCol)).cast("long")).collect()(0)
    if (mx.isNullAt(0)) Poll(df.where(lit(false)), () => ()) // nothing new
    else {
      val pinned = mx.getLong(0)
      val batch = df.where(col(idCol) > lastId && col(idCol) <= pinned)
      Poll(batch, () => writeOffset(spark, stateDir, 0L, pinned))
    }
  }

  // ---- S3: timestamp+incrementing mode ----

  /** One `mode=timestamp+incrementing` poll: rows with
    * `(lastTs, lastId) < (ts, id) <= pinned` lexicographically — the
    * Confluent resume predicate (equal-timestamp rows are neither
    * skipped nor re-read) with the upper bound pinned at poll time like
    * [[pollIncrementing]]. Rows written later with a timestamp at or
    * below the pin are missed, as in the Connect source — timestamp mode
    * assumes source timestamps are monotonic per the resume contract.
    * Rows with a NULL timestamp or id are never captured (Connect
    * requires non-nullable mode columns); without the explicit filter a
    * table whose NEW rows all carry NULL timestamps would make
    * `max(struct(ts, id))` return a non-null struct with a null ts field
    * (struct ordering sorts the null field lowest, so the struct itself
    * survives) and the pin dereference would NPE.
    *
    * `maxRowsPerPoll` bounds the poll exactly as in [[pollIncrementing]]
    * (pin = the k-th smallest new (ts, id) pair, lexicographically). */
  def pollTimestampIncrementing(df: DataFrame, tsCol: String, idCol: String,
      stateDir: String, maxRowsPerPoll: Int = Int.MaxValue): Poll = {
    require(maxRowsPerPoll > 0, "maxRowsPerPoll must be positive")
    val spark = df.sparkSession
    val (lastUs, lastId) = readOffset(spark, stateDir).getOrElse((Long.MinValue, Long.MinValue))
    val lastTs = new java.sql.Timestamp(Math.floorDiv(lastUs, 1000000L) * 1000L)
    lastTs.setNanos((Math.floorMod(lastUs, 1000000L) * 1000L).toInt)
    val keyed = df.where(col(tsCol).isNotNull && col(idCol).isNotNull)
    val beyond =
      if (lastUs == Long.MinValue) keyed // initial poll: everything keyed
      else Tables.timestampIncrementingScan(keyed, tsCol, idCol, lastTs, lastId)
    val mx = (if (maxRowsPerPoll == Int.MaxValue) beyond
      else beyond.select(col(tsCol), col(idCol))
        .orderBy(col(tsCol), col(idCol)).limit(maxRowsPerPoll))
      .agg(max(struct(col(tsCol).alias("ts"), col(idCol).cast("long").alias("id"))))
      .collect()(0)
    if (mx.isNullAt(0)) Poll(df.where(lit(false)), () => ())
    else {
      val r = mx.getStruct(0)
      val pinTs = r.getTimestamp(0)
      val pinId = r.getLong(1)
      val pinUs = Math.floorDiv(pinTs.getTime, 1000L) * 1000000L + (pinTs.getNanos / 1000L)
      val ts = col(tsCol); val id = col(idCol)
      val batch = beyond.where(
        ts < lit(pinTs) || (ts === lit(pinTs) && id <= pinId))
      Poll(batch, () => writeOffset(spark, stateDir, pinUs, pinId))
    }
  }
}
