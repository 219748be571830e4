package graft.streaming

import graft.operators.CdcApply
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Structured-Streaming operators replicating the Connect runtime
  * semantics (SURVEY §2.8 T1-T9). The reference's Connect worker is an
  * at-least-once per-record pump with sink-side idempotence (PK upsert)
  * and offsets in a Kafka topic (reference `main.sh:62-67`); Spark's
  * equivalents are watermarked stateful operators plus checkpointed
  * `foreachBatch` sinks.
  *
  * Every helper takes/returns DataFrames so it works identically on a
  * batch frame (for the DuckDB-oracle batch equivalents) and on a
  * streaming frame (exercised with MemoryStream in the test suite).
  */
object StreamOps {

  /** T1 — watermark (streaming only; identity on batch frames). */
  def withWatermark(df: DataFrame, tsCol: String, delay: String): DataFrame =
    if (df.isStreaming) df.withWatermark(tsCol, delay) else df

  /** T2/T3 — tumbling (slide == size) or sliding window aggregation. */
  def windowedAgg(df: DataFrame, tsCol: String, size: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), size, slide) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** T4 — session windows with a fixed inactivity gap. */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** T5 — streaming dedup on keys (with watermark bound when streaming). */
  def dedup(df: DataFrame, keys: Seq[String]): DataFrame = df.dropDuplicates(keys)

  /** T8/T9 — CDC-apply sink: per micro-batch, fold changes into the
    * parquet state dir idempotently (batchId-keyed overwrite = the
    * at-least-once + idempotent-write contract of the Debezium sink,
    * reference `Dockerfile:28-31`). */
  def cdcSink(changes: DataFrame, stateDir: String, keys: Seq[String],
      ord: Seq[Column], isTombstone: Column, checkpoint: String): DataStreamWriter[Row] =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val state =
          try spark.read.parquet(stateDir)
          catch { case _: Throwable => spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], batch.schema) }
        CdcApply(state, batch, keys, ord, isTombstone)
          .write.mode("overwrite").parquet(s"$stateDir.next")
        // atomic-ish swap: rewrite state from the new snapshot
        spark.read.parquet(s"$stateDir.next").write.mode("overwrite").parquet(stateDir)
      }
}
