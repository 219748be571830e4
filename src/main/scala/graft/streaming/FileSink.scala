package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** S13 — file sink (SURVEY §2.1). The reference installs the Camel SFTP
  * sink connector (reference `Dockerfile:46-59`) to land topic records as
  * files on a remote host; the dataflow half is "stream → rolling files
  * in a directory", which Structured Streaming's file sink provides with
  * exactly-once semantics via the sink's own transaction log. The
  * transfer leg (SFTP) is deployment, not dataflow — but note the
  * exactly-once contract lives in the `_spark_metadata` sink log, NOT
  * the directory listing: a failed/retried micro-batch can leave
  * orphaned part files that only the log excludes. A transfer leg must
  * therefore ship the files named in `_spark_metadata` (or read the
  * directory back through Spark, which consults the log) — a naive
  * directory rsync would duplicate the orphans.
  *
  * Scale: the file sink writes one file per partition per micro-batch —
  * pair with `partitionBy` on a date/route column so downstream scans
  * prune, and coalesce tiny batches upstream if file counts matter.
  */
object FileSink {

  /** Streaming writer: rolling parquet/csv/json files under `path`.
    * Caller `.start()`s it (possibly via Reconcile). */
  def writer(df: DataFrame, format: String, path: String, checkpoint: String,
      partitionBy: Seq[String] = Nil,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] = {
    val w = df.writeStream.format(format)
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
  }

  /** Batch writer with the same layout (bulk landing / backfill). */
  def writeBatch(df: DataFrame, format: String, path: String,
      mode: String = "append", partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.format(format).mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }
}
