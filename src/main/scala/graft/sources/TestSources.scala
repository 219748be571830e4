package graft.sources

import org.apache.spark.sql.{DataFrame, Encoder, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** S15 — synthetic stream sources for exercising the streaming operators
  * (SURVEY §2.1): a `rate` source (monotonic rows/sec generator) and a
  * `MemoryStream` factory for deterministic micro-batch tests. The
  * reference has no test sources at all; these stand in for a dev Kafka
  * topic.
  */
object TestSources {

  /** Built-in rate source: `timestamp`, `value` columns at `rowsPerSecond`. */
  def rate(spark: SparkSession, rowsPerSecond: Int = 10,
      numPartitions: Int = 4): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .option("numPartitions", numPartitions.toString)
      .load()

  /** Deterministic in-memory micro-batch source (drive with `addData`
    * + `processAllAvailable`). */
  def memory[T: Encoder](implicit sqlContext: SQLContext): MemoryStream[T] =
    MemoryStream[T]
}
