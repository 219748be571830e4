package graft

import org.apache.spark.sql.SparkSession

/** Recommended SparkSession configuration for the engine — one place for
  * the settings every entry point (Verify, Bench, tests, user apps)
  * needs:
  *
  *  - UTC session timezone (cross-engine determinism, FIXTURES.md),
  *  - AQE on (runtime re-plan: broadcast promotion, skew-join splitting,
  *    partition coalescing — the 100 TB safety net),
  *  - shuffle partitions sized to the parallelism actually available
  *    (cluster deployments should set `spark.sql.shuffle.partitions`
  *    explicitly to ~2-3x total cores),
  *  - `nanosAsLong` for the TIMESTAMP(NANOS) parquet fixtures (the
  *    vectorized reader has no ns type; `Tables.events` converts).
  */
object GraftSession {

  def builder(master: String = "local[*]",
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(
      Runtime.getRuntime.availableProcessors()).toString
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Parquet TIMESTAMP columns written without isAdjustedToUTC would
      // otherwise infer as TIMESTAMP_NTZ (Spark 3.4+ default): with the
      // session pinned to UTC the instant is identical either way, and
      // the engine's time operators (unix_micros bucketing, Avro/JSON
      // serde) speak the TIMESTAMP type — read all parquet timestamps
      // as TIMESTAMP for one consistent time semantics
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  /** Local session for the harness entry points. */
  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", Some(cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
