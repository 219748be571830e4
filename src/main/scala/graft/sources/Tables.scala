package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * In the reference stack the table edge is a JDBC source feeding Kafka
  * topics (reference `Dockerfile:36-40`, Confluent JDBC source modes
  * bulk/incrementing/timestamp); in the offline harness Parquet stands in
  * for the RDBMS. The incremental-read modes (SURVEY §2.1 S2/S3) are
  * expressed as predicates so Catalyst pushes them into the scan
  * (`PushedFilters` on the parquet reader) — exactly what the JDBC source
  * does by appending a WHERE clause at the database.
  *
  * Scale note: each loader is a plain scan — at 100 TB these become
  * partitioned-directory scans and the pushed predicates become partition
  * pruning; nothing here collects to the driver.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Load with per-table normalization applied (currently: the events
    * ns→µs timestamp conversion) — use when the table name is dynamic. */
  def loadNormalized(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir) else load(spark, sfDir, name)

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS): Spark's reader has no ns
    * timestamp type, so sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * and this loader converts ns → µs TimestampType (integer `div` — a
    * double division would lose precision on 1.7e18-scale ns values).
    * DuckDB's µs read truncates identically, so oracles line up. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** S4 — query-mode source (the Confluent source's `query=` config):
    * user SQL evaluated over the registered tables — in JDBC the database
    * runs it; here Catalyst does, with the same pushdown/pruning.
    *
    * Only tables the SQL actually references are registered (word-bound
    * match): registering all ten would clobber same-named user temp
    * views as a side effect and pay ~10 parquet footer reads per call.
    * Existence probes go through the Hadoop filesystem of `sfDir` —
    * java.io.File would silently see nothing on hdfs://-s3a:// paths. */
  def queryScan(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(sfDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // blank out string literals and comments before matching: a table
    // name inside '...%customer%' or a comment is NOT a reference, and
    // registering it would clobber a same-named user temp view — the
    // exact side effect selective registration exists to avoid
    val lower = stripLiteralsAndComments(sql).toLowerCase
    all.filter(t => s"\\b$t\\b".r.findFirstIn(lower).isDefined).foreach { t =>
      if (fs.exists(new org.apache.hadoop.fs.Path(root, s"$t.parquet")))
        loadNormalized(spark, sfDir, t).createOrReplaceTempView(t)
    }
    spark.sql(sql)
  }

  /** One left-to-right pass replacing string literals ('' escapes stay
    * inside their literal), `--` line comments and block comments with
    * spaces. Sequential regex passes (the previous shape) mis-nest the
    * two syntaxes: an apostrophe inside a comment ("-- don't") opened a
    * phantom literal that could swallow a real table reference up to the
    * next quote, leaving its view unregistered. A single scanner decides
    * each construct by whichever opens first. Quoted/backtick identifiers
    * are left in place — `"customer"` IS a table reference. */
  private[sources] def stripLiteralsAndComments(sql: String): String = {
    val sb = new StringBuilder(sql.length)
    val n = sql.length
    var i = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {                       // string literal
        sb.append(' '); i += 1
        var open = true
        while (i < n && open) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2 // '' escape
            else { open = false; i += 1 }
          } else i += 1
        }
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1 // -- comment (keep \n)
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        // block comment — Spark SQL accepts NESTED bracketed comments
        // (`/* /* */ customer */`), so track depth: closing at the first
        // `*/` would leave the tail in scanner output as a phantom
        // table reference, the exact clobber this scanner prevents
        i += 2
        var depth = 1
        while (i < n && depth > 0) {
          if (i + 1 < n && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') { depth += 1; i += 2 }
          else if (i + 1 < n && sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') { depth -= 1; i += 2 }
          else i += 1
        }
        sb.append(' ')
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** S2 — incrementing-mode source: only rows with id beyond the stored
    * offset. The predicate is pushed into the scan (JDBC: `WHERE id > ?`;
    * parquet: row-group min/max skip). */
  def incrementingScan(df: DataFrame, idCol: String, lastOffset: Long): DataFrame =
    df.where(df.col(idCol) > lastOffset)

  /** S3 — timestamp+incrementing mode: `(ts > lastTs) OR (ts = lastTs AND
    * id > lastId)` — the exact resume predicate the Confluent JDBC source
    * uses so no row is skipped or re-read across polls. */
  def timestampIncrementingScan(df: DataFrame, tsCol: String, idCol: String,
      lastTs: java.sql.Timestamp, lastId: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val ts = df.col(tsCol); val id = df.col(idCol)
    df.where(ts > lit(lastTs) || (ts === lit(lastTs) && id > lastId))
  }
}
