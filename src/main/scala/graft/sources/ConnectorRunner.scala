package graft.sources

import graft.operators.SmtChain
import graft.streaming.FileSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** The reference's WHOLE connector contract in one call: a single
  * Connect-style properties map drives source → transform chain → sink,
  * exactly as an operator of the reference runs it (submit flat-JSON
  * config, reference `main.sh:148-159`; the worker then polls,
  * transforms and delivers). [[ConnectorConfig]] dispatches the source
  * modes, [[SmtChain]] parses the `transforms.*` grammar,
  * [[JdbcBridge]] / [[FileSink]] deliver — this module only sequences
  * them under Connect's delivery contract:
  *
  *  - the source offset commits AFTER the sink write returns —
  *    a crash between the two redelivers the batch (at-least-once,
  *    the Connect worker's contract); `insert.mode=upsert` makes
  *    redelivery idempotent, `insert` does not (documented on
  *    [[JdbcBridge.insertInto]]).
  *  - `batch.max.rows` bounds each poll; calling [[runOnce]] in a loop
  *    drains a backlog across bounded polls with durable resume
  *    (offsets in `stateDir`, the offsets-topic analogue).
  *
  * Sink dispatch (Confluent JDBC-sink keys, public API):
  * `connection.url` + `table.name.format` (literal table name;
  * `${topic}` routing needs a topic column and is rejected here —
  * route with an SMT first), `insert.mode` insert|upsert,
  * `pk.fields` for upsert, `auto.create=true` to issue the PK DDL on
  * first delivery. File sink: `sink.path` + optional `sink.format`
  * (parquet default). Exactly one sink must be configured.
  *
  * Error handling (Connect worker keys, public API): an optional value
  * converter (`value.converter=json` + `value.converter.column` +
  * `value.converter.schema` DDL) parses a raw JSON payload column into
  * top-level fields before the SMT chain — the step where Connect's
  * deserialization errors arise. `errors.tolerance=none` (default)
  * fails the cycle loudly on the first unparseable record, BEFORE the
  * offset commit, so nothing is skipped. `errors.tolerance=all` routes
  * corrupt records to `errors.deadletter.path` (parquet append; the
  * DLQ-topic analogue, raw payload preserved for replay) and keeps the
  * cycle flowing; with no dead-letter path configured they are dropped,
  * exactly as Connect drops errant records when no DLQ topic is set. */
object ConnectorRunner {

  /** One poll-transform-deliver cycle. Returns the delivered row count
    * (rows surviving the SMT chain — a Filter can legitimately deliver
    * 0 from a non-empty poll; offsets still advance past the dropped
    * rows). Offsets are untouched by an empty poll. */
  def runOnce(spark: SparkSession, sfDir: String,
      config: ConnectorConfig.Config, stateDir: String): Long =
    runCycle(spark, sfDir, config, stateDir)._2

  /** (polledAnything, deliveredRows) — the first drives [[drain]]'s
    * termination: "drained" means the SOURCE returned nothing, not that
    * a Filter dropped everything this cycle delivered. */
  private def runCycle(spark: SparkSession, sfDir: String,
      config: ConnectorConfig.Config, stateDir: String): (Boolean, Long) = {
    def err(msg: String) = throw new IllegalArgumentException(s"${config.name}: $msg")
    // sink + tolerance config validated BEFORE any data-dependent gate:
    // a drain whose Filter chain drops every poll must still fail fast
    // on a misconfigured sink instead of committing offsets past the
    // data (r7 ADVICE)
    val deliver = sinkFor(config, err)
    val tolerance = config("errors.tolerance").getOrElse("none")
    if (tolerance != "none" && tolerance != "all")
      err(s"unknown errors.tolerance '$tolerance' (none, all)")
    val poll = ConnectorConfig.pollSource(spark, sfDir, config, stateDir)
    // one barrier run of the source scan: the emptiness probe, the
    // corrupt split, the count and the sink write must not each
    // recompute the poll (incremental polls are bounded by design; a
    // 100 TB one-shot bulk load should go through the plain scan
    // builders, not a poll loop)
    val batch = poll.batch
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val polledAnything = !batch.isEmpty
      val (converted, corrupt) = convertValue(batch, config, err)
      corrupt.foreach { q =>
        if (tolerance == "none") {
          // fail BEFORE the offset commit: with tolerance=none nothing
          // may be skipped past
          val bad = q.limit(1).collect()
          if (bad.nonEmpty) throw new IllegalStateException(
            s"${config.name}: unparseable record with errors.tolerance=none; " +
              s"first raw payload: ${bad.head.getAs[String]("raw")}")
        } else config("errors.deadletter.path") match {
          case Some(dlq) =>
            FileSink.writeBatch(q, config("errors.deadletter.format")
              .getOrElse("parquet"), dlq)
          case None => () // Connect with no DLQ topic drops errant records
        }
      }
      val transformed = SmtChain.fromConfig(config)(converted)
      val n = transformed.count()
      if (n > 0) deliver(transformed)
      // commit only after delivery: Connect's at-least-once contract
      poll.commit()
      (polledAnything, n)
    } finally batch.unpersist(blocking = false)
  }

  /** Build the delivery closure, validating the sink configuration
    * eagerly — every `err` in here fires on the FIRST cycle whether or
    * not it delivers rows. */
  private def sinkFor(config: ConnectorConfig.Config,
      err: String => Nothing): DataFrame => Unit =
    (config("connection.url"), config("sink.path")) match {
      case (Some(url), None) =>
        val table = config("table.name.format").getOrElse(err("needs table.name.format"))
        if (table.contains("${")) err(
          "table.name.format placeholders are not supported — route to a literal table")
        val creds = JdbcBridge.sinkCreds(config)
        val pk = config("pk.fields").map(_.split(",").map(_.trim).toSeq)
        val mode = config("insert.mode").getOrElse("insert")
        if (mode != "insert" && mode != "upsert")
          err(s"unknown insert.mode '$mode' (insert, upsert)")
        if (mode == "upsert" && pk.isEmpty) err("insert.mode=upsert needs pk.fields")
        transformed => {
          // Connect auto.create: create WHEN MISSING — never clobber a
          // table already holding earlier cycles' rows (ensureTable
          // probes via metadata and its CREATE never drops)
          if (config("auto.create").exists(_.toBoolean))
            JdbcBridge.ensureTable(url, table, transformed.schema,
              pk.getOrElse(Nil), creds)
          if (mode == "insert") JdbcBridge.insertInto(transformed, url, table, creds)
          else JdbcBridge.upsert(transformed, url, table, pk.get, creds = creds)
        }
      case (None, Some(path)) =>
        val format = config("sink.format").getOrElse("parquet")
        transformed => FileSink.writeBatch(transformed, format, path)
      case (Some(_), Some(_)) => err("configure ONE sink: connection.url or sink.path")
      case (None, None) => err("no sink configured (connection.url or sink.path)")
    }

  /** Optional Connect value-converter leg: `value.converter=json`
    * parses the raw JSON payload column `value.converter.column`
    * against `value.converter.schema` (DDL, e.g. `"k INT, v STRING"`),
    * replacing the raw column with the parsed fields at top level —
    * ready for the SMT chain, exactly where Connect's converter sits.
    * Parsed field names must not collide with the poll's other columns
    * (Spark rejects the ambiguity). Returns the clean frame and, when
    * a converter is configured, the quarantine frame (corrupt rows with
    * the raw payload under `raw`, envelope columns preserved). */
  private def convertValue(batch: DataFrame, config: ConnectorConfig.Config,
      err: String => Nothing): (DataFrame, Option[DataFrame]) =
    config("value.converter") match {
      case None => (batch, None)
      case Some("json") =>
        val c = config("value.converter.column")
          .getOrElse(err("value.converter=json needs value.converter.column"))
        val ddl = config("value.converter.schema")
          .getOrElse(err("value.converter=json needs value.converter.schema"))
        val schema =
          try StructType.fromDDL(ddl)
          catch { case e: IllegalArgumentException =>
            err(s"bad value.converter.schema '$ddl': ${e.getMessage}") }
        val parsed = ErrorTolerance.tolerantJson(batch, c, schema, "_converted")
        val cleanStruct = ErrorTolerance.clean(parsed, "_converted").drop(c)
        val flat = cleanStruct.select(
          cleanStruct.columns.filterNot(_ == "_converted").map(col)
            :+ col("_converted.*"): _*)
        (flat, Some(ErrorTolerance.quarantine(parsed, "_converted").drop(c)))
      case Some(other) => err(s"unknown value.converter '$other' (json)")
    }

  /** Drain the source: poll cycles until the SOURCE returns nothing
    * (bounded by `maxCycles` against misconfigured non-advancing
    * sources). Termination is on poll emptiness, NOT delivered count —
    * a Filter transform dropping an entire bounded poll still advances
    * the offset and the loop keeps going until the backlog is truly
    * consumed. Returns total delivered rows. */
  def drain(spark: SparkSession, sfDir: String, config: ConnectorConfig.Config,
      stateDir: String, maxCycles: Int = 1000): Long = {
    // a bulk source redelivers everything per cycle — it can never drain
    require(config("mode").exists(_ != "bulk"),
      s"${config.name}: drain needs an incremental mode (bulk never empties)")
    var total = 0L
    var cycles = 0
    var polled = true
    while (polled && cycles < maxCycles) {
      val (p, n) = runCycle(spark, sfDir, config, stateDir)
      polled = p
      total += n
      cycles += 1
    }
    require(!polled,
      s"${config.name}: backlog not drained after $maxCycles cycles")
    total
  }
}
