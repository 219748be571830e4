package graft.sources

import graft.operators.SmtChain
import graft.streaming.FileSink
import org.apache.spark.sql.SparkSession

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
  * (parquet default). Exactly one sink must be configured. */
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
    val poll = ConnectorConfig.pollSource(spark, sfDir, config, stateDir)
    val polledAnything = !poll.batch.isEmpty
    // one barrier run of the source scan + chain: the count and the
    // sink write must not each recompute the poll (incremental polls
    // are bounded by design; a 100 TB one-shot bulk load should go
    // through the plain scan builders, not a poll loop)
    val transformed = SmtChain.fromConfig(config)(poll.batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = transformed.count()
      if (n > 0) (config("connection.url"), config("sink.path")) match {
        case (Some(url), None) =>
          val table = config("table.name.format").getOrElse(err("needs table.name.format"))
          if (table.contains("${")) err(
            "table.name.format placeholders are not supported — route to a literal table")
          val creds = JdbcBridge.sinkCreds(config)
          // Connect auto.create: create WHEN MISSING — never clobber a
          // table already holding earlier cycles' rows (ensureTable
          // probes via metadata and its CREATE never drops)
          if (config("auto.create").exists(_.toBoolean))
            JdbcBridge.ensureTable(url, table, transformed.schema,
              config("pk.fields").map(_.split(",").map(_.trim).toSeq).getOrElse(Nil), creds)
          config("insert.mode").getOrElse("insert") match {
            case "insert" => JdbcBridge.insertInto(transformed, url, table, creds)
            case "upsert" =>
              val pk = config("pk.fields").map(_.split(",").map(_.trim).toSeq)
                .getOrElse(err("insert.mode=upsert needs pk.fields"))
              JdbcBridge.upsert(transformed, url, table, pk, creds = creds)
            case other => err(s"unknown insert.mode '$other' (insert, upsert)")
          }
        case (None, Some(path)) =>
          FileSink.writeBatch(transformed, config("sink.format").getOrElse("parquet"), path)
        case (Some(_), Some(_)) => err("configure ONE sink: connection.url or sink.path")
        case (None, None) => err("no sink configured (connection.url or sink.path)")
      }
      // commit only after delivery: Connect's at-least-once contract
      poll.commit()
      (polledAnything, n)
    } finally transformed.unpersist(blocking = false)
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
