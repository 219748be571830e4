package graft

import graft.operators.Smt
import graft.sources.{AvroSerde, ConnectorConfig, JdbcBridge, KafkaEnvelope}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's END-TO-END dataflow (SURVEY §0), run live in one test:
  *
  * RDBMS --(JDBC source, mode=incrementing)--> Kafka topic (framed Avro)
  *   --(SMT chain)--> (Debezium JDBC sink: upsert)--> RDBMS
  *
  * with the engine's pieces in the same roles: `ConnectorConfig.pollSource`
  * (resumable offsets) → `KafkaEnvelope.wrap` → `AvroSerde.serializeFramed`
  * / `deserializeRegistry` (registry wire format + schema resolution) →
  * `Smt.*` → `JdbcBridge.applyCdcBatch` into embedded Derby — then a
  * second poll proves offset resume (only NEW rows flow), and read-back
  * equality proves the sink applied exactly the source rows. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("full connect pipeline: incremental poll -> framed Avro topic -> SMT -> live CDC sink -> resume") {
    val url = "jdbc:derby:memory:pipeline;create=true"
    val stateDir = tmpDir("pipeline_offsets")
    val cfg = ConnectorConfig.Config("pipe", Map(
      "table" -> "events", "mode" -> "incrementing",
      "incrementing.column.name" -> "event_id"))

    val valueCols = Seq("event_id", "user_id", "event_type", "value")
    val valueSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val writerJson = AvroSerde.avroSchemaFor(valueSchema)

    // one "connector cycle": poll → topic encode → topic decode → SMT → sink
    def runCycle(): Long = {
      val poll = ConnectorConfig.pollSource(spark, sf0001, cfg, stateDir)
      val batch = poll.batch.select(valueCols.map(col): _*)
      // produce: Kafka envelope with framed-Avro VALUE (the topic leg)
      val wire = AvroSerde.serializeFramed(batch, valueCols, schemaId = 7)
        .select(col("avro_value"))
      // consume: registry decode (writer selected by frame id) + SMT chain
      val decoded = AvroSerde.deserializeRegistry(wire, "avro_value",
          Map(7 -> writerJson), valueSchema, "v")
        .select(col("v.event_id").as("event_id"), col("v.user_id").as("user_id"),
          col("v.event_type").as("event_type"), col("v.value").as("value"))
        .transform(Smt.renameFields("value" -> "amount"))
        .transform(Smt.maskFields(None, "user_id"))
      val n = decoded.count()
      if (n > 0)
        JdbcBridge.applyCdcBatch(decoded, url, "events_t", Seq("event_id"),
          ord = Seq(lit(1)), isTombstone = lit(false))
      poll.commit()
      n
    }

    // seed the sink table with the post-SMT schema (PK on event_id)
    val sinkSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("amount", DoubleType)))
    JdbcBridge.createTable(url, "events_t", sinkSchema, Seq("event_id"))

    // cycle 1: everything flows
    val total = graft.sources.Tables.events(spark, sf0001).count()
    assert(runCycle() === total)

    // cycle 2: offsets resumed — nothing new, sink untouched
    assert(runCycle() === 0L)

    // read-back equality through the real JDBC source: every source row
    // arrived exactly once, SMT applied (value renamed, user_id masked)
    val back = JdbcBridge.read(spark, ConnectorConfig.Config("sink", Map(
      "connection.url" -> url, "table" -> "events_t",
      "partition.column" -> "event_id",
      "partition.lower.bound" -> "1",
      "partition.upper.bound" -> "100000", "tasks.max" -> "4")))
    assert(back.count() === total)
    assert(back.where($"user_id".isNotNull).count() === 0L) // masked
    val expect = graft.sources.Tables.events(spark, sf0001)
      .select($"event_id", $"value".as("amount"))
    val got = back.select($"event_id", $"amount")
    assert(got.join(expect, Seq("event_id", "amount"), "left_anti").count() === 0L)
    assert(expect.join(got, Seq("event_id", "amount"), "left_anti").count() === 0L)
  }

  test("ConnectorRunner: a properties-only pipeline — bounded polls drain into a live upsert sink") {
    import graft.sources.ConnectorRunner
    val url = "jdbc:derby:memory:runner;create=true"
    val stateDir = tmpDir("runner_offsets")
    // the ENTIRE pipeline as one Connect-style config: incremental
    // source bounded to 400 rows/poll, a 3-transform SMT chain, an
    // auto-created PK upsert sink — no code besides the properties
    val cfg = ConnectorConfig.Config("runner", ConnectorConfig.parseFlatJson("""{
      "table": "events", "mode": "incrementing",
      "incrementing.column.name": "event_id",
      "batch.max.rows": 400,
      "transforms": "trim,mask,tag",
      "transforms.trim.type": "org.apache.kafka.connect.transforms.ReplaceField$Value",
      "transforms.trim.exclude": "ts,props",
      "transforms.trim.renames": "value:amount",
      "transforms.mask.type": "org.apache.kafka.connect.transforms.MaskField$Value",
      "transforms.mask.fields": "user_id",
      "transforms.tag.type": "org.apache.kafka.connect.transforms.InsertField$Value",
      "transforms.tag.static.field": "pipeline",
      "transforms.tag.static.value": "r7",
      "connection.url": "jdbc:derby:memory:runner;create=true",
      "table.name.format": "events_r", "insert.mode": "upsert",
      "pk.fields": "event_id", "auto.create": "true"}"""))
    val total = graft.sources.Tables.events(spark, sf0001).count()
    // first bounded cycle delivers exactly the poll cap...
    assert(ConnectorRunner.runOnce(spark, sf0001, cfg, stateDir) === 400L)
    // ...drain finishes the backlog across further bounded polls
    assert(ConnectorRunner.drain(spark, sf0001, cfg, stateDir) === total - 400L)
    // drained: one more cycle delivers nothing
    assert(ConnectorRunner.runOnce(spark, sf0001, cfg, stateDir) === 0L)
    // read back through the real JDBC source: every row once, SMTs applied
    val back = JdbcBridge.read(spark, ConnectorConfig.Config("rb", Map(
      "connection.url" -> url, "table" -> "events_r")))
    assert(back.count() === total)
    assert(back.where($"user_id".isNotNull).count() === 0L)
    assert(back.where($"pipeline" === "r7").count() === total)
    val expect = graft.sources.Tables.events(spark, sf0001)
      .select($"event_id", $"value".as("amount"))
    val got = back.select($"event_id", $"amount")
    assert(got.join(expect, Seq("event_id", "amount"), "left_anti").count() === 0L)
    assert(expect.join(got, Seq("event_id", "amount"), "left_anti").count() === 0L)
    // redelivery idempotence (the upsert contract): wipe the offsets and
    // re-run — rows overwrite in place, the count stays exact
    val stateDir2 = tmpDir("runner_offsets2")
    assert(ConnectorRunner.runOnce(spark, sf0001, cfg, stateDir2) === 400L)
    assert(JdbcBridge.read(spark, ConnectorConfig.Config("rb2", Map(
      "connection.url" -> url, "table" -> "events_r"))).count() === total)
  }

  test("ConnectorRunner.drain: a Filter dropping every row still consumes the SOURCE") {
    import graft.sources.ConnectorRunner
    val stateDir = tmpDir("drain_filter")
    val outDir = tmpDir("drain_filter_out") + "/files"
    // every bounded poll survives the source but dies in the chain —
    // "drained" must mean the SOURCE is empty, not that one cycle
    // delivered nothing (the old delivered-count termination stopped
    // after the first all-filtered poll with backlog left behind)
    val cfg = ConnectorConfig.Config("fdrain", Map(
      "table" -> "events", "mode" -> "incrementing",
      "incrementing.column.name" -> "event_id", "batch.max.rows" -> "400",
      "transforms" -> "tag,f",
      "transforms.tag.type" -> "InsertField$Value",
      "transforms.tag.static.field" -> "topic",
      "transforms.tag.static.value" -> "ev",
      "transforms.f.type" -> "Filter",
      "transforms.f.predicate" -> "p",
      "predicates.p.type" -> "predicates.TopicNameMatches",
      "predicates.p.pattern" -> "ev",
      "sink.path" -> outDir))
    assert(ConnectorRunner.drain(spark, sf0001, cfg, stateDir) === 0L)
    // offsets really advanced past the filtered rows: an UNFILTERED
    // pass over the same state delivers nothing
    val unfiltered = ConnectorConfig.Config("fdrain2",
      cfg.settings - "transforms")
    assert(ConnectorRunner.runOnce(spark, sf0001, unfiltered, stateDir) === 0L)
  }

  test("ConnectorRunner: sink misconfiguration fails the FIRST cycle even when every row is filtered") {
    import graft.sources.ConnectorRunner
    // both sinks configured + a Filter dropping everything: the old
    // n>0-gated validation let this 'drain' silently and commit offsets
    // past the data (r7 ADVICE) — now the config fails before any poll
    val cfg = ConnectorConfig.Config("badsink", Map(
      "table" -> "events", "mode" -> "incrementing",
      "incrementing.column.name" -> "event_id",
      "transforms" -> "tag,f",
      "transforms.tag.type" -> "InsertField$Value",
      "transforms.tag.static.field" -> "topic",
      "transforms.tag.static.value" -> "ev",
      "transforms.f.type" -> "Filter",
      "transforms.f.predicate" -> "p",
      "predicates.p.type" -> "predicates.TopicNameMatches",
      "predicates.p.pattern" -> "no-such-topic",
      "connection.url" -> "jdbc:derby:memory:badsink;create=true",
      "table.name.format" -> "t",
      "sink.path" -> (tmpDir("badsink") + "/files")))
    val stateDir = tmpDir("badsink_offsets")
    val e = intercept[IllegalArgumentException] {
      ConnectorRunner.runOnce(spark, sf0001, cfg, stateDir)
    }
    assert(e.getMessage.contains("ONE sink"))
    // nothing was committed: a corrected config still sees the backlog
    val fixed = ConnectorConfig.Config("badsink2",
      cfg.settings - "connection.url" - "table.name.format" - "transforms")
    assert(ConnectorRunner.runOnce(spark, sf0001, fixed, stateDir) > 0L)
  }

  test("ConnectorRunner: errors.tolerance=all delivers clean rows and quarantines corrupt ones to the DLQ path") {
    import graft.sources.ConnectorRunner
    val base = tmpDir("tol_all")
    val outDir = base + "/out"; val dlqDir = base + "/dlq"
    // every 100th event's props payload is truncated JSON at the SOURCE
    // (query mode); the converter must split, not fail, not silently null
    val cfg = ConnectorConfig.Config("tol", Map(
      "query" -> ("SELECT event_id, CASE WHEN event_id % 100 = 0 " +
        "THEN '{\"k\": ' ELSE props END AS props FROM events"),
      "mode" -> "incrementing", "incrementing.column.name" -> "event_id",
      "batch.max.rows" -> "700",
      "value.converter" -> "json",
      "value.converter.column" -> "props",
      "value.converter.schema" -> "k INT",
      "errors.tolerance" -> "all",
      "errors.deadletter.path" -> dlqDir,
      "sink.path" -> outDir))
    val total = graft.sources.Tables.events(spark, sf0001).count()
    val corrupt = graft.sources.Tables.events(spark, sf0001)
      .where($"event_id" % 100 === 0).count()
    assert(ConnectorRunner.drain(spark, sf0001, cfg, base + "/state")
      === total - corrupt)
    // clean side: parsed field flattened to a top-level column, raw gone
    val out = spark.read.parquet(outDir)
    assert(out.columns.toSet === Set("event_id", "k"))
    assert(out.count() === total - corrupt)
    assert(out.where($"event_id" % 100 === 0).count() === 0L)
    // DLQ side: exactly the planted rows, raw payload preserved verbatim
    val dlq = spark.read.parquet(dlqDir)
    assert(dlq.count() === corrupt)
    assert(dlq.where($"raw" === "{\"k\": ").count() === corrupt)
    assert(dlq.select($"event_id").except(
      graft.sources.Tables.events(spark, sf0001)
        .where($"event_id" % 100 === 0).select($"event_id")).count() === 0L)
  }

  test("ConnectorRunner: errors.tolerance=none fails loudly BEFORE the offset commit") {
    import graft.sources.ConnectorRunner
    val base = tmpDir("tol_none")
    val cfg = ConnectorConfig.Config("strict", Map(
      "query" -> ("SELECT event_id, CASE WHEN event_id % 100 = 0 " +
        "THEN '{\"k\": ' ELSE props END AS props FROM events"),
      "mode" -> "incrementing", "incrementing.column.name" -> "event_id",
      "value.converter" -> "json",
      "value.converter.column" -> "props",
      "value.converter.schema" -> "k INT",
      "sink.path" -> (base + "/out")))
    val e = intercept[IllegalStateException] {
      ConnectorRunner.runOnce(spark, sf0001, cfg, base + "/state")
    }
    assert(e.getMessage.contains("errors.tolerance=none"))
    // the failed cycle committed nothing: switching the same state to
    // tolerance=all still sees the whole backlog
    val tolerant = ConnectorConfig.Config("strict2", cfg.settings
      + ("errors.tolerance" -> "all"))
    val total = graft.sources.Tables.events(spark, sf0001).count()
    val corrupt = graft.sources.Tables.events(spark, sf0001)
      .where($"event_id" % 100 === 0).count()
    assert(ConnectorRunner.runOnce(spark, sf0001, tolerant, base + "/state")
      === total - corrupt)
  }
}
