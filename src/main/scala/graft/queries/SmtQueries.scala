package graft.queries

import graft.operators.Smt
import graft.sources.{AvroSerde, KafkaEnvelope, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-checked queries for the SMT catalog (SURVEY §2.2 P1-P14) plus
  * the serde edges they ride on (S5 envelope stand-in, S6/S7 Avro, S8
  * schemaless JSON). Every query routes `events` through
  * `KafkaEnvelope.wrap` → JSON unwrap, so the per-record transforms are
  * exercised against the real Kafka record shape, exactly like a Connect
  * SMT chain between converter and sink (reference `Dockerfile:4`,
  * `main.sh:72-81`).
  *
  * Envelope fields whose values depend on Spark's internal hash
  * (partition, offset) never appear in oracle-compared output columns —
  * their invariants are checked by `s05_envelope` instead.
  */
object SmtQueries {
  import QU._

  /** Payload schema of the wrapped `events` row (FIXTURES.md). */
  private val payloadSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** events → Kafka envelope → structured payload (the converter step). */
  private def unwrapped(s: SparkSession, d: String): DataFrame =
    KafkaEnvelope.unwrapJson(
      KafkaEnvelope.wrap(Tables.events(s, d), "user_id", "ts", "events"),
      payloadSchema)

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // ---- P1: project ----
    ("p01_project", (s, d) => {
      unwrapped(s, d)
        .transform(Smt.project("event_id", "event_type"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, event_type FROM events ORDER BY event_id""")),

    // ---- P2: Filter SMT with predicate ----
    ("p02_filter", (s, d) => {
      unwrapped(s, d)
        .transform(Smt.filterRecords(Smt.hasHeaderKey("headers", "origin") &&
          col("event_type") === "click" && col("value") > 100.0))
        .select(col("event_id"), col("value"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, value FROM events WHERE event_type = 'click' AND value > 100.0 ORDER BY event_id""")),

    // ---- P3: Cast (decimal round-trip is exact; int cast is identical
    // in both engines for in-range longs) ----
    ("p03_cast", (s, d) => {
      unwrapped(s, d)
        .transform(Smt.castFields("value" -> DecimalType(18, 2), "user_id" -> StringType))
        .transform(Smt.castFields("value" -> DoubleType))
        .select(col("event_id"), col("value"), col("user_id"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value, CAST(user_id AS VARCHAR) AS user_id FROM events ORDER BY event_id""")),

    // ---- P4 + P13: ValueToKey then ExtractField ----
    ("p04_extract_key", (s, d) => {
      unwrapped(s, d)
        .transform(Smt.valueToKey("rec_key", "user_id", "event_type"))
        .transform(Smt.extractField("rec_key", "user_id", "uid"))
        .select(col("event_id"), col("uid"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, user_id AS uid FROM events ORDER BY event_id""")),

    // ---- P5 + P6: HoistField into a struct, then Flatten back out ----
    ("p05_flatten_hoist", (s, d) => {
      unwrapped(s, d)
        .transform(Smt.hoistField("nested", "event_type", "value"))
        .transform(Smt.flatten("_"))
        .select(col("event_id"), col("nested_event_type"), col("nested_value"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, event_type AS nested_event_type, value AS nested_value FROM events ORDER BY event_id""")),

    // ---- P7: InsertField (static + envelope metadata) ----
    ("p07_insert", (s, d) => {
      unwrapped(s, d)
        .transform(Smt.insertField("src", lit("graft")))
        .select(col("event_id"), col("src"), col("topic"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, 'graft' AS src, 'events' AS topic FROM events ORDER BY event_id""")),

    // ---- P8: MaskField (null out one field, fixed literal another) ----
    ("p08_mask", (s, d) => {
      unwrapped(s, d)
        .transform(Smt.maskFields(None, "user_id"))
        .transform(Smt.maskFields(Some(lit("***")), "props"))
        .select(col("event_id"), col("user_id"), col("props"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, CAST(NULL AS BIGINT) AS user_id, '***' AS props FROM events ORDER BY event_id""")),

    // ---- P9: ReplaceField — rename, drop, allowlist ----
    ("p09_replace", (s, d) => {
      unwrapped(s, d)
        .transform(Smt.renameFields("value" -> "amount"))
        .transform(Smt.dropFields("props"))
        .transform(Smt.allowlistFields("event_id", "amount", "event_type"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, value AS amount, event_type FROM events ORDER BY event_id""")),

    // ---- P10: RegexRouter with a capture group ----
    ("p10_route_regex", (s, d) => {
      unwrapped(s, d)
        .transform(Smt.insertField("route", concat(col("topic"), lit("-"), col("event_type"))))
        .transform(Smt.regexRoute("route", "^events-(click|view)$", "web-$1"))
        .groupBy(col("route")).agg(count(lit(1)).as("n"))
        .orderBy(col("route"))
    }, Some("""SELECT regexp_replace('events-' || event_type, '^events-(click|view)$', 'web-\1') AS route, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY route""")),

    // ---- P11: TimestampRouter (route suffix from record timestamp) ----
    ("p11_route_ts", (s, d) => {
      KafkaEnvelope.wrap(Tables.events(s, d), "user_id", "ts", "events")
        .transform(Smt.timestampRoute("topic", "timestamp", "yyyy-MM-dd", "route"))
        .groupBy(col("route")).agg(count(lit(1)).as("n"))
        .orderBy(col("route"))
    }, Some("""SELECT 'events-' || strftime(ts, '%Y-%m-%d') AS route, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY route""")),

    // ---- P12: TimestampConverter — ts→unix, unix→ts, ts→string ----
    ("p12_ts_convert", (s, d) => {
      KafkaEnvelope.wrap(Tables.events(s, d), "user_id", "ts", "events")
        .transform(Smt.insertField("unix_s", Smt.timestampToUnix(col("timestamp"))))
        .transform(Smt.insertField("ts_rt_us", micros(Smt.unixToTimestamp(col("unix_s")))))
        .transform(Smt.insertField("ts_str", Smt.timestampToString(col("timestamp"), "yyyy-MM-dd HH")))
        .select(col("key").cast(StringType).cast(LongType).as("user_id"),
          col("unix_s"), col("ts_rt_us"), col("ts_str"))
        .groupBy(col("user_id")).agg(sum(col("unix_s")).as("sum_unix"),
          sum(col("ts_rt_us")).as("sum_rt_us"), countDistinct(col("ts_str")).as("n_hours"))
        .orderBy(col("user_id"))
    // NOTE: DuckDB SUM(BIGINT) returns HUGEINT, which the driver's pandas
    // compare renders as float64 while Spark emits exact int64 — equal
    // values, different hashes. CAST both sums back to BIGINT (SURVEY §5).
    }, Some("""SELECT user_id, CAST(SUM(epoch_us(ts) // 1000000) AS BIGINT) AS sum_unix, CAST(SUM((epoch_us(ts) // 1000000) * 1000000) AS BIGINT) AS sum_rt_us, COUNT(DISTINCT strftime(ts, '%Y-%m-%d %H')) AS n_hours FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- P14: header ops — insert, extract back, drop ----
    ("p14_headers", (s, d) => {
      unwrapped(s, d)
        .transform(Smt.insertHeader("headers", "route", col("topic").cast(BinaryType)))
        .transform(Smt.headerFrom("headers", "route", "route_hdr"))
        .transform(Smt.dropHeaders("headers", "origin"))
        .select(col("event_id"), col("route_hdr").cast(StringType).as("route"),
          size(col("headers")).as("n_headers"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, 'events' AS route, 1 AS n_headers FROM events ORDER BY event_id""")),

    // ---- P15: CONFIG-DRIVEN chain — the reference's actual user
    // surface: a Connect properties block (flat JSON, the exact
    // main.sh:148-159 submission shape) parsed by ConnectorConfig +
    // SmtChain into the same composable transforms the p01-p14 queries
    // hand-write. Route → insert → mask → cast → drop/rename, all from
    // config, oracle-checked end to end. ----
    ("p15_config_chain", (s, d) => {
      val cfgJson = """{
        "transforms": "route,tag,mask,cast,trim",
        "transforms.route.type": "org.apache.kafka.connect.transforms.RegexRouter",
        "transforms.route.regex": "(.*)",
        "transforms.route.replacement": "$1-out",
        "transforms.tag.type": "org.apache.kafka.connect.transforms.InsertField$Value",
        "transforms.tag.static.field": "pipeline",
        "transforms.tag.static.value": "v1",
        "transforms.mask.type": "org.apache.kafka.connect.transforms.MaskField$Value",
        "transforms.mask.fields": "props",
        "transforms.cast.type": "org.apache.kafka.connect.transforms.Cast$Value",
        "transforms.cast.spec": "user_id:string",
        "transforms.trim.type": "org.apache.kafka.connect.transforms.ReplaceField$Value",
        "transforms.trim.exclude": "ts",
        "transforms.trim.renames": "value:amount"}"""
      val cfg = graft.sources.ConnectorConfig.Config("p15",
        graft.sources.ConnectorConfig.parseFlatJson(cfgJson))
      unwrapped(s, d)
        .transform(graft.operators.SmtChain.fromConfig(cfg))
        .select(col("event_id"), col("topic"), col("pipeline"), col("props"),
          col("user_id"), col("amount"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, 'events-out' AS topic, 'v1' AS pipeline, CAST(NULL AS VARCHAR) AS props, CAST(user_id AS VARCHAR) AS user_id, value AS amount FROM events ORDER BY event_id""")),

    // ---- S5: envelope invariants (partition/offset are hash-dependent,
    // so assert their structure, not their values): offsets are dense
    // 0..n-1 within each partition and every key maps to exactly one
    // partition — the Kafka contract the stand-in must honor. ----
    ("s05_envelope", (s, d) => {
      val env = KafkaEnvelope.wrap(Tables.events(s, d), "user_id", "ts", "events")
      val perPart = env.groupBy(col("partition"))
        .agg(count(lit(1)).as("n"), max(col("offset")).as("max_off"),
          countDistinct(col("offset")).as("n_off"))
        .agg(sum(col("n")).as("n_rows"),
          min(col("max_off") === col("n") - 1 && col("n_off") === col("n")).as("offsets_dense"))
      val keyPart = env.select(col("key").cast(StringType).as("k"), col("partition"))
        .groupBy(col("k")).agg(countDistinct(col("partition")).as("np"))
        .agg(max(col("np")).as("max_parts_per_key"))
      perPart.crossJoin(keyPart)
    }, Some("""SELECT COUNT(*) AS n_rows, true AS offsets_dense, 1 AS max_parts_per_key FROM events""")),

    // ---- S6/S7: Avro serialize→deserialize round-trip on a nested
    // struct (sibling structs exercise the schema-name derivation;
    // ts exercises the timestamp-micros logical type) ----
    ("s06_avro_roundtrip", (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"), col("ts"),
          struct(col("user_id"), col("props")).as("who"),
          struct(col("value").as("v2")).as("extra"))
      val ser = AvroSerde.serialize(ev, Seq("event_id", "event_type", "value", "ts", "who", "extra"))
      val de = AvroSerde.deserialize(ser, "avro_value",
        ev.schema, "rt")
      de.select(col("rt.event_id").as("event_id"), col("rt.event_type").as("event_type"),
          col("rt.value").as("value"), micros(col("rt.ts")).as("ts_us"),
          col("rt.who.user_id").as("user_id"),
          col("rt.who.props").as("props"), col("rt.extra.v2").as("v2"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, event_type, value, epoch_us(ts) AS ts_us, user_id, props, value AS v2 FROM events ORDER BY event_id""")),

    // ---- S6b: Confluent wire-format framing — the registry converter's
    // [0x00][schema id][avro] header (reference main.sh:72-75) survives a
    // produce/consume round-trip; header validated + stripped on decode ----
    ("s06b_avro_framed", (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"), col("ts"))
      val ser = AvroSerde.serializeFramed(ev, ev.columns.toSeq, schemaId = 1001)
      val de = AvroSerde.deserializeFramed(ser, "avro_value", ev.schema, "rt",
        expectedSchemaId = Some(1001))
      de.select(col("rt.event_id").as("event_id"), col("rt.event_type").as("event_type"),
          col("rt.value").as("value"), micros(col("rt.ts")).as("ts_us"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, event_type, value, epoch_us(ts) AS ts_us FROM events ORDER BY event_id""")),

    // ---- S6c: schema EVOLUTION — a topic mid-migration carries v1 and
    // v2 frames interleaved; one registry-style pass resolves each record
    // by its frame id against the one v3 reader: v1 (even ids) wrote
    // (event_id, user_id AS INT, event_type, props) — props is dropped by
    // the reader, user_id promotes int→long; v2 (odd ids) added value;
    // the reader's tag field was never written → defaults null. The
    // standard Avro resolution behaviors of the registry converters the
    // reference wires (main.sh:72-75). ----
    ("s06c_avro_evolution", (s, d) => {
      val ev = Tables.events(s, d)
      // user_id is bounded (% 2e9) BEFORE the int cast: with ANSI off an
      // out-of-range id would silently wrap in the v1 writer and diverge
      // from the oracle; the mod keeps the cast provably lossless for any
      // fixture, and the oracle applies the same mod
      val v1 = ev.where(col("event_id") % 2 === 0)
        .select(col("event_id"),
          (col("user_id") % 2000000000L).cast(IntegerType).as("user_id"),
          col("event_type"), col("props"))
      val v2 = ev.where(col("event_id") % 2 =!= 0)
        .select(col("event_id"), (col("user_id") % 2000000000L).as("user_id"),
          col("event_type"), col("value"))
      val wire = AvroSerde.serializeFramed(v1, v1.columns.toSeq, schemaId = 1)
        .select(col("avro_value"))
        .unionByName(AvroSerde.serializeFramed(v2, v2.columns.toSeq, schemaId = 2)
          .select(col("avro_value")))
      val readerStruct = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType),
        StructField("tag", StringType)))
      AvroSerde.deserializeRegistry(wire, "avro_value",
          Map(1 -> AvroSerde.avroSchemaFor(v1.schema), 2 -> AvroSerde.avroSchemaFor(v2.schema)),
          readerStruct, "rt")
        .select(col("rt.event_id").as("event_id"), col("rt.user_id").as("user_id"),
          col("rt.event_type").as("event_type"), col("rt.value").as("value"),
          col("rt.tag").as("tag"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, user_id % 2000000000 AS user_id, event_type, CASE WHEN event_id % 2 <> 0 THEN value END AS value, CAST(NULL AS VARCHAR) AS tag FROM events ORDER BY event_id""")),

    // ---- S7b: Avro-framed record KEYS (the reference's key converter,
    // main.sh:72): key = framed Avro struct of the key columns; decode
    // recovers the exact key fields for every record ----
    ("s07b_avro_key", (s, d) => {
      val env = KafkaEnvelope.wrapAvroKey(Tables.events(s, d),
        Seq("user_id", "event_type"), "ts", "events", keySchemaId = 1)
      val keySchema = StructType(Seq(
        StructField("user_id", LongType), StructField("event_type", StringType)))
      KafkaEnvelope.unwrapAvroKey(env, keySchema, "k", expectedSchemaId = Some(1))
        .groupBy(col("k.user_id").as("user_id"), col("k.event_type").as("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("user_id"), col("event_type"))
    }, Some("""SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""")),

    // ---- S16: errors.tolerance=all — clean side: planted malformed
    // props rows (every 100th event) are quarantined, the rest parse
    // and match DuckDB row-for-row ----
    ("s16_tolerant_clean", (s, d) => {
      val ev = Tables.events(s, d).withColumn("props",
        when(col("event_id") % 100 === 0, lit("""{"k": """)).otherwise(col("props")))
      val parsed = graft.sources.ErrorTolerance.tolerantJson(
        ev, "props", StructType.fromDDL("k INT"), "p")
      graft.sources.ErrorTolerance.clean(parsed, "p")
        .select(col("event_id"), col("p.k").as("k"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events WHERE event_id % 100 <> 0 ORDER BY event_id""")),

    // ---- S16b: errors.tolerance=all — DLQ side: exactly the planted
    // rows, carrying their raw payload for replay ----
    ("s16b_tolerant_quarantine", (s, d) => {
      val ev = Tables.events(s, d).withColumn("props",
        when(col("event_id") % 100 === 0, lit("""{"k": """)).otherwise(col("props")))
      val parsed = graft.sources.ErrorTolerance.tolerantJson(
        ev, "props", StructType.fromDDL("k INT"), "p")
      graft.sources.ErrorTolerance.quarantine(parsed, "p")
        .select(col("event_id"), col("raw"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, '{"k": ' AS raw FROM events WHERE event_id % 100 = 0 ORDER BY event_id""")),

    // ---- S16c: errors.tolerance=all through the PROPERTIES-DRIVEN
    // runner — one Connect config (query source with planted corrupt
    // payloads, json value converter, tolerance=all + DLQ path, file
    // sink) drains end-to-end; the sink output is the oracle-checked
    // clean side ----
    ("s16c_runner_tolerant", (s, d) => {
      import graft.sources.{ConnectorConfig, ConnectorRunner}
      val base = java.nio.file.Files.createTempDirectory("s16c").toString
      val out = base + "/out"
      val cfg = ConnectorConfig.Config("s16c", Map(
        "query" -> ("SELECT event_id, CASE WHEN event_id % 100 = 0 " +
          "THEN '{\"k\": ' ELSE props END AS props FROM events"),
        "mode" -> "incrementing", "incrementing.column.name" -> "event_id",
        "value.converter" -> "json",
        "value.converter.column" -> "props",
        "value.converter.schema" -> "k INT",
        "errors.tolerance" -> "all",
        "errors.deadletter.path" -> (base + "/dlq"),
        "sink.path" -> out))
      ConnectorRunner.drain(s, d, cfg, base + "/state")
      s.read.parquet(out).select(col("event_id"), col("k"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events WHERE event_id % 100 <> 0 ORDER BY event_id""")),

    // ---- S8: schemaless JSON value decode (the Connect JsonConverter
    // path) — unwrap carries every payload field through the envelope ----
    ("s08_json_roundtrip", (s, d) => {
      unwrapped(s, d)
        .select(col("event_id"), micros(col("ts")).as("ts_us"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props FROM events ORDER BY event_id""")),

    // ---- S8b: schema-carrying JSON roundtrip (JsonConverter
    // schemas.enable=true — `{"schema":{...},"payload":{...}}` with the
    // Connect Timestamp logical type, epoch-MILLIS by definition, hence
    // the ts_ms comparison). schema_ok pins that the embedded schema
    // name survived the wire ----
    ("s08b_json_schema_roundtrip", (s, d) => {
      import graft.sources.JsonSchemaSerde
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
      val ev = Tables.events(s, d).select(cols.map(col): _*)
      val enc = JsonSchemaSerde.serialize(ev, cols, "events.Value", "wire")
        .select(col("wire"))
      val dec = JsonSchemaSerde.deserialize(enc, "wire",
        StructType(cols.map(c => ev.schema(c))), "p", "schema_name")
      dec.select(col("p.event_id").as("event_id"),
          unix_millis(col("p.ts")).as("ts_ms"),
          col("p.user_id").as("user_id"),
          col("p.event_type").as("event_type"),
          col("p.value").as("value"),
          col("p.props").as("props"),
          (col("schema_name") === "events.Value").as("schema_ok"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value, props, true AS schema_ok FROM events ORDER BY event_id""")),

    // ---- S9/S10/S11/S17: the LIVE JDBC round-trip — the reference's
    // core dataflow against a real database (embedded Derby, in-JVM).
    // Seed the table from parquet, apply a Debezium-style change batch
    // (upserts: +1000 on every 10th account, inserts: every 17th key
    // re-keyed +1e6; tombstones: every 100th key deleted), then read the
    // final table back through spark.read.format("jdbc") with the
    // partitioned range scan built by ConnectorConfig.jdbcOptions from
    // the Connect config contract (partition.column + bounds + tasks.max
    // → 4 parallel bounded-range queries). The oracle reproduces the
    // final table state from parquet alone. ----
    ("s09_jdbc_live", (s, d) => {
      import graft.sources.{ConnectorConfig, JdbcBridge}
      val url = "jdbc:derby:memory:graft_s09;create=true"
      val base = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
      JdbcBridge.overwrite(base, url, "customer_t", keyCols = Seq("c_custkey"))
      val changes = base.where(col("c_custkey") % 10 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
        .unionByName(base.where(col("c_custkey") % 17 === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000000L))
      JdbcBridge.upsert(changes, url, "customer_t", Seq("c_custkey"))
      JdbcBridge.deleteKeys(base.where(col("c_custkey") % 100 === 0),
        url, "customer_t", Seq("c_custkey"))
      val cfg = ConnectorConfig.Config("s09", Map(
        "connection.url" -> url,
        "connection.driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
        "table" -> "customer_t",
        "partition.column" -> "c_custkey",
        "partition.lower.bound" -> "1",
        "partition.upper.bound" -> "2000000000",
        "tasks.max" -> "4"))
      JdbcBridge.read(s, cfg).orderBy(col("c_custkey"))
    }, Some("""WITH base AS (SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer), final AS (SELECT c_custkey, c_name, c_nationkey, CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 1000.0 ELSE c_acctbal END AS c_acctbal FROM base WHERE c_custkey % 100 <> 0 UNION ALL SELECT c_custkey + 1000000000 AS c_custkey, c_name, c_nationkey, c_acctbal FROM base WHERE c_custkey % 17 = 0) SELECT * FROM final ORDER BY c_custkey"""))
  )
}
