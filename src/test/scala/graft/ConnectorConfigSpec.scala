package graft

import graft.sources.ConnectorConfig
import java.sql.Timestamp

/** The reference's env-var connector contract (FIXTURES.md connector
  * fixtures; reference `main.sh:6-7`, `148-159`): parse CONNECTOR_NAMES +
  * flat-JSON configs, dispatch source modes onto the scan builders. */
class ConnectorConfigSpec extends SparkSpec {

  private val env = Map(
    "CONNECTOR_NAMES" -> "SRC SINK MISSING",
    "CONNECTOR_SRC" -> """{ "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
      "mode": "timestamp+incrementing", "timestamp.column.name": "ts",
      "incrementing.column.name": "event_id", "topic.prefix": "db.",
      "table": "events", "tasks.max": 4, "validate": true }""",
    "CONNECTOR_SINK" -> """{ "connector.class": "io.debezium.connector.jdbc.JdbcSinkConnector",
      "insert.mode": "upsert", "primary.key.mode": "record_key",
      "delete.enabled": "true" }""")

  test("fromEnv parses names + flat JSON; missing config skipped like the reference") {
    val cfgs = ConnectorConfig.fromEnv(env)
    assert(cfgs.map(_.name) === Seq("SRC", "SINK"))
    val src = cfgs.head
    assert(src("mode").contains("timestamp+incrementing"))
    assert(src("tasks.max").contains("4"))       // number stringified
    assert(src("validate").contains("true"))     // boolean stringified
  }

  test("parseFlatJson handles escapes and rejects malformed input") {
    assert(ConnectorConfig.parseFlatJson("""{"a": "x\"y", "b": "p\\q"}""")
      === Map("a" -> "x\"y", "b" -> "p\\q"))
    // \uXXXX decodes (backslash written escaped so scalac doesn't pre-process)
    assert(ConnectorConfig.parseFlatJson("{\"p\": \"p\\u0041ss\\u00e9\"}")
      === Map("p" -> "pAss\u00e9"))
    assert(ConnectorConfig.parseFlatJson("{}") === Map.empty)
    intercept[IllegalArgumentException](ConnectorConfig.parseFlatJson("""{"a" "b"}"""))
    intercept[IllegalArgumentException](ConnectorConfig.parseFlatJson("""not json"""))
    intercept[IllegalArgumentException](ConnectorConfig.parseFlatJson("{\"a\": \"\\uZZZZ\"}"))
    intercept[IllegalArgumentException](ConnectorConfig.parseFlatJson("{\"a\": \"\\x\"}"))
  }

  test("sourceScan errors name the connector and the missing key") {
    val cfg = ConnectorConfig.Config("c1", Map("table" -> "events", "mode" -> "incrementing"))
    val e = intercept[IllegalArgumentException](
      ConnectorConfig.sourceScan(spark, sf0001, cfg))
    assert(e.getMessage.contains("c1") && e.getMessage.contains("incrementing.column.name"))
  }

  test("sourceScan dispatches timestamp+incrementing mode with resume offsets") {
    val cfg = ConnectorConfig.fromEnv(env).head
    val df = ConnectorConfig.sourceScan(spark, sf0001, cfg,
      lastId = 100L, lastTs = Timestamp.valueOf("2024-01-10 00:00:00"))
    val manual = graft.sources.Tables.timestampIncrementingScan(
      graft.sources.Tables.events(spark, sf0001), "ts", "event_id",
      Timestamp.valueOf("2024-01-10 00:00:00"), 100L)
    assert(df.count() === manual.count())
    assert(df.count() > 0)
  }

  test("sourceScan query mode runs user SQL over the registered tables") {
    val cfg = ConnectorConfig.Config("q", Map(
      "query" -> "SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'F'"))
    val n = ConnectorConfig.sourceScan(spark, sf0001, cfg).collect().head.getLong(0)
    assert(n > 0)
  }

  test("jdbcOptions maps the Connect source config onto spark.read.jdbc options") {
    val cfg = ConnectorConfig.Config("src", Map(
      "connection.url" -> "jdbc:postgresql://db:5432/app",
      "connection.user" -> "svc", "connection.password" -> "pw",
      "table.whitelist" -> "events",
      "incrementing.column.name" -> "event_id",
      "partition.lower.bound" -> "0", "partition.upper.bound" -> "1000000",
      "tasks.max" -> "4", "batch.max.rows" -> "5000"))
    val opts = ConnectorConfig.jdbcOptions(cfg)
    assert(opts("url") === "jdbc:postgresql://db:5432/app")
    assert(opts("dbtable") === "events")
    assert(opts("user") === "svc" && opts("password") === "pw")
    assert(opts("fetchsize") === "5000")
    // tasks.max parallelism → partitioned range scan
    assert(opts("partitionColumn") === "event_id")
    assert(opts("lowerBound") === "0" && opts("upperBound") === "1000000")
    assert(opts("numPartitions") === "4")
  }

  test("jdbcOptions: query wins over table; partial partition spec and missing url fail loudly") {
    val q = ConnectorConfig.Config("q", Map(
      "connection.url" -> "jdbc:h2:mem:x", "table" -> "ignored",
      "query" -> "SELECT 1 AS one"))
    val opts = ConnectorConfig.jdbcOptions(q)
    assert(opts("query") === "SELECT 1 AS one" && !opts.contains("dbtable"))
    assert(!opts.contains("partitionColumn")) // unpartitioned: no bounds given
    val partial = ConnectorConfig.Config("p", Map(
      "connection.url" -> "jdbc:h2:mem:x", "table" -> "t",
      "partition.column" -> "id", "partition.lower.bound" -> "0"))
    val e = intercept[IllegalArgumentException](ConnectorConfig.jdbcOptions(partial))
    assert(e.getMessage.contains("both bounds"))
    val noUrl = ConnectorConfig.Config("n", Map("table" -> "t"))
    val e2 = intercept[IllegalArgumentException](ConnectorConfig.jdbcOptions(noUrl))
    assert(e2.getMessage.contains("connection.url"))
  }

  test("parseFlatJson rejects nested objects and trailing garbage (flat-only contract)") {
    // scalar() used to stop at the inner '}' and silently return a
    // mangled map for both of these
    intercept[IllegalArgumentException](
      ConnectorConfig.parseFlatJson("""{"a": {"x": 1}}"""))
    intercept[IllegalArgumentException](
      ConnectorConfig.parseFlatJson("""{"a": "b"}garbage"""))
    intercept[IllegalArgumentException](ConnectorConfig.parseFlatJson("""{}{"a":"b"}"""))
  }

  test("multi-table whitelist fails loudly everywhere (one config = one scan)") {
    val cfg = ConnectorConfig.Config("m", Map(
      "connection.url" -> "jdbc:h2:mem:x", "table.whitelist" -> "events,orders"))
    val e1 = intercept[IllegalArgumentException](
      ConnectorConfig.sourceScan(spark, sf0001, cfg))
    assert(e1.getMessage.contains("one config per table"))
    val e2 = intercept[IllegalArgumentException](ConnectorConfig.jdbcOptions(cfg))
    assert(e2.getMessage.contains("one config per table"))
  }

  test("query + incrementing polls the query frame (Confluent query-mode incremental)") {
    val state = tmpDir("qpoll")
    // the standard Confluent shape: query-mode incremental has NO table key
    val cfg = ConnectorConfig.Config("qi", Map(
      "mode" -> "incrementing",
      "query" -> "SELECT event_id, value FROM events WHERE event_type = 'click'",
      "incrementing.column.name" -> "event_id"))
    val p1 = ConnectorConfig.pollSource(spark, sf0001, cfg, state)
    val n = p1.batch.count(); assert(n > 0); p1.commit()
    val p2 = ConnectorConfig.pollSource(spark, sf0001, cfg, state)
    assert(p2.batch.isEmpty)
    // sourceScan applies the mode over the query too
    val scanned = ConnectorConfig.sourceScan(spark, sf0001, cfg, lastId = Long.MaxValue)
    assert(scanned.isEmpty)
  }

  test("explicit partition.column without bounds fails instead of silently unpartitioned") {
    val cfg = ConnectorConfig.Config("p", Map(
      "connection.url" -> "jdbc:h2:mem:x", "table" -> "t",
      "partition.column" -> "id", "tasks.max" -> "16"))
    val e = intercept[IllegalArgumentException](ConnectorConfig.jdbcOptions(cfg))
    assert(e.getMessage.contains("both bounds"))
    // the implicit incrementing-column default without bounds stays fine
    val implicitCol = ConnectorConfig.Config("i", Map(
      "connection.url" -> "jdbc:h2:mem:x", "table" -> "t",
      "incrementing.column.name" -> "id"))
    assert(!ConnectorConfig.jdbcOptions(implicitCol).contains("partitionColumn"))
  }

  test("kafka sourceOptions: any ssl material forces SSL protocol; store passwords carried") {
    import graft.sources.KafkaEnvelope
    // keystore-only (JVM default truststore) must still speak SSL
    val ks = KafkaEnvelope.sourceOptions("b:9092", Seq("t"),
      sslKeystore = Some("/ks.p12"), sslKeystorePassword = Some("kp"),
      sslKeyPassword = Some("pk"))
    assert(ks("kafka.security.protocol") === "SSL")
    assert(ks("kafka.ssl.keystore.location") === "/ks.p12")
    assert(ks("kafka.ssl.keystore.password") === "kp")
    assert(ks("kafka.ssl.key.password") === "pk")
    val ts = KafkaEnvelope.sourceOptions("b:9092", Seq("t"),
      sslTruststore = Some("/ts.jks"), sslTruststorePassword = Some("tp"))
    assert(ts("kafka.security.protocol") === "SSL")
    assert(ts("kafka.ssl.truststore.password") === "tp")
    // no ssl material → plaintext, no ssl keys at all
    val plain = KafkaEnvelope.sourceOptions("b:9092", Seq("t"))
    assert(!plain.contains("kafka.security.protocol"))
    assert(!plain.keys.exists(_.contains("ssl")))
  }

  test("kafka live-broker boundary: the classpath has no kafka artifacts — envelope stand-in is the test edge") {
    import graft.sources.KafkaEnvelope
    // This environment ships neither kafka-clients nor the
    // spark-sql-kafka connector (zero-egress, /opt/spark/jars has no
    // kafka jar), so an embedded-loopback-broker integration test of
    // readStream.format("kafka") is impossible HERE by construction —
    // not a code gap. This test pins that boundary: if a kafka client
    // ever appears on the classpath, the first assertion fails loudly
    // as the signal to replace the envelope stand-in with a live
    // single-broker test through sourceOptions -> SMT -> sink.
    val kafkaOnClasspath =
      try { Class.forName("org.apache.kafka.clients.consumer.KafkaConsumer"); true }
      catch { case _: ClassNotFoundException => false }
    assert(!kafkaOnClasspath,
      "kafka-clients is now on the classpath: write the live embedded-broker " +
        "test for S5 (sourceOptions end-to-end) and retire this boundary pin")
    // and the format itself is absent, so the option map (already
    // contract-tested above) is the deepest reachable layer: Spark
    // cannot even resolve the 'kafka' source without the connector jar
    val e = intercept[Exception] {
      spark.readStream.format("kafka")
        .options(KafkaEnvelope.sourceOptions("localhost:9092", Seq("t")))
        .load()
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected a missing-kafka-source failure, got: ${e.getMessage}")
  }

  test("pollSource dispatches config modes onto the resumable offset-backed polls") {
    import graft.sources.IncrementalSource
    val state = tmpDir("cfgpoll")
    val cfg = ConnectorConfig.Config("src", Map(
      "mode" -> "incrementing", "table" -> "events",
      "incrementing.column.name" -> "event_id"))
    val p1 = ConnectorConfig.pollSource(spark, sf0001, cfg, state)
    val n = p1.batch.count(); assert(n > 0); p1.commit()
    val p2 = ConnectorConfig.pollSource(spark, sf0001, cfg, state)
    assert(p2.batch.isEmpty) // nothing new since the committed offset
    // bulk mode: full scan, no state advanced
    val bulk = ConnectorConfig.Config("b", Map("table" -> "events"))
    assert(ConnectorConfig.pollSource(spark, sf0001, bulk, state).batch.count() === n)
  }

  test("queryScan: a table name inside a string literal is not registered (no view clobber)") {
    import graft.sources.Tables
    spark.range(3).toDF("user_col").createOrReplaceTempView("customer")
    try {
      // 'customer' appears only inside the literal — the user's temp view
      // must NOT be clobbered by a parquet registration
      val out = Tables.queryScan(spark, sf0001,
        "SELECT o_orderkey FROM orders WHERE o_orderpriority LIKE '%customer%'")
      assert(out.columns === Array("o_orderkey"))
      assert(spark.table("customer").columns === Array("user_col"))
    } finally spark.catalog.dropTempView("customer")
  }

  test("queryScan: an apostrophe inside a -- comment does not swallow a table reference") {
    import graft.sources.Tables
    // the old regex pipeline blanked literals BEFORE comments, so the
    // apostrophe in "don't" opened a phantom literal that swallowed
    // everything up to the quote in the WHERE clause — including the
    // `orders` reference — leaving the view unregistered
    val out = Tables.queryScan(spark, sf0001,
      """SELECT o_orderkey -- don't prune this table
        |FROM orders WHERE o_orderpriority <> 'x''y'""".stripMargin)
    assert(out.count() > 0)
    // and the scanner handles block comments + '' escapes in one pass:
    // "customer" appears only in comments/literals → must NOT register
    spark.range(3).toDF("user_col").createOrReplaceTempView("customer")
    try {
      val out2 = Tables.queryScan(spark, sf0001,
        "SELECT o_orderkey FROM orders /* customer */ WHERE o_orderpriority <> 'it''s customer'")
      assert(out2.count() > 0)
      assert(spark.table("customer").columns === Array("user_col"))
    } finally spark.catalog.dropTempView("customer")
  }

  test("queryScan: NESTED block comments strip fully (Spark SQL accepts them)") {
    import graft.sources.Tables
    // Spark parses `/* /* */ customer */` as one nested comment; a
    // depth-blind scanner closes at the first `*/` and leaves `customer`
    // visible — re-clobbering the user view the scanner exists to protect
    spark.range(3).toDF("user_col").createOrReplaceTempView("customer")
    try {
      val out = Tables.queryScan(spark, sf0001,
        "SELECT o_orderkey FROM orders /* outer /* inner */ customer */ WHERE o_orderkey > 0")
      assert(out.count() > 0)
      assert(spark.table("customer").columns === Array("user_col"))
    } finally spark.catalog.dropTempView("customer")
  }
}
