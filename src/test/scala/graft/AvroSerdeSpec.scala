package graft

import graft.sources.AvroSerde
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, countDistinct, max}
import org.apache.spark.sql.types._
/** S6/S7 round-trip contract: deserialize(serialize(df)) == df for
  * primitives, arrays, maps, nested structs — including SIBLING nested
  * structs, the shape that used to collide in Avro's record namespace. */
class AvroSerdeSpec extends SparkSpec {
  import spark.implicits._

  test("round-trips primitives, arrays and maps") {
    val df = Seq(
      (1L, "a", 1.5, Seq(1, 2, 3), Map("x" -> 1L)),
      (2L, null.asInstanceOf[String], -0.25, Seq.empty[Int], Map.empty[String, Long])
    ).toDF("id", "s", "d", "arr", "m")
    val rt = AvroSerde.deserialize(
      AvroSerde.serialize(df, df.columns.toSeq), "avro_value", df.schema, "rt")
    val back = rt.select($"rt.id", $"rt.s", $"rt.d", $"rt.arr", $"rt.m")
    assert(back.collect().toSet === df.collect().toSet)
  }

  test("round-trips sibling nested structs (regression: name collision)") {
    val df = Seq((1L, ("u1", 7L), ("t1", 2.0)))
      .toDF("id", "who", "what")
    val rt = AvroSerde.deserialize(
      AvroSerde.serialize(df, df.columns.toSeq), "avro_value", df.schema, "rt")
    val back = rt.select($"rt.id", $"rt.who", $"rt.what")
    assert(back.collect().toSeq === df.collect().toSeq)
  }

  test("schema derivation names sibling records uniquely") {
    val st = StructType(Seq(
      StructField("a", StructType(Seq(StructField("x", LongType)))),
      StructField("b", StructType(Seq(StructField("y", StringType))))))
    // must parse — two sibling records with colliding names would throw
    val parsed = new org.apache.avro.Schema.Parser().parse(AvroSerde.avroSchemaFor(st))
    assert(parsed.getFields.size === 2)
  }

  test("round-trips NULL array elements and NULL map values") {
    // Spark collections default to containsNull/valueContainsNull=true;
    // a bare (non-union) item schema NPEs inside the datum writer on the
    // first null element
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, null, 3L), Map("a" -> "x", "b" -> null)),
      (2L, Seq[java.lang.Long](null), Map.empty[String, String])
    ).toDF("id", "arr", "m")
    val rt = AvroSerde.deserialize(
      AvroSerde.serialize(df, df.columns.toSeq), "avro_value", df.schema, "rt")
    assert(rt.select($"rt.id", $"rt.arr", $"rt.m").collect().toSet
      === df.collect().toSet)
  }

  test("colliding sanitized names and suffix-vs-literal clashes stay unique") {
    // "a.b" and "a-b" both sanitize to a_b; the literal "a_b_1" collides
    // with the first dedup suffix — every probe must land on a free name
    val df = Seq((1L, 2L, 3L)).toDF("a.b", "a-b", "a_b_1")
    val parsed = new org.apache.avro.Schema.Parser().parse(
      AvroSerde.avroSchemaFor(StructType(df.schema.fields)))
    assert(parsed.getFields.size === 3)
    val rt = AvroSerde.deserialize(
      AvroSerde.serialize(df, df.columns.toSeq), "avro_value",
      StructType(df.schema.fields), "rt")
    assert(rt.select(col("rt").getField("a.b"), col("rt").getField("a-b"),
      col("rt").getField("a_b_1")).collect().toSeq === Seq(Row(1L, 2L, 3L)))
  }

  test("a flat a_b column and a nested a.b struct path cannot collide in record names") {
    // path-derived record names used to merge "record0_a_b" from both —
    // counter-derived names make the schema parse and round-trip
    val st = StructType(Seq(
      StructField("a_b", StructType(Seq(StructField("x", LongType)))),
      StructField("a", StructType(Seq(
        StructField("b", StructType(Seq(StructField("y", LongType)))))))))
    val parsed = new org.apache.avro.Schema.Parser().parse(AvroSerde.avroSchemaFor(st))
    assert(parsed.getFields.size === 2)
  }

  test("round-trips Connect logical types: timestamp-micros, date, decimal") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("d", DateType),
      StructField("amount", DecimalType(18, 2))))
    val ts = java.sql.Timestamp.valueOf("2024-03-05 10:20:30.123456")
    val rows = Seq(
      Row(1L, ts, java.sql.Date.valueOf("2024-03-05"), BigDecimal("12345.67").bigDecimal),
      Row(2L, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => r: Row)), schema)
    val rt = AvroSerde.deserialize(
      AvroSerde.serialize(df, df.columns.toSeq), "avro_value", schema, "rt")
    val back = rt.select($"rt.id", $"rt.ts", $"rt.d", $"rt.amount").collect()
    val r1 = back.find(_.getLong(0) == 1L).get
    assert(r1.getTimestamp(1) === ts) // µs precision survives
    assert(r1.getDate(2).toString === "2024-03-05")
    assert(r1.getDecimal(3) === BigDecimal("12345.67").bigDecimal)
    val r2 = back.find(_.getLong(0) == 2L).get
    assert(r2.isNullAt(1) && r2.isNullAt(2) && r2.isNullAt(3))
  }

  test("round-trips non-identifier column names (dash/dot/leading digit)") {
    val df = Seq((1L, "a", 2.5)).toDF("user-id", "the.name", "1st_score")
    val rt = AvroSerde.deserialize(
      AvroSerde.serialize(df, df.columns.toSeq), "avro_value", df.schema, "rt")
    val back = rt.select($"rt.`user-id`", $"rt.`the.name`", $"rt.`1st_score`")
    assert(back.collect().toSeq === df.collect().toSeq)
  }

  test("wire framing: header round-trips any schema id, payload preserved (property)") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val id = rnd.nextInt()
      val payload = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      val framed = AvroSerde.wireHeader(id) ++ payload
      assert(AvroSerde.schemaIdOf(framed) === id)
      assert(AvroSerde.unframeBytes(framed).toSeq === payload.toSeq)
      assert(AvroSerde.unframeBytes(framed, Some(id)).toSeq === payload.toSeq)
    }
  }

  test("wire framing: framed serialize/deserialize round-trips; id mismatch and bare avro fail loudly") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val framed = AvroSerde.serializeFramed(df, df.columns.toSeq, schemaId = 42)
    // every framed value starts with the 5-byte header carrying id 42
    framed.select($"avro_value").collect().foreach { r =>
      assert(AvroSerde.schemaIdOf(r.getAs[Array[Byte]](0)) === 42)
    }
    val rt = AvroSerde.deserializeFramed(framed, "avro_value", df.schema, "rt",
      expectedSchemaId = Some(42))
    assert(rt.select($"rt.id", $"rt.s").collect().toSet === df.collect().toSet)
    def causeChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    // wrong expected id → clear error
    val wrongId = intercept[Exception] {
      AvroSerde.deserializeFramed(framed, "avro_value", df.schema, "rt",
        expectedSchemaId = Some(7)).collect()
    }
    assert(causeChain(wrongId).contains("schema id"), causeChain(wrongId))
    // bare (unframed) avro → "not Confluent wire format", not garbled rows
    val bare = AvroSerde.serialize(df, df.columns.toSeq)
    val noMagic = intercept[Exception] {
      AvroSerde.deserializeFramed(bare, "avro_value", df.schema, "rt").collect()
    }
    assert(causeChain(noMagic).contains("wire format"), causeChain(noMagic))
  }

  test("avro key envelope: random keys round-trip exactly, same key → one partition") {
    import graft.sources.KafkaEnvelope
    val rnd = new scala.util.Random(13)
    val data = (0 until 300).map { i =>
      (rnd.nextLong(), rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000000)))
    }
    val df = data.toDF("uid", "etype", "ts")
    val env = KafkaEnvelope.wrapAvroKey(df, Seq("uid", "etype"), "ts", "t", keySchemaId = 9)
    val keySchema = StructType(Seq(
      StructField("uid", LongType), StructField("etype", StringType)))
    val back = KafkaEnvelope.unwrapAvroKey(env, keySchema, "k", Some(9))
      .select($"k.uid", $"k.etype").as[(Long, String)].collect().toSet
    assert(back === data.map(t => (t._1, t._2)).toSet)
    // Kafka partitioner contract: a key never spans partitions
    val maxParts = KafkaEnvelope.unwrapAvroKey(env, keySchema, "k")
      .groupBy($"k.uid", $"k.etype")
      .agg(countDistinct($"partition").as("np"))
      .agg(max($"np")).as[Long].head()
    assert(maxParts === 1L)
  }

  test("tolerant decode: corrupt avro values land in the error column, clean rows decode, tombstones pass") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val framed = AvroSerde.serializeFramed(df, df.columns.toSeq, schemaId = 5)
    // corrupt row 2's bytes (not wire format), null row 3's value (tombstone)
    import org.apache.spark.sql.functions.{col, expr, when}
    val mangled = framed.withColumn("avro_value",
      when(col("id") === 2L, expr("CAST('garbage' AS BINARY)"))
        .when(col("id") === 3L, expr("CAST(NULL AS BINARY)"))
        .otherwise(col("avro_value")))
    val out = AvroSerde.deserializeTolerant(mangled, "avro_value", df.schema, "rt",
      framed = true, expectedSchemaId = Some(5))
    val rows = out.select($"id", $"rt.s", $"_decode_error").collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    assert(rows(1L) === ((Some("a"), None)))           // clean
    assert(rows(2L)._1.isEmpty && rows(2L)._2.exists(_.contains("wire format"))) // quarantined
    assert(rows(3L) === ((None, None)))                // tombstone: no error
  }

  test("property: seeded random primitive rows survive the round-trip") {
    val rnd = new scala.util.Random(42)
    val data = (0 until 200).map { i =>
      val s = if (rnd.nextBoolean()) rnd.alphanumeric.take(rnd.nextInt(30)).mkString else null
      (rnd.nextLong(), s, rnd.nextDouble() * 2e6 - 1e6)
    }
    val df = data.toDF("id", "s", "d")
    val rt = AvroSerde.deserialize(
      AvroSerde.serialize(df, df.columns.toSeq), "avro_value", df.schema, "rt")
    assert(rt.select($"rt.id", $"rt.s", $"rt.d").collect().toSet === df.collect().toSet)
  }

  // ---- writer/reader schema RESOLUTION (the registry-compat behaviors) ----

  test("resolution: v2 reader decodes v1 data — added field defaults, dropped field skipped") {
    // v1 writer: (id, name, legacy) — v2 reader: (id, name, score) where
    // score is new (defaults null) and legacy was dropped (skipped)
    val v1 = Seq((1L, "a", "old1"), (2L, "b", "old2")).toDF("id", "name", "legacy")
    val ser = AvroSerde.serialize(v1, v1.columns.toSeq)
    val writerJson = AvroSerde.avroSchemaFor(v1.schema)
    val readerStruct = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val out = AvroSerde.deserializeResolved(
      ser.select($"avro_value"), "avro_value", writerJson, readerStruct, "rt")
    val rows = out.select($"rt.id", $"rt.name", $"rt.score").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(rows === Set((1L, "a", None), (2L, "b", None)))
  }

  test("resolution: fields match by NAME across reordering, int->long and float->double promote") {
    val v1 = Seq((7, "x", 1.5f), (8, "y", -2.25f)).toDF("n", "s", "f")
    val ser = AvroSerde.serialize(v1, v1.columns.toSeq)
    val writerJson = AvroSerde.avroSchemaFor(v1.schema)
    // reader reorders (s first) and widens n: int->long, f: float->double
    val readerStruct = StructType(Seq(
      StructField("s", StringType), StructField("n", LongType),
      StructField("f", DoubleType)))
    val out = AvroSerde.deserializeResolved(
      ser.select($"avro_value"), "avro_value", writerJson, readerStruct, "rt")
    val rows = out.select($"rt.s", $"rt.n", $"rt.f").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows === Set(("x", 7L, 1.5), ("y", 8L, -2.25)))
  }

  test("resolution: genuinely incompatible writer data is quarantined on the tolerant path") {
    // writer field s is a string; reader demands a long with NO default —
    // resolution fails per-record, tolerant path must quarantine, strict throw
    val v1 = Seq((1L, "not-a-number")).toDF("id", "s")
    val ser = AvroSerde.serialize(v1, v1.columns.toSeq).select($"avro_value")
    val writerJson = AvroSerde.avroSchemaFor(v1.schema)
    val readerStruct = StructType(Seq(
      StructField("id", LongType), StructField("s", LongType)))
    val tol = AvroSerde.deserializeResolvedTolerant(
      ser, "avro_value", writerJson, readerStruct, "rt")
    val r = tol.select($"rt", $"_decode_error").collect().head
    assert(r.isNullAt(0) && r.getString(1) != null)
    intercept[org.apache.spark.SparkException] {
      AvroSerde.deserializeResolved(ser, "avro_value", writerJson, readerStruct, "rt")
        .collect()
    }
  }

  test("registry decode: mixed v1/v2 frames on one topic resolve per-record by schema id") {
    val v1 = Seq((1L, "a"), (3L, "c")).toDF("id", "name")
    val v2 = Seq((2L, "b", 9.5), (4L, "d", -1.0)).toDF("id", "name", "score")
    val wire = AvroSerde.serializeFramed(v1, v1.columns.toSeq, schemaId = 11)
      .select($"avro_value")
      .unionByName(AvroSerde.serializeFramed(v2, v2.columns.toSeq, schemaId = 12)
        .select($"avro_value"))
    val readerStruct = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val out = AvroSerde.deserializeRegistry(wire, "avro_value",
      Map(11 -> AvroSerde.avroSchemaFor(v1.schema), 12 -> AvroSerde.avroSchemaFor(v2.schema)),
      readerStruct, "rt")
    val rows = out.select($"rt.id", $"rt.name", $"rt.score").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(rows === Set((1L, "a", None), (3L, "c", None),
      (2L, "b", Some(9.5)), (4L, "d", Some(-1.0))))
    // registry miss (unknown id) fails loudly
    intercept[org.apache.spark.SparkException] {
      AvroSerde.deserializeRegistry(wire, "avro_value",
        Map(11 -> AvroSerde.avroSchemaFor(v1.schema)), readerStruct, "rt").collect()
    }
  }

  test("SchemaProvider seam: a fake provider drops in; unknown ids keep the registry-miss contract") {
    import graft.sources.SchemaProvider
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val wire = AvroSerde.serializeFramed(v1, v1.columns.toSeq, schemaId = 7)
      .select($"avro_value")
    val writerJson = AvroSerde.avroSchemaFor(v1.schema)
    // a computing fake — the shape a REST client would have (serialized
    // to executors, consulted per id, NOT a pre-known map)
    val fake = new SchemaProvider {
      def schemaFor(id: Int): String =
        if (id == 7) writerJson
        else throw new IllegalArgumentException(s"registry returned 404 for id $id")
    }
    val out = AvroSerde.deserializeRegistryWith(wire, "avro_value", fake, v1.schema, "rt")
    assert(out.select($"rt.id", $"rt.name").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    // ids the provider can't resolve fail the decode loudly
    val wrongId = AvroSerde.serializeFramed(v1, v1.columns.toSeq, schemaId = 8)
      .select($"avro_value")
    intercept[org.apache.spark.SparkException] {
      AvroSerde.deserializeRegistryWith(wrongId, "avro_value", fake, v1.schema, "rt").collect()
    }
  }

  test("SchemaProvider.rest: LIVE loopback registry — end-to-end decode, 404 contract, cache, gate") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import graft.sources.SchemaProvider
    // a real HTTP server speaking the Confluent REST wire shape — the
    // embedded-Derby pattern applied to the registry (the closest a
    // zero-egress sandbox gets to SCHEMA_REGISTRY_URL)
    val v1 = Seq((1L, "a"), (3L, "c")).toDF("id", "name")
    val v2 = Seq((2L, "b", 9.5)).toDF("id", "name", "score")
    val s21 = AvroSerde.avroSchemaFor(v1.schema)
    val s22 = AvroSerde.avroSchemaFor(v2.schema)
    val s30 = AvroSerde.avroSchemaFor(StructType(Seq( // type-clash writer
      StructField("id", LongType), StructField("name", LongType))))
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val hits = new java.util.concurrent.atomic.AtomicInteger
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/schemas/ids/", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        hits.incrementAndGet()
        val id = x.getRequestURI.getPath.stripPrefix("/schemas/ids/").toInt
        val schema = id match {
          case 21 => Some(s21); case 22 => Some(s22); case 30 => Some(s30)
          case _ => None
        }
        val (status, body) = schema match {
          case Some(sch) => (200, s"""{"schema": "${esc(sch)}"}""")
          case None => (404, """{"error_code": 40403, "message": "Schema not found"}""")
        }
        val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        x.getResponseHeaders.add("Content-Type", "application/vnd.schemaregistry.v1+json")
        x.sendResponseHeaders(status, bytes.length)
        x.getResponseBody.write(bytes)
        x.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val provider = SchemaProvider.rest(base)
      // direct lookup resolves the schema the server serves
      val parser = new org.apache.avro.Schema.Parser()
      assert(parser.parse(provider.schemaFor(21)) ===
        new org.apache.avro.Schema.Parser().parse(s21))
      // immutable-id cache: repeat lookups never re-hit the registry
      val before = hits.get()
      provider.schemaFor(21); provider.schemaFor(21)
      assert(hits.get() === before, "cached id re-hit the registry")
      // 404 keeps the registry-miss IllegalArgumentException contract
      val miss = intercept[IllegalArgumentException](provider.schemaFor(99))
      assert(miss.getMessage.contains("404"))
      // end-to-end: mixed v1/v2 frames decode through the LIVE provider
      // (lookups run inside executor tasks — serialization included)
      val wire = AvroSerde.serializeFramed(v1, v1.columns.toSeq, schemaId = 21)
        .select($"avro_value")
        .unionByName(AvroSerde.serializeFramed(v2, v2.columns.toSeq, schemaId = 22)
          .select($"avro_value"))
      val readerStruct = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType),
        StructField("score", DoubleType)))
      val out = AvroSerde.deserializeRegistryWith(wire, "avro_value",
        SchemaProvider.rest(base), readerStruct, "rt")
      val rows = out.select($"rt.id", $"rt.name", $"rt.score").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
      assert(rows === Set((1L, "a", None), (3L, "c", None), (2L, "b", Some(9.5))))
      // an id the registry doesn't know fails the decode loudly
      val unknown = AvroSerde.serializeFramed(v1, v1.columns.toSeq, schemaId = 23)
        .select($"avro_value")
      intercept[org.apache.spark.SparkException] {
        AvroSerde.deserializeRegistryWith(unknown, "avro_value",
          SchemaProvider.rest(base), readerStruct, "rt").collect()
      }
      // the compatibility gate composes over the live provider: id 30's
      // writer types `name` as long — unreadable, rejected with reasons
      val gated = SchemaProvider.validated(SchemaProvider.rest(base),
        AvroSerde.avroSchemaFor(readerStruct))
      val bad = intercept[IllegalArgumentException](gated.schemaFor(30))
      assert(bad.getMessage.contains("not read-compatible"))
      assert(gated.schemaFor(21) === provider.schemaFor(21))
    } finally server.stop(0)
  }

  test("SchemaProvider.validated: the compatibility gate rejects an unreadable writer schema") {
    import graft.sources.SchemaProvider
    val readerStruct = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val readerJson = AvroSerde.avroSchemaFor(readerStruct)
    // compatible writer: same fields reordered + one dropped-by-reader field
    val compatible = AvroSerde.avroSchemaFor(StructType(Seq(
      StructField("name", StringType), StructField("id", LongType),
      StructField("legacy", StringType))))
    // incompatible writer: `name` is a long — no reader union branch can
    // accept it (a MISSING writer field would be fine: every reader field
    // defaults null; a TYPE clash is what the gate must catch)
    val incompatible = AvroSerde.avroSchemaFor(StructType(Seq(
      StructField("id", LongType), StructField("name", LongType))))
    assert(SchemaProvider.compatibilityErrors(compatible, readerJson).isEmpty)
    assert(SchemaProvider.compatibilityErrors(incompatible, readerJson).nonEmpty)
    val gated = SchemaProvider.validated(
      SchemaProvider.ofMap(Map(1 -> compatible, 2 -> incompatible)), readerJson)
    assert(gated.schemaFor(1) == compatible)
    val e = intercept[IllegalArgumentException](gated.schemaFor(2))
    assert(e.getMessage.contains("not read-compatible"))
    // and the gated provider works end-to-end through the decode loop
    val v1 = Seq((5L, "e")).toDF("id", "name")
    val wire = AvroSerde.serializeFramed(v1, v1.columns.toSeq, schemaId = 1)
      .select($"avro_value")
    val viaGate = AvroSerde.deserializeRegistryWith(wire, "avro_value",
      SchemaProvider.validated(SchemaProvider.ofMap(
        Map(1 -> AvroSerde.avroSchemaFor(v1.schema))), readerJson),
      readerStruct, "rt")
    assert(viaGate.select($"rt.id", $"rt.name").as[(Long, String)].collect().toSet ===
      Set((5L, "e")))
  }
}
