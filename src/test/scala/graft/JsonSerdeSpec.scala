package graft

import graft.sources.JsonSchemaSerde
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Connect JsonConverter schemas.enable=true wire format (SURVEY §2.1
  * S8b): schema object shape, roundtrip fidelity incl. NULLs, embedded
  * schema-name routing, and the millisecond truncation the Connect
  * Timestamp logical type mandates. */
class JsonSerdeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("ok", BooleanType),
    StructField("at", TimestampType)))

  private def sample = Seq(
    (1L, "a", 1.5, true, "2024-01-01 00:00:01.234567"),
    (2L, null.asInstanceOf[String], 2.5, false, "2024-06-15 12:30:00.999999"),
    (3L, "c", 3.5, true, null.asInstanceOf[String])
  ).toDF("id", "name", "score", "ok", "at_s")
    .withColumn("at", to_timestamp($"at_s")).drop("at_s")

  test("S8b: schema JSON carries Connect type names and the Timestamp logical type") {
    val sj = JsonSchemaSerde.connectSchemaJson(schema, "t.Value")
    assert(sj.contains(""""type":"struct""""))
    assert(sj.contains(""""type":"int64","optional":true,"field":"id""""))
    assert(sj.contains(""""name":"org.apache.kafka.connect.data.Timestamp","version":1"""))
    assert(sj.contains(""""name":"t.Value""""))
  }

  test("S8b: roundtrip preserves values and NULLs; timestamps truncate to millis") {
    val enc = JsonSchemaSerde.serialize(sample, schema.fieldNames.toSeq, "t.Value", "wire")
    val dec = JsonSchemaSerde.deserialize(enc.select($"wire"), "wire", schema, "p")
    val rows = dec.select($"p.id", $"p.name", $"p.score", $"p.ok",
        unix_millis($"p.at").as("at_ms"), $"schema_name")
      .orderBy($"id").collect()
    assert(rows.length === 3)
    assert(rows(0).getLong(0) === 1L && rows(0).getString(1) === "a")
    assert(rows(1).isNullAt(1), "NULL string must survive the wire")
    assert(rows(2).isNullAt(4), "NULL timestamp must survive the wire")
    // .234567 -> 234 ms on the wire (Connect Timestamp is millis)
    assert(rows(0).getLong(4) % 1000 === 234L)
    assert(rows.forall(_.getString(5) === "t.Value"))
  }

  test("S8b: a schemaless value yields NULL schema_name (router/quarantine hook)") {
    val bare = Seq("""{"id": 9}""").toDF("wire")
      .select($"wire".cast(BinaryType).as("wire"))
    val dec = JsonSchemaSerde.deserialize(bare, "wire",
      StructType(Seq(StructField("id", LongType))), "p")
    val r = dec.select($"p.id", $"schema_name").collect().head
    // no "$.payload" in a bare object -> payload fields NULL, name NULL
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("S8b: NULL fields appear explicitly on the wire (Connect parity)") {
    val enc = JsonSchemaSerde.serialize(sample, schema.fieldNames.toSeq, "t.Value", "wire")
    val wires = enc.select($"wire".cast(StringType)).as[String].collect()
    // Connect's JsonConverter writes every declared field, NULL included;
    // Spark's to_json default omits them — pin the explicit form
    assert(wires.exists(_.contains(""""name":null""")), s"missing explicit null:\n${wires.mkString("\n")}")
    assert(wires.exists(_.contains(""""at":null""")))
  }

  test("S8b: quote/backslash field and schema names survive the envelope") {
    val odd = StructType(Seq(StructField("""a"b""", LongType),
      StructField("""c\d""", StringType)))
    val df = Seq((7L, "x")).toDF("""a"b""", """c\d""")
    val enc = JsonSchemaSerde.serialize(df, odd.fieldNames.toSeq, """q"t""", "wire")
    val dec = JsonSchemaSerde.deserialize(enc.select($"wire"), "wire", odd, "p")
    val r = dec.select(col("p").getField("""a"b"""),
      col("p").getField("""c\d"""), $"schema_name").collect().head
    assert(r.getLong(0) === 7L && r.getString(1) === "x")
    assert(r.getString(2) === """q"t""")
  }

  test("S8b: a pre-existing __wire0 column is not clobbered by deserialize") {
    val enc = JsonSchemaSerde.serialize(sample, schema.fieldNames.toSeq, "t.Value", "wire")
      .withColumn("__wire0", lit("keep-me"))
    val dec = JsonSchemaSerde.deserialize(enc, "wire", schema, "p")
    assert(dec.columns.contains("__wire0"))
    assert(dec.select($"__wire0").distinct().as[String].collect() === Array("keep-me"))
    assert(dec.select($"p.id").orderBy($"p.id").as[Long].collect() === Array(1L, 2L, 3L))
  }

  test("S8b: dotted field names resolve as literal fields, not paths") {
    val dotted = StructType(Seq(StructField("user.id", LongType)))
    val df = Seq(Tuple1(42L)).toDF("user.id")
    val enc = JsonSchemaSerde.serialize(df, Seq("user.id"), "t", "wire")
    val dec = JsonSchemaSerde.deserialize(enc.select($"wire"), "wire", dotted, "p")
    assert(dec.select(col("p").getField("user.id")).as[Long].collect() === Array(42L))
  }

  test("errors.tolerance: blank non-null values are quarantined, not all-null clean rows") {
    import graft.sources.ErrorTolerance
    val schema = StructType(Seq(StructField("k", LongType)))
    val df = Seq(
      ("""{"k": 1}""", "clean"),
      ("", "blank"), ("   ", "whitespace"), ("\t\n\r", "ctl_whitespace"),
      ("{broken", "corrupt"),
      (null.asInstanceOf[String], "tombstone")
    ).toDF("value", "tag")
    val parsed = ErrorTolerance.tolerantJson(df, "value", schema)
    val cleanTags = ErrorTolerance.clean(parsed).select($"tag").as[String].collect().toSet
    val dlqTags = ErrorTolerance.quarantine(parsed).select($"tag").as[String].collect().toSet
    // from_json skips blank strings without setting the corrupt marker —
    // they must land in the DLQ, not pass as all-null "clean" rows
    assert(cleanTags === Set("clean", "tombstone"))
    // tab/newline-only too: Spark's one-arg trim strips ONLY 0x20
    // spaces, so these dodged the old guard and passed as "clean"
    assert(dlqTags === Set("blank", "whitespace", "ctl_whitespace", "corrupt"))
    // the DLQ keeps the raw payload for replay
    val raws = ErrorTolerance.quarantine(parsed)
      .select($"tag", $"raw").as[(String, String)].collect().toMap
    assert(raws("corrupt") === "{broken" && raws("blank") === "")
  }

  test("S8b: a NULL wire value (tombstone) yields a NULL payload struct") {
    val schema = StructType(Seq(StructField("id", LongType)))
    val df = Seq(Tuple1("""{"schema":{"name":"t"},"payload":{"id":1}}"""), Tuple1(null.asInstanceOf[String]))
      .toDF("wire").select($"wire".cast(BinaryType).as("wire"))
    val dec = JsonSchemaSerde.deserialize(df, "wire", schema, "p")
    val rows = dec.select($"p").collect()
    // a NON-null struct of all-null fields would make isNull-based
    // tombstone detection upsert NULLs over real data in a CDC sink
    assert(rows.count(_.isNullAt(0)) === 1, "tombstone must be a NULL struct")
    assert(rows.count(!_.isNullAt(0)) === 1)
  }

  test("S8b: unsupported field types are rejected at build time") {
    intercept[IllegalArgumentException] {
      JsonSchemaSerde.connectSchemaJson(
        StructType(Seq(StructField("m", MapType(StringType, LongType)))), "x")
    }
  }
}
