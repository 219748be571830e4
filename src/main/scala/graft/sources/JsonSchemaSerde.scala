package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka Connect JsonConverter `schemas.enable=true` wire format
  * (SURVEY §2.1 S8 — the schema-carrying sibling of the schemaless JSON
  * path): every value is `{"schema": {...}, "payload": {...}}`, where
  * `schema` is the Connect schema object (type names `int8..int64`,
  * `float32/64`, `boolean`, `string`, `bytes`; timestamps as the
  * `org.apache.kafka.connect.data.Timestamp` logical type over int64
  * epoch-MILLIS). The reference's converter config
  * (`CONNECT_*_CONVERTER` + `*_SCHEMAS_ENABLE`, main.sh:72-77) emits
  * exactly this envelope when schemas are on.
  *
  * Scale shape: the schema half is one CONSTANT string literal per
  * DataFrame (computed driver-side from the StructType), so serialize is
  * a `concat` + one `to_json` per row — no per-row schema work.
  * Deserialize materializes the parsed payload struct ONCE per row
  * (`__wire` column) before field extraction: building the result struct
  * from `from_json(...)` directly would re-inline the parse into every
  * field (subexpression elimination skips nothing here — from_json per
  * field is N full parses).
  *
  * Connect's Timestamp logical type is millisecond-precision by
  * definition, so sub-millis is truncated on the wire — faithful to the
  * real converter, and the reason the roundtrip query compares epoch
  * millis.
  */
object JsonSchemaSerde {

  /** JSON string-escape for the hand-built schema half (the payload half
    * goes through `to_json`, which escapes on its own) — a field or
    * schema name containing a quote/backslash/control char must not
    * corrupt the envelope. */
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** The Connect schema JSON for a StructType — deterministic field
    * order (schema order), driver-side constant. `version` is the
    * struct-level schema version (what `SetSchemaMetadata` sets);
    * omitted from the wire when None, like the real converter. */
  def connectSchemaJson(schema: StructType, name: String,
      version: Option[Int] = None): String = {
    val fields = schema.fields.map { f =>
      val (t, logical) = f.dataType match {
        case ByteType => ("int8", None)
        case ShortType => ("int16", None)
        case IntegerType => ("int32", None)
        case LongType => ("int64", None)
        case FloatType => ("float32", None)
        case DoubleType => ("float64", None)
        case BooleanType => ("boolean", None)
        case StringType => ("string", None)
        case BinaryType => ("bytes", None)
        case TimestampType => ("int64", Some("org.apache.kafka.connect.data.Timestamp"))
        case other => throw new IllegalArgumentException(
          s"unsupported type for a Connect JSON schema: $other (field ${f.name})")
      }
      val logicalJson = logical.map(n => s""","name":"${esc(n)}","version":1""").getOrElse("")
      s"""{"type":"$t","optional":${f.nullable}$logicalJson,"field":"${esc(f.name)}"}"""
    }.mkString("[", ",", "]")
    val versionJson = version.map(v => s""","version":$v""").getOrElse("")
    s"""{"type":"struct","fields":$fields,"optional":false,"name":"${esc(name)}"$versionJson}"""
  }

  /** Encode `cols` as a schema-carrying JSON value column `out`
    * (binary, like a topic scan would yield). Timestamps go to int64
    * epoch millis per the Connect logical type. */
  def serialize(df: DataFrame, cols: Seq[String], name: String,
      out: String = "value", version: Option[Int] = None): DataFrame = {
    val schema = StructType(cols.map(c => df.schema(c)))
    val schemaJson = connectSchemaJson(schema, name, version)
    // backtick-quote the lookup: a raw col("user.id") parses as a nested
    // path and fails analysis even though the flat column exists
    def qcol(c: String) = col(graft.SqlIdent.bq(c))
    val payloadCols = cols.map { c =>
      df.schema(c).dataType match {
        case TimestampType => unix_millis(qcol(c)).alias(c)
        case _ => qcol(c)
      }
    }
    df.withColumn(out,
      concat(lit("""{"schema":"""), lit(schemaJson), lit(""","payload":"""),
        // explicit nulls: Connect's JsonConverter writes every declared
        // field, NULL included; Spark's to_json default would omit them
        // (roundtrip-invisible, but wire-format parity matters to
        // external consumers and byte-level comparisons)
        to_json(struct(payloadCols: _*), Map("ignoreNullFields" -> "false")),
        lit("}")).cast(BinaryType))
  }

  /** Decode a schema-carrying JSON value back into a struct column
    * `structOut` typed by `schema` (epoch-millis int64 → timestamp for
    * TimestampType fields). Also emits `schemaNameOut` (the embedded
    * schema's name, NULL when the envelope carries none) so callers can
    * route/quarantine mismatched producers instead of mis-parsing them.
    *
    * One `from_json` over a nested envelope schema reads both halves in a
    * single parse (`get_json_object($.payload)` + `from_json` +
    * `get_json_object($.schema.name)` would parse the full value three
    * times per row). */
  def deserialize(df: DataFrame, valueCol: String, schema: StructType,
      structOut: String = "payload",
      schemaNameOut: String = "schema_name",
      schemaVersionOut: Option[String] = None): DataFrame = {
    val wire = StructType(schema.fields.map { f =>
      f.dataType match {
        case TimestampType => f.copy(dataType = LongType)
        case _ => f
      }
    })
    val envelope = StructType(Seq(
      StructField("schema",
        StructType(Seq(StructField("name", StringType, nullable = true),
          StructField("version", IntegerType, nullable = true))),
        nullable = true),
      StructField("payload", wire, nullable = true)))
    // uniquified temp column: a fixed "__wire" would clobber (and then
    // drop) a caller's column of that name
    val tmp = Iterator.from(0).map(i => s"__wire$i")
      .find(n => !df.columns.contains(n)).get
    // getField, not a dotted path string: a field named "user.id" is
    // legal in the schema but a dotted col() path fails analysis
    val payload = col(tmp).getField("payload")
    // a NULL wire value (Kafka tombstone) or unparseable envelope must
    // yield a NULL struct, not a non-null struct of all-null fields — a
    // consumer detecting tombstones via isNull (CdcApply / the JDBC CDC
    // sink) would otherwise upsert all-NULLs over real data. Same
    // contract as AvroSerde.deserialize (null bytes -> null struct).
    val withName = df
      .withColumn(tmp, from_json(col(valueCol).cast(StringType), envelope))
      .withColumn(schemaNameOut, col(tmp).getField("schema").getField("name"))
    schemaVersionOut.fold(withName)(out => withName.withColumn(out,
        col(tmp).getField("schema").getField("version")))
      .withColumn(structOut, when(payload.isNull, lit(null).cast(schema))
        .otherwise(struct(schema.fields.map { f =>
          (f.dataType match {
            case TimestampType => timestamp_millis(payload.getField(f.name))
            case _ => payload.getField(f.name)
          }).alias(f.name)
        }: _*)))
      .drop(tmp)
  }
}
