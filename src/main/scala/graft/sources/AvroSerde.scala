package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro value serde (SURVEY §2.1 S6/S7): the reference wires
  * `AvroConverter` for record keys/values against a Schema Registry
  * (reference `main.sh:72-75`). The offline harness has no registry, so
  * schemas are explicit per call (Avro JSON schema string), and the serde
  * itself is built on the public core Avro library (the
  * `spark-avro` module is not on this classpath).
  *
  * Round-trip contract (property-tested): `deserialize(serialize(df)) ==
  * df` for struct schemas of primitives, arrays, maps and nested structs.
  *
  * Scale: serde runs per-partition (mapPartitions) with
  * per-partition-reused Avro writer/reader instances — the per-record
  * cost is one encode, no reflection, no driver involvement.
  */
object AvroSerde {

  /** Derive an Avro record schema (JSON) from a Spark StructType. Nested
    * record names are derived from the full field path (`name_fieldA_...`)
    * so sibling struct fields can never collide in Avro's global record
    * namespace; field names are JSON-escaped. */
  def avroSchemaFor(st: StructType, name: String = "record0"): String = {
    // Avro record names share one global namespace per schema — derive
    // nested names from a counter, not the field path (two paths can
    // collide once sanitized, e.g. top-level "a_b" vs struct a.field b).
    // Decode is positional, so names only need to be unique, not pretty.
    var recSeq = 0
    def nextRecordName(): String = { recSeq += 1; s"${name}_r$recSeq" }
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
    def field(dt: DataType): String = dt match {
      case IntegerType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case BooleanType => "\"boolean\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      // Connect's logical types (the JDBC connectors' SQL type mapping):
      case TimestampType => """{"type":"long","logicalType":"timestamp-micros"}"""
      case DateType => """{"type":"int","logicalType":"date"}"""
      case d: DecimalType =>
        s"""{"type":"bytes","logicalType":"decimal","precision":${d.precision},"scale":${d.scale}}"""
      // element/value types are nullable unions: Spark arrays/maps carry
      // containsNull/valueContainsNull=true by default, and a bare item
      // schema would NPE inside the datum writer on the first null element
      case ArrayType(et, _) => s"""{"type":"array","items":["null",${field(et)}]}"""
      case MapType(StringType, vt, _) => s"""{"type":"map","values":["null",${field(vt)}]}"""
      case inner: StructType => recordSchema(inner, nextRecordName())
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }
    def recordSchema(s: StructType, n: String): String = {
      // Avro field names must match [A-Za-z_][A-Za-z0-9_]* — sanitize
      // (dashes/dots/spaces are common Connect column names). Data
      // mapping is positional on both serde paths, so the rename is
      // invisible to the round-trip.
      val assigned = scala.collection.mutable.Set.empty[String]
      val fields = s.fields.map { f =>
        val cleaned = f.name.replaceAll("[^A-Za-z0-9_]", "_")
        val base = if (cleaned.isEmpty || cleaned.head.isDigit) "_" + cleaned else cleaned
        // distinct source names may sanitize identically ("a-b", "a.b"),
        // and a suffixed name can itself collide with a later literal
        // ("a_b_1") — probe until free against everything assigned so far
        var safe = base; var i = 0
        while (assigned.contains(safe)) { i += 1; safe = s"${base}_$i" }
        assigned += safe
        s"""{"name":"${esc(safe)}","type":["null",${field(f.dataType)}],"default":null}"""
      }.mkString(",")
      s"""{"type":"record","name":"$n","fields":[$fields]}"""
    }
    recordSchema(st, name)
  }

  private def toAvro(v: Any, schema: Schema): Any = v match {
    case null => null
    case r: Row =>
      val s = nonNull(schema)
      val rec = new GenericData.Record(s)
      s.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
        rec.put(f.name(), toAvro(r.get(i), f.schema()))
      }
      rec
    case seq: scala.collection.Seq[_] =>
      seq.map(e => toAvro(e, nonNull(schema).getElementType)).asJava
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, mv) =>
        k.toString -> toAvro(mv, nonNull(schema).getValueType)
      }.asJava
    case s: String => s
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    // logical types → their Avro physical carriers (both external
    // families: java.sql.* and, when datetime.java8API is enabled,
    // java.time.*)
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L // epoch micros
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case d: java.math.BigDecimal => java.nio.ByteBuffer.wrap(d.unscaledValue.toByteArray)
    case d: scala.math.BigDecimal => java.nio.ByteBuffer.wrap(d.underlying.unscaledValue.toByteArray)
    case other => other
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** `java8`: construct java.time external types when the session runs
    * with `spark.sql.datetime.java8API.enabled` — the RowEncoder then
    * expects Instant/LocalDate and would reject java.sql.Timestamp. */
  private def fromAvro(v: Any, dt: DataType, java8: Boolean): Any = (v, dt) match {
    case (null, _) => null
    case (r: GenericRecord, st: StructType) =>
      // positional, not by name — the Avro schema may carry sanitized
      // field names that differ from the Spark ones
      Row.fromSeq(st.fields.zipWithIndex.map { case (f, i) =>
        fromAvro(r.get(i), f.dataType, java8)
      }.toSeq)
    case (l: java.util.List[_], ArrayType(et, _)) =>
      l.asScala.map(e => fromAvro(e, et, java8)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, mv) => k.toString -> fromAvro(mv, vt, java8) }.toMap
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    // logical-type carriers → Spark external types
    case (us: java.lang.Long, TimestampType) if java8 =>
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
    case (us: java.lang.Long, TimestampType) =>
      val secs = Math.floorDiv(us, 1000000L)
      val microOfSec = Math.floorMod(us, 1000000L)
      val t = new java.sql.Timestamp(secs * 1000L)
      t.setNanos(microOfSec.toInt * 1000) // setNanos replaces ALL sub-second
      t
    case (days: java.lang.Integer, DateType) if java8 =>
      java.time.LocalDate.ofEpochDay(days.toLong)
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
    case (b: java.nio.ByteBuffer, d: DecimalType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
      new java.math.BigDecimal(new java.math.BigInteger(arr), d.scale)
    case (other, _) => other
  }

  /** S7 — serialize the given struct columns of each row to Avro binary,
    * appended as `valueCol`. */
  def serialize(df: DataFrame, cols: Seq[String], valueCol: String = "avro_value"): DataFrame = {
    val inner = StructType(cols.map(c => df.schema(c)))
    val schemaJson = avroSchemaFor(inner)
    val idxs = cols.map(df.schema.fieldIndex)
    val outSchema = df.schema.add(StructField(valueCol, BinaryType))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      // per-partition reuse (the documented Avro pattern): one output
      // buffer reset per record, the encoder re-pointed at it — not a
      // fresh buffered encoder allocation per row on the hot path
      val bos = new ByteArrayOutputStream()
      var benc: org.apache.avro.io.BinaryEncoder = null
      rows.map { r =>
        val sub = Row.fromSeq(idxs.map(r.get))
        val rec = toAvro(sub, schema).asInstanceOf[GenericRecord]
        bos.reset()
        benc = EncoderFactory.get().binaryEncoder(bos, benc)
        writer.write(rec, benc); benc.flush()
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  /** S6 — deserialize an Avro binary column into a struct column
    * `structCol` with the given Spark schema. */
  def deserialize(df: DataFrame, valueCol: String, structSchema: StructType,
      structCol: String = "value_struct"): DataFrame =
    deserializeWith(df, valueCol, structSchema, structCol)(identity)

  /** The single decode loop behind every deserialize variant. `tolerant`
    * selects how a failed decode surfaces: thrown (strict) or as a
    * (null struct, error message) pair with an extra string column —
    * one pipeline, so decode fixes reach both paths. */
  private def deserializeWith(df: DataFrame, valueCol: String,
      structSchema: StructType, structCol: String,
      tolerant: Option[String] = None)(
      prep: Array[Byte] => Array[Byte]): DataFrame = {
    val schemaJson = avroSchemaFor(structSchema)
    val vIdx = df.schema.fieldIndex(valueCol)
    val base = df.schema.add(StructField(structCol, structSchema))
    val outSchema = tolerant.fold(base)(e => base.add(StructField(e, StringType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val java8 = df.sparkSession.conf
      .get("spark.sql.datetime.java8API.enabled", "false").toBoolean
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var bdec: org.apache.avro.io.BinaryDecoder = null // per-partition reuse
      def decode(bytes: Array[Byte]): Row = {
        bdec = DecoderFactory.get().binaryDecoder(prep(bytes), bdec)
        fromAvro(reader.read(null, bdec), structSchema, java8).asInstanceOf[Row]
      }
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](vIdx)
        tolerant match {
          case None =>
            Row.fromSeq(r.toSeq :+ (if (bytes == null) null else decode(bytes)))
          case Some(_) =>
            val (parsed, err): (Row, String) =
              if (bytes == null) (null, null)
              else try (decode(bytes), null) catch {
                case scala.util.control.NonFatal(e) =>
                  (null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
              }
            Row.fromSeq(r.toSeq :+ parsed :+ err)
        }
      }
    }(enc)
  }

  // ---- Writer/reader schema RESOLUTION (schema evolution) ----
  // The registry-backed converters' core runtime behavior (reference
  // main.sh:72-75): data written with schema v1 is decoded against reader
  // schema v2 using standard Avro resolution — fields matched by NAME
  // (not position), added reader fields filled from their defaults,
  // dropped writer fields skipped, numeric types promoted (int→long,
  // float→double). SURVEY §1.1: "the engine must tolerate schema drift".

  /** The single resolved-decode loop: per-record writer schema selected
    * by `writerKeyOf` (fixed key for single-writer variants, the wire
    * frame's schema id for the registry variant), resolved against the
    * reader schema derived from `structSchema`. Readers are built once
    * per (partition, writer id) and reused — resolution cost is
    * per-schema, not per-record. */
  private def deserializeResolvedWith(df: DataFrame, valueCol: String,
      structSchema: StructType, structCol: String,
      writers: SchemaProvider, tolerant: Option[String])(
      writerKeyOf: Array[Byte] => (Int, Array[Byte])): DataFrame = {
    val readerJson = avroSchemaFor(structSchema)
    val vIdx = df.schema.fieldIndex(valueCol)
    val base = df.schema.add(StructField(structCol, structSchema))
    val outSchema = tolerant.fold(base)(e => base.add(StructField(e, StringType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val java8 = df.sparkSession.conf
      .get("spark.sql.datetime.java8API.enabled", "false").toBoolean
    df.mapPartitions { rows =>
      val readerSchema = new Schema.Parser().parse(readerJson)
      val readerById = scala.collection.mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
      def readerFor(id: Int): GenericDatumReader[GenericRecord] =
        readerById.getOrElseUpdate(id, new GenericDatumReader[GenericRecord](
          new Schema.Parser().parse(writers.schemaFor(id)), readerSchema))
      var bdec: org.apache.avro.io.BinaryDecoder = null // per-partition reuse
      def decode(bytes: Array[Byte]): Row = {
        val (id, payload) = writerKeyOf(bytes)
        bdec = DecoderFactory.get().binaryDecoder(payload, bdec)
        fromAvro(readerFor(id).read(null, bdec), structSchema, java8).asInstanceOf[Row]
      }
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](vIdx)
        tolerant match {
          case None =>
            Row.fromSeq(r.toSeq :+ (if (bytes == null) null else decode(bytes)))
          case Some(_) =>
            val (parsed, err): (Row, String) =
              if (bytes == null) (null, null)
              else try (decode(bytes), null) catch {
                case scala.util.control.NonFatal(e) =>
                  (null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
              }
            Row.fromSeq(r.toSeq :+ parsed :+ err)
        }
      }
    }(enc)
  }

  /** S6 evolved — decode data written with `writerSchemaJson` using the
    * reader schema derived from `structSchema`: added fields default
    * (null), dropped writer fields are skipped, int→long / float→double
    * promote. Incompatible writer data throws at read; use
    * [[deserializeResolvedTolerant]] to quarantine instead. */
  def deserializeResolved(df: DataFrame, valueCol: String, writerSchemaJson: String,
      structSchema: StructType, structCol: String = "value_struct"): DataFrame =
    deserializeResolvedWith(df, valueCol, structSchema, structCol,
      SchemaProvider.ofMap(Map(0 -> writerSchemaJson)), tolerant = None)(b => (0, b))

  /** [[deserializeResolved]] with `errors.tolerance=all` semantics: a
    * record the writer→reader resolution cannot decode yields a null
    * struct + the error in `errorCol` (DLQ split downstream). */
  def deserializeResolvedTolerant(df: DataFrame, valueCol: String,
      writerSchemaJson: String, structSchema: StructType,
      structCol: String = "value_struct", errorCol: String = "_decode_error"): DataFrame =
    deserializeResolvedWith(df, valueCol, structSchema, structCol,
      SchemaProvider.ofMap(Map(0 -> writerSchemaJson)), tolerant = Some(errorCol))(b => (0, b))

  /** The full registry-consumer behavior: wire-framed values whose
    * writer schema is selected PER RECORD by the frame's schema id from
    * `writersById` (the offline registry — caller-provided, like schema
    * ids everywhere in this module), each resolved against the one
    * reader schema. A topic carrying a mix of v1- and v2-encoded records
    * (the normal state mid-migration) decodes in one pass. Unknown ids
    * fail loudly, like a registry miss. */
  def deserializeRegistry(df: DataFrame, valueCol: String,
      writersById: Map[Int, String], structSchema: StructType,
      structCol: String = "value_struct"): DataFrame =
    deserializeRegistryWith(df, valueCol,
      SchemaProvider.ofMap(writersById), structSchema, structCol)

  /** [[deserializeRegistry]] behind the [[SchemaProvider]] seam: any
    * id → schema lookup (a REST Schema-Registry client, a compatibility-
    * gated wrapper via [[SchemaProvider.validated]], a test fake) drops
    * in without touching the decode loop. */
  def deserializeRegistryWith(df: DataFrame, valueCol: String,
      provider: SchemaProvider, structSchema: StructType,
      structCol: String = "value_struct"): DataFrame =
    deserializeResolvedWith(df, valueCol, structSchema, structCol,
      provider, tolerant = None)(decodeFrame(_, None))

  // ---- Confluent Schema-Registry wire-format framing ----
  // Every registry-encoded topic the reference produces/consumes carries
  // `[magic 0x00][4-byte big-endian schema id][avro binary]` (the
  // AvroConverter wiring, reference `main.sh:72-75`). The framing is a
  // pure byte function; the registry lookup itself is out of scope in the
  // offline harness (schema ids are caller-assigned, like the explicit
  // schemas elsewhere in this module).

  /** The 5-byte wire-format header for a schema id. */
  def wireHeader(schemaId: Int): Array[Byte] = Array(
    0x00.toByte,
    (schemaId >>> 24).toByte, (schemaId >>> 16).toByte,
    (schemaId >>> 8).toByte, schemaId.toByte)

  /** Validate the header, return (schema id, Avro payload). Rejects
    * bytes that don't start with the magic byte (e.g. bare Avro) with a
    * clear error, like Connect's "Unknown magic byte". */
  private def decodeFrame(bytes: Array[Byte],
      expectedSchemaId: Option[Int]): (Int, Array[Byte]) = {
    if (bytes.length < 5 || bytes(0) != 0x00)
      throw new IllegalArgumentException(
        s"not Confluent wire format: expected [0x00][4-byte schema id][avro], got " +
          (if (bytes.isEmpty) "empty bytes"
           else f"first byte 0x${bytes(0)}%02x of ${bytes.length} bytes"))
    val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    expectedSchemaId.foreach { e =>
      if (id != e) throw new IllegalArgumentException(
        s"wire-format schema id $id does not match expected $e")
    }
    (id, java.util.Arrays.copyOfRange(bytes, 5, bytes.length))
  }

  /** Strip and validate the wire-format header; returns the Avro payload. */
  def unframeBytes(bytes: Array[Byte], expectedSchemaId: Option[Int] = None): Array[Byte] =
    decodeFrame(bytes, expectedSchemaId)._2

  /** Schema id carried in a framed value (header validation included). */
  def schemaIdOf(bytes: Array[Byte]): Int = decodeFrame(bytes, None)._1

  /** S7 with registry framing: [[serialize]] then prepend the wire-format
    * header — what `AvroConverter.fromConnectData` puts on the topic. */
  def serializeFramed(df: DataFrame, cols: Seq[String], schemaId: Int,
      valueCol: String = "avro_value"): DataFrame =
    serialize(df, cols, valueCol)
      .withColumn(valueCol, concat(lit(wireHeader(schemaId)), col(valueCol)))

  /** S6 with registry framing: validate + strip the header, then decode.
    * Bare (unframed) Avro fails loudly, not as silently-garbled rows. */
  def deserializeFramed(df: DataFrame, valueCol: String, structSchema: StructType,
      structCol: String = "value_struct",
      expectedSchemaId: Option[Int] = None): DataFrame =
    deserializeWith(df, valueCol, structSchema, structCol)(
      unframeBytes(_, expectedSchemaId))

  /** S6 with error tolerance (`errors.tolerance=all` analogue, see
    * [[ErrorTolerance]]): a value that fails framing or Avro decode
    * yields a null struct plus the error in `errorCol` instead of
    * failing the task — split downstream with `errorCol IS NULL` for
    * the clean/DLQ sides. NULL inputs stay null-struct, null-error
    * (tombstones are not errors). */
  def deserializeTolerant(df: DataFrame, valueCol: String, structSchema: StructType,
      structCol: String = "value_struct", errorCol: String = "_decode_error",
      framed: Boolean = false, expectedSchemaId: Option[Int] = None): DataFrame =
    deserializeWith(df, valueCol, structSchema, structCol, tolerant = Some(errorCol))(
      bytes => if (framed) unframeBytes(bytes, expectedSchemaId) else bytes)
}
