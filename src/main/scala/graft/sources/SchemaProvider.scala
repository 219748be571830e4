package graft.sources

import org.apache.avro.{Schema, SchemaCompatibility}

/** Pluggable schema-id → writer-schema lookup — the seam where a real
  * Confluent Schema Registry client plugs in (reference `main.sh:72-75`
  * wires `AvroConverter` + `SCHEMA_REGISTRY_URL`; the REST surface is
  * `GET /schemas/ids/<id>`). The offline harness uses [[SchemaProvider.ofMap]]
  * over caller-assigned ids; a deployment with network access drops in an
  * HTTP-backed implementation without touching any deserialization code
  * ([[AvroSerde.deserializeRegistryWith]] takes the trait).
  *
  * Contract:
  *  - implementations must be `Serializable`: lookups run inside executor
  *    tasks. [[AvroSerde]] caches the resolved reader per (partition,
  *    schema id), so `schemaFor` is hit once per id per partition — a
  *    REST-backed provider still wants its own small id → schema cache to
  *    survive task retries cheaply.
  *  - unknown ids throw `IllegalArgumentException` (the registry-miss
  *    contract — decode must fail loudly, not garble).
  */
trait SchemaProvider extends Serializable {

  /** Writer schema JSON for a registry schema id; throws
    * `IllegalArgumentException` for ids this provider cannot resolve. */
  def schemaFor(id: Int): String
}

object SchemaProvider {

  /** The offline-harness provider: a fixed id → schema-JSON map. */
  def ofMap(writers: Map[Int, String]): SchemaProvider = new SchemaProvider {
    def schemaFor(id: Int): String = writers.getOrElse(id,
      throw new IllegalArgumentException(
        s"no writer schema registered for schema id $id " +
          s"(have ${writers.keys.toSeq.sorted.mkString(",")})"))
  }

  /** Wrap a provider with the registry's compatibility gate: every schema
    * it serves must be Avro read-compatible with `readerSchemaJson`
    * (build it with [[AvroSerde.avroSchemaFor]]), or the lookup throws
    * with the incompatibilities spelled out — the engine analogue of the
    * registry's `POST /compatibility` check rejecting a producer whose
    * schema the consumers could not read. Checked once per id (the
    * result is as cacheable as the schema itself — AvroSerde's
    * per-partition reader cache gives that for free). */
  def validated(inner: SchemaProvider, readerSchemaJson: String): SchemaProvider =
    new SchemaProvider {
      def schemaFor(id: Int): String = {
        val writerJson = inner.schemaFor(id)
        val errs = compatibilityErrors(writerJson, readerSchemaJson)
        if (errs.nonEmpty) throw new IllegalArgumentException(
          s"schema id $id is not read-compatible with the reader schema: " +
            errs.mkString("; "))
        writerJson
      }
    }

  /** Avro reader/writer compatibility check (the registry's BACKWARD
    * mode): empty = data written with `writerJson` is readable with
    * `readerJson`; otherwise one message per incompatibility. */
  def compatibilityErrors(writerJson: String, readerJson: String): Seq[String] = {
    val writer = new Schema.Parser().parse(writerJson)
    val reader = new Schema.Parser().parse(readerJson)
    import scala.jdk.CollectionConverters._
    SchemaCompatibility.checkReaderWriterCompatibility(reader, writer)
      .getResult.getIncompatibilities.asScala.toSeq
      .map(i => s"${i.getType} at ${i.getLocation}: ${i.getMessage}")
  }
}
