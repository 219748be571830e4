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

  /** REST-backed provider speaking the public Confluent Schema Registry
    * wire shape: `GET {baseUrl}/schemas/ids/{id}` returning
    * `{"schema": "<schema json>"}` (the endpoint the reference's
    * `SCHEMA_REGISTRY_URL`, `main.sh:15`, points every converter at).
    * HTTP 404 maps to the registry-miss `IllegalArgumentException`
    * contract; any other non-200 (auth, proxy, 5xx) throws with the
    * status spelled out — decode must fail loudly, not garble.
    *
    * Scale shape: the instance is Serializable (the client state is all
    * rebuilt lazily executor-side) and keeps a per-JVM id → schema cache,
    * so each executor hits the registry once per schema id — the same
    * access pattern as Confluent's own CachedSchemaRegistryClient. Ids
    * are immutable in a registry, so the cache never invalidates. */
  def rest(baseUrl: String, timeoutMs: Int = 10000): SchemaProvider =
    new RestSchemaProvider(baseUrl, timeoutMs)

  private final class RestSchemaProvider(baseUrl: String, timeoutMs: Int)
      extends SchemaProvider {
    // transient: rebuilt empty on each executor after deserialization
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    def schemaFor(id: Int): String = {
      val hit = cache.get(id)
      if (hit != null) return hit
      val url = java.net.URI.create(s"${baseUrl.stripSuffix("/")}/schemas/ids/$id").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestProperty("Accept",
        "application/vnd.schemaregistry.v1+json, application/json")
      try {
        val status = conn.getResponseCode
        if (status == 404) throw new IllegalArgumentException(
          s"schema id $id not found in registry at $baseUrl (HTTP 404)")
        if (status != 200) throw new RuntimeException(
          s"registry $baseUrl returned HTTP $status for schema id $id")
        val body = new String(conn.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        // the response envelope is flat ({"schema": "..."}); the schema
        // string itself is an escaped JSON document inside it
        val schema = ConnectorConfig.parseFlatJson(body).getOrElse("schema",
          throw new RuntimeException(
            s"registry response for id $id has no 'schema' field: $body"))
        cache.put(id, schema)
        schema
      } finally conn.disconnect()
    }
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
