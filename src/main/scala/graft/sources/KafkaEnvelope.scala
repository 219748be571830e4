package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka record-envelope modeling (SURVEY §2.1 S5). The reference wires a
  * Connect worker to SSL brokers (bootstrap at `main.sh:38-39`, SSL certs
  * `main.sh:26-33`, per-client SSL fan-out `main.sh:49-58`). The Spark
  * equivalent is `spark.readStream.format("kafka")` with `kafka.ssl.*`
  * options; the connector jar is not on this offline classpath, so this
  * module provides (a) the exact option-map builder a cluster deployment
  * would pass to the Kafka source, and (b) a batch/streaming stand-in
  * that presents any keyed, timestamped table in the Kafka source's fixed
  * envelope schema so every downstream operator (SMTs, serde, CDC) is
  * exercised against the real shape.
  */
object KafkaEnvelope {

  /** The Kafka source's fixed output schema. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType), StructField("value", BinaryType)))))))

  /** Option map for a real `format("kafka")` reader, mirroring the
    * reference's worker env: bootstrap (`main.sh:38-39`), TLS trust/key
    * material (`main.sh:41-47`), subscribe list.
    *
    * `security.protocol=SSL` is set when ANY ssl material is supplied —
    * a keystore-only caller (JVM default truststore) would otherwise
    * speak PLAINTEXT to an SSL broker and hang. Store passwords are
    * separate parameters from the key password: JKS/PKCS12 stores
    * require their own, and the reference env carries all three
    * (`main.sh:41-47`). */
  def sourceOptions(bootstrap: String, topics: Seq[String],
      sslTruststore: Option[String] = None, sslKeystore: Option[String] = None,
      sslKeyPassword: Option[String] = None,
      sslTruststorePassword: Option[String] = None,
      sslKeystorePassword: Option[String] = None,
      startingOffsets: String = "earliest"): Map[String, String] = {
    val sslBits = Map.empty[String, String] ++
      sslTruststore.map("kafka.ssl.truststore.location" -> _) ++
      sslTruststorePassword.map("kafka.ssl.truststore.password" -> _) ++
      sslKeystore.map("kafka.ssl.keystore.location" -> _) ++
      sslKeystorePassword.map("kafka.ssl.keystore.password" -> _) ++
      sslKeyPassword.map("kafka.ssl.key.password" -> _)
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> startingOffsets) ++
      (if (sslBits.nonEmpty) sslBits + ("kafka.security.protocol" -> "SSL")
       else Map.empty[String, String])
  }

  /** Batch stand-in: wrap a table as Kafka records — key = keyCol as
    * bytes, value = JSON of all columns as bytes. Partition = hash of the
    * key modulo `numPartitions` (the Kafka default partitioner's shape:
    * same key → same partition, records spread across partitions), offset
    * = per-partition monotonic position in (ts, key) order. The window
    * partitions by the derived partition column — N-way parallel, never
    * a single-partition shuffle — so the envelope semantics survive any
    * data size. Downstream code cannot tell this from a real topic scan. */
  def wrap(df: DataFrame, keyCol: String, tsCol: String, topic: String,
      numPartitions: Int = 32): DataFrame =
    envelope(df, df,
      keyBytes = col(keyCol).cast(StringType).cast(BinaryType),
      partKeys = Seq(col(keyCol)), tsCol = tsCol, topic = topic,
      numPartitions = numPartitions)

  /** The shared envelope projection: one definition of the Kafka record
    * shape (value JSON, partition, dense offsets, headers) so the
    * string-key and Avro-key wrap paths can never drift apart.
    * `payload` carries the original columns for the JSON value;
    * `keyed` may carry extra derived columns (e.g. encoded key bytes). */
  private def envelope(keyed: DataFrame, payload: DataFrame, keyBytes: org.apache.spark.sql.Column,
      partKeys: Seq[org.apache.spark.sql.Column], tsCol: String, topic: String,
      numPartitions: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = pmod(hash(partKeys: _*), lit(numPartitions))
    val w = Window.partitionBy(part).orderBy(col(tsCol) +: partKeys: _*)
    keyed.select(
      keyBytes.alias("key"),
      to_json(struct(payload.columns.map(col): _*), jsonOpts).cast(BinaryType).alias("value"),
      lit(topic).alias("topic"),
      part.cast(IntegerType).alias("partition"),
      (row_number().over(w) - 1).cast(LongType).alias("offset"),
      col(tsCol).cast(TimestampType).alias("timestamp"),
      lit(0).alias("timestampType"),
      array(struct(lit("origin").alias("key"),
        lit(topic).cast(BinaryType).alias("value"))).alias("headers"))
  }

  /** [[wrap]] with a registry-framed Avro key: the reference Avro-encodes
    * record KEYS as well as values (`CONNECT_KEY_CONVERTER`,
    * `main.sh:72`), so a key is a framed Avro struct of the key columns,
    * not stringified bytes. Partitioning/offsets keep [[wrap]]'s contract:
    * same key → same partition, dense per-partition offsets in
    * (ts, key...) order. Decode with [[unwrapAvroKey]]. */
  def wrapAvroKey(df: DataFrame, keyCols: Seq[String], tsCol: String,
      topic: String, numPartitions: Int = 32, keySchemaId: Int = 1): DataFrame = {
    require(keyCols.nonEmpty, "wrapAvroKey needs at least one key column")
    val enc = AvroSerde.serializeFramed(df, keyCols, keySchemaId, "__key_avro")
    envelope(enc, df,
      keyBytes = col("__key_avro"),
      partKeys = keyCols.map(col), tsCol = tsCol, topic = topic,
      numPartitions = numPartitions)
  }

  /** Decode a framed-Avro key column back into a struct column — the
    * key-converter consume path. */
  def unwrapAvroKey(env: DataFrame, keySchema: StructType,
      structCol: String = "key_struct",
      expectedSchemaId: Option[Int] = None): DataFrame =
    AvroSerde.deserializeFramed(env, "key", keySchema, structCol, expectedSchemaId)

  /** Microsecond-precision timestamp JSON format: the default `to_json`
    * pattern keeps only millis, which would silently truncate the µs
    * event timestamps on the wrap/unwrap round-trip. */
  private val jsonOpts = Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

  /** Decode the JSON value payload back to columns (S8 schemaless-JSON
    * path, reference `main.sh:78-81`). The consumed binary `value` column
    * is dropped — like a Connect converter replacing bytes with the
    * structured record — and any other envelope column shadowed by a
    * payload field name (e.g. a payload `timestamp`) is dropped too:
    * record fields win over transport metadata, and keeping both would
    * make every later reference ambiguous. */
  def unwrapJson(df: DataFrame, valueSchema: StructType, valueCol: String = "value"): DataFrame = {
    val payloadNames = valueSchema.fieldNames.map(_.toLowerCase).toSet
    val rest = df.columns.filterNot(c =>
      c == valueCol || payloadNames(c.toLowerCase))
    // uniquified temp column (same pattern as JsonSchemaSerde): a fixed
    // "__v" would silently replace a caller's column of that name
    val tmp = Iterator.from(0).map(i => s"__v$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(tmp, from_json(col(valueCol).cast(StringType), valueSchema, jsonOpts))
      .select(rest.map(col) :+ col(s"$tmp.*"): _*)
  }
}
