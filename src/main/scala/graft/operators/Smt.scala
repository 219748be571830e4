package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference stack's per-record transform catalog (Single Message
  * Transforms), re-expressed as composable DataFrame transforms
  * (SURVEY §2.2 P1-P14). The Connect framework the reference installs
  * (reference `Dockerfile:4`) applies these one record at a time inside a
  * connector task; here each is a declarative column expression, so
  * Catalyst can fuse whole chains into a single whole-stage-codegen'd
  * project/filter over the scan — per-record interpretation becomes
  * vectorized batch execution for free.
  *
  * All functions are `DataFrame => DataFrame` (or `Column` helpers) and
  * compose with `df.transform(...)`.
  */
object Smt {

  /** Column lookup by LITERAL name: `col("a.b")` parses as a nested
    * path, so every SMT that takes user-supplied column names routes
    * through backtick quoting — Connect column names carry dots
    * routinely. */
  private def qcol(name: String): Column = col(graft.SqlIdent.bq(name))

  /** P1 — project: choose columns. */
  def project(cols: String*)(df: DataFrame): DataFrame = df.select(cols.map(qcol): _*)

  /** P2 — Filter SMT with predicate. Tombstone test = value IS NULL. */
  def filterRecords(pred: Column)(df: DataFrame): DataFrame = df.where(pred)
  def isTombstone(valueCol: String): Column = col(valueCol).isNull
  def topicNameMatches(topicCol: String, regex: String): Column = col(topicCol).rlike(regex)
  def hasHeaderKey(headersCol: String, key: String): Column =
    exists(col(headersCol), h => h.getField("key") === key)

  /** P3 — Cast: cast named fields to target types. */
  def castFields(casts: (String, DataType)*)(df: DataFrame): DataFrame =
    casts.foldLeft(df) { case (d, (f, t)) => d.withColumn(f, qcol(f).cast(t)) }

  /** P4 — ExtractField: pull one field out of a struct column. */
  def extractField(structCol: String, field: String, as: String)(df: DataFrame): DataFrame =
    df.withColumn(as, qcol(structCol).getField(field))

  /** P5 — Flatten: recursively flatten struct columns with a delimiter,
    * like the Connect `Flatten` SMT. Non-struct columns pass through.
    * Columns are addressed by getField chains from the root, never by a
    * dotted path string — a literal column named "a.b" would otherwise
    * resolve to (or shadow) the nested field a.b. */
  def flatten(delimiter: String = "_")(df: DataFrame): DataFrame = {
    def walk(c: Column, dt: DataType, path: Seq[String]): Seq[Column] = dt match {
      case inner: StructType => inner.fields.toSeq.flatMap(f =>
        walk(c.getField(f.name), f.dataType, path :+ f.name))
      case _ => Seq(c.alias(path.mkString(delimiter)))
    }
    df.select(df.schema.fields.toSeq.flatMap(f =>
      walk(df(s"`${f.name.replace("`", "``")}`"), f.dataType, Seq(f.name))): _*)
  }

  /** P6 — HoistField: wrap the listed columns into a single struct field.
    * Fails loudly when `fieldName` collides with a column that is NOT
    * being hoisted — silently emitting two same-named columns would
    * poison every downstream reference as ambiguous. */
  def hoistField(fieldName: String, cols: String*)(df: DataFrame): DataFrame = {
    val rest = df.columns.filterNot(cols.contains)
    require(!rest.contains(fieldName),
      s"hoistField: output field '$fieldName' collides with an existing " +
        "column not being hoisted — rename one or include it in the hoist")
    val hoisted = struct(cols.map(qcol): _*).alias(fieldName)
    df.select(rest.map(qcol) :+ hoisted: _*)
  }

  /** P7 — InsertField: add a static or metadata-derived field. */
  def insertField(name: String, value: Column)(df: DataFrame): DataFrame =
    df.withColumn(name, value)

  /** P8 — MaskField: null out, or replace with a fixed literal. */
  def maskFields(replacement: Option[Column], fields: String*)(df: DataFrame): DataFrame =
    fields.foldLeft(df) { (d, f) =>
      d.withColumn(f, replacement.getOrElse(lit(null)).cast(d.schema(f).dataType))
    }

  /** P9 — ReplaceField: rename / drop / allowlist. */
  def renameFields(renames: (String, String)*)(df: DataFrame): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
  def dropFields(fields: String*)(df: DataFrame): DataFrame = df.drop(fields: _*)
  def allowlistFields(fields: String*)(df: DataFrame): DataFrame = project(fields: _*)(df)

  /** P10 — RegexRouter: rewrite a topic/route column by regex. */
  def regexRoute(topicCol: String, regex: String, replacement: String)(df: DataFrame): DataFrame =
    df.withColumn(topicCol, regexp_replace(col(topicCol), regex, replacement))

  /** P11 — TimestampRouter: derive route from record timestamp.
    * `topicFormat` carries Connect's `${topic}`/`${timestamp}`
    * placeholders (default `${topic}-${timestamp}`, the SMT's default);
    * `fmt` is the timestamp pattern (`timestamp.format`). */
  def timestampRoute(topicCol: String, tsCol: String, fmt: String, as: String,
      topicFormat: String = "${topic}-${timestamp}")(df: DataFrame): DataFrame = {
    val token = "\\$\\{topic\\}|\\$\\{timestamp\\}".r
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    var idx = 0
    for (m <- token.findAllMatchIn(topicFormat)) {
      if (m.start > idx) pieces += lit(topicFormat.substring(idx, m.start))
      pieces += (if (m.matched == "${topic}") col(topicCol)
                 else date_format(col(tsCol), fmt))
      idx = m.end
    }
    if (idx < topicFormat.length) pieces += lit(topicFormat.substring(idx))
    df.withColumn(as,
      if (pieces.isEmpty) lit(topicFormat) else concat(pieces.toSeq: _*))
  }

  /** P12 — TimestampConverter: unix seconds / formatted string / Timestamp.
    * `timestamp_seconds`, never to_timestamp(from_unixtime(_)): the
    * string round-trip goes through session-local wall-clock time, which
    * collapses the repeated hour of a DST fall-back under any non-UTC
    * session timezone (two instants, one string) — and costs two
    * conversions instead of none. */
  def unixToTimestamp(c: Column): Column = timestamp_seconds(c)
  def timestampToUnix(c: Column): Column = unix_timestamp(c)
  def timestampToString(c: Column, fmt: String): Column = date_format(c, fmt)
  def stringToTimestamp(c: Column, fmt: String): Column = to_timestamp(c, fmt)

  /** P13 — ValueToKey: copy fields from the value into a struct key. */
  def valueToKey(keyName: String, fields: String*)(df: DataFrame): DataFrame =
    df.withColumn(keyName, struct(fields.map(qcol): _*))

  /** P13b — SetSchemaMetadata (stock Connect SMT, `$Value` form): tag
    * the VALUE schema with a name and/or version. Relationally the value
    * schema is the frame's value columns, so the tag lands in each value
    * column's `StructField.metadata` — a pure schema annotation, no data
    * touched. The tag survives writes that persist the Spark schema
    * (parquet footer, saveAsTable) and is read back via
    * [[schemaMetadataOf]]; the schema-carrying wire serde emits it on
    * the wire ([[graft.sources.JsonSchemaSerde.serialize]] name +
    * version). Operations that rebuild columns from scratch drop
    * column metadata (standard Spark behavior) — apply this SMT last in
    * a chain, exactly where Connect users put it. */
  val SchemaNameKey = "connect.schema.name"
  val SchemaVersionKey = "connect.schema.version"
  def setSchemaMetadata(schemaName: Option[String], schemaVersion: Option[Int],
      metaCols: Set[String] = Set.empty)(df: DataFrame): DataFrame = {
    require(schemaName.isDefined || schemaVersion.isDefined,
      "setSchemaMetadata needs schema.name and/or schema.version")
    df.select(df.schema.fields.toSeq.map { f =>
      val c = qcol(f.name)
      if (metaCols.contains(f.name)) c
      else {
        val mb = new MetadataBuilder().withMetadata(f.metadata)
        schemaName.foreach(mb.putString(SchemaNameKey, _))
        schemaVersion.foreach(v => mb.putLong(SchemaVersionKey, v.toLong))
        c.as(f.name, mb.build())
      }
    }: _*)
  }

  /** Read back the [[setSchemaMetadata]] tag from the frame's value
    * columns: (schema name, schema version), either half None when
    * untagged. */
  def schemaMetadataOf(df: DataFrame,
      metaCols: Set[String] = Set.empty): (Option[String], Option[Long]) = {
    val valueFields = df.schema.fields.filterNot(f => metaCols.contains(f.name))
    (valueFields.collectFirst {
       case f if f.metadata.contains(SchemaNameKey) =>
         f.metadata.getString(SchemaNameKey)
     },
     valueFields.collectFirst {
       case f if f.metadata.contains(SchemaVersionKey) =>
         f.metadata.getLong(SchemaVersionKey)
     })
  }

  /** P14 — header ops over `headers: array<struct<key:string,value:...>>`
    * (the Kafka source's header schema). */
  def insertHeader(headersCol: String, key: String, value: Column)(df: DataFrame): DataFrame =
    df.withColumn(headersCol,
      array_append(coalesce(col(headersCol), array()),
        struct(lit(key).alias("key"), value.alias("value"))))
  def dropHeaders(headersCol: String, keys: String*)(df: DataFrame): DataFrame = {
    val keyArr = array(keys.map(lit): _*)
    df.withColumn(headersCol,
      filter(col(headersCol), h => !array_contains(keyArr, h.getField("key"))))
  }
  def headerFrom(headersCol: String, key: String, as: String)(df: DataFrame): DataFrame =
    df.withColumn(as,
      element_at(filter(col(headersCol), h => h.getField("key") === key), 1).getField("value"))
}
