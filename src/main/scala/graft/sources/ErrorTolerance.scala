package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Connect's `errors.tolerance=all` + dead-letter-queue analogue
  * (framework capability of the reference's base image, `Dockerfile:4`;
  * SURVEY §1.2 maps it to permissive parsing with a corrupt-record
  * column). A malformed value must neither kill the job (FAILFAST) nor
  * silently become NULL — it lands in a quarantine frame carrying the
  * raw payload, so the pipeline keeps flowing and the bad records stay
  * auditable/replayable.
  *
  * Scale: permissive `from_json` is a per-row projection (no shuffle,
  * stays in codegen); the clean/quarantine split is two filters over the
  * same parsed frame, which a single-pass sink (foreachBatch writing
  * main + DLQ) shares one scan for.
  */
object ErrorTolerance {

  /** Parse a JSON string/binary column permissively: the result struct
    * `structCol` gains `corruptCol` (STRING), null for clean rows and
    * holding the raw text for malformed ones. NULL inputs stay NULL —
    * a tombstone is not an error (Connect's RecordIsTombstone is a
    * separate predicate, SURVEY §2.2 P2). */
  def tolerantJson(df: DataFrame, valueCol: String, schema: StructType,
      structCol: String = "parsed",
      corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already has a $corruptCol field")
    val full = schema.add(StructField(corruptCol, StringType))
    val raw = col(valueCol).cast(StringType)
    val parsed = from_json(raw, full,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol))
    // blank non-null input is corrupt, not clean: from_json SKIPS empty/
    // whitespace-only strings — it returns a NULL struct with no corrupt
    // marker (verified on this Spark build), which would smuggle an
    // unparseable record through as an all-null clean row — exactly the
    // silent-NULL outcome this module exists to prevent. The quarantine
    // struct is built explicitly (withField on a null struct is null).
    // NULL input stays a clean tombstone.
    val blankCorrupt = struct(
      schema.fields.map(f => lit(null).cast(f.dataType).alias(f.name))
        :+ raw.alias(corruptCol): _*)
    // trim with an explicit charset: Spark's one-arg trim strips ONLY
    // 0x20 spaces, so a "\t"/"\n"-only payload would dodge this guard
    // and smuggle through as an all-null clean row
    df.withColumn(structCol,
      when(raw.isNotNull && trim(raw, " \t\r\n") === "", blankCorrupt)
        .otherwise(parsed))
  }

  /** True for rows [[tolerantJson]] marked corrupt. */
  def isCorrupt(structCol: String,
      corruptCol: String = "_corrupt_record"): Column =
    col(s"$structCol.$corruptCol").isNotNull

  /** The clean side: parsed fields replace the struct, corrupt marker
    * dropped. NULL-input rows (tombstones) pass through with null
    * payload fields. */
  def clean(parsed: DataFrame, structCol: String = "parsed",
      corruptCol: String = "_corrupt_record"): DataFrame =
    parsed.where(!coalesce(isCorrupt(structCol, corruptCol), lit(false)))
      .withColumn(structCol, col(structCol).dropFields(corruptCol))

  /** The DLQ side: every corrupt row with its raw payload under
    * `rawCol`, all envelope/context columns preserved for replay. */
  def quarantine(parsed: DataFrame, structCol: String = "parsed",
      corruptCol: String = "_corrupt_record",
      rawCol: String = "raw"): DataFrame =
    parsed.where(coalesce(isCorrupt(structCol, corruptCol), lit(false)))
      .withColumn(rawCol, col(s"$structCol.$corruptCol"))
      .drop(structCol)
}
