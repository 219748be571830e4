package graft.operators

import graft.sources.ConnectorConfig.Config
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CONFIG-DRIVEN assembly of the SMT catalog (SURVEY §2.2): parse the
  * Kafka Connect transform-chain property grammar —
  *
  * {{{
  * transforms=route,mask
  * transforms.route.type=org.apache.kafka.connect.transforms.RegexRouter
  * transforms.route.regex=(.*)
  * transforms.route.replacement=$1-out
  * transforms.mask.type=org.apache.kafka.connect.transforms.MaskField$Value
  * transforms.mask.fields=secret
  * predicates=clicks
  * predicates.clicks.type=...predicates.TopicNameMatches
  * predicates.clicks.pattern=click.*
  * }}}
  *
  * — into one composed `DataFrame => DataFrame` over the engine's
  * unwrapped record frame. This is the reference stack's actual user
  * surface: a Connect operator configures SMTs as properties
  * (reference `main.sh:148-159` submits exactly such flat JSON), never
  * as code, so "hand the engine your connector config" requires this
  * parser on top of the per-transform catalog in [[Smt]]. Chains fuse
  * into a single whole-stage-codegen'd projection exactly like
  * hand-composed [[Smt]] calls (they ARE the same calls — parity-tested
  * in SmtAlgebraSpec).
  *
  * Record model: the unwrapped envelope frame — Connect record METADATA
  * lives in the `topic` / `partition` / `offset` / `timestamp` /
  * `headers` / `key` columns (when present), every other column is a
  * VALUE field. `$Value`-suffixed (and suffix-less) transform classes
  * operate on the value columns; `$Key` variants are rejected with a
  * pointed error — the engine keys records explicitly via `ValueToKey`
  * rather than mutating a serialized key in place.
  *
  * Honest scope notes (each rejects loudly, never silently skips):
  *  - `transforms.X.predicate` is supported on `Filter` (the dominant
  *    Connect use: conditional drop, with `negate`). On schema-CHANGING
  *    transforms, Connect's per-record "apply or pass through unchanged"
  *    has no relational equivalent (one frame, one schema) — configs
  *    asking for it are errors here.
  *  - `RegexRouter` keeps Connect's full-match `Matcher.matches`
  *    semantics (the pattern is anchored; a non-matching topic passes
  *    through unchanged).
  */
object SmtChain {

  /** Connect record-metadata columns (those present in the frame are
    * excluded from every value-field operation). */
  val MetaCols: Seq[String] =
    Seq("topic", "partition", "offset", "timestamp", "headers", "key")

  private def qcol(name: String): Column = col(graft.SqlIdent.bq(name))

  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Connect schema type names → Spark types (the `Cast` SMT's `spec`
    * vocabulary, public Connect API). */
  private def connectType(t: String): DataType = t match {
    case "int8" => ByteType
    case "int16" => ShortType
    case "int32" => IntegerType
    case "int64" => LongType
    case "float32" => FloatType
    case "float64" => DoubleType
    case "boolean" => BooleanType
    case "string" => StringType
    case "bytes" => BinaryType
    case other => throw new IllegalArgumentException(
      s"Cast: unknown Connect type '$other' (int8/16/32/64, float32/64, boolean, string, bytes)")
  }

  /** Strip the Connect package prefix and split the Key/Value suffix:
    * `org.apache.kafka.connect.transforms.MaskField$Value` →
    * ("MaskField", Some("Value")). Bare names work too. */
  private def simpleName(typ: String): (String, Option[String]) = {
    val base = typ.substring(typ.lastIndexOf('.') + 1)
    base.split('$') match {
      case Array(n) => (n, None)
      case Array(n, kv) => (n, Some(kv))
      case _ => throw new IllegalArgumentException(s"unparsable transform type '$typ'")
    }
  }

  /** Build the predicate Column for a configured predicate alias. */
  private def predicate(config: Config, alias: String, headersCol: String,
      topicCol: String, valueCols: DataFrame => Seq[String]): DataFrame => Column = {
    def req(key: String): String = config(s"predicates.$alias.$key").getOrElse(
      throw new IllegalArgumentException(s"predicate '$alias' needs predicates.$alias.$key"))
    val (name, _) = simpleName(config(s"predicates.$alias.type").getOrElse(
      throw new IllegalArgumentException(s"predicates.$alias.type missing")))
    name match {
      case "TopicNameMatches" =>
        val p = req("pattern"); _ => col(topicCol).rlike(s"^(?:$p)$$")
      case "HasHeaderKey" =>
        val k = req("name"); _ => Smt.hasHeaderKey(headersCol, k)
      case "RecordIsTombstone" =>
        df => valueCols(df).map(qcol(_).isNull).reduceOption(_ && _).getOrElse(lit(false))
      case other => throw new IllegalArgumentException(
        s"unknown predicate type '$other' (TopicNameMatches, HasHeaderKey, RecordIsTombstone)")
    }
  }

  /** Parse `config`'s `transforms` chain into one composed transform.
    * Aliases apply in list order, exactly like a Connect worker. */
  def fromConfig(config: Config, topicCol: String = "topic",
      headersCol: String = "headers", tsCol: String = "timestamp",
      keyCol: String = "key"): DataFrame => DataFrame = {
    val metaSet = (MetaCols.toSet - "key") + keyCol + topicCol + headersCol + tsCol
    def valueCols(df: DataFrame): Seq[String] =
      df.columns.toSeq.filterNot(metaSet.contains)
    val aliases = csv(config("transforms").getOrElse(""))
    val steps: Seq[DataFrame => DataFrame] = aliases.map { alias =>
      def opt(key: String): Option[String] = config(s"transforms.$alias.$key")
      def req(key: String): String = opt(key).getOrElse(
        throw new IllegalArgumentException(s"transform '$alias' needs transforms.$alias.$key"))
      val (name, kv) = simpleName(req("type"))
      if (kv.contains("Key")) throw new IllegalArgumentException(
        s"transform '$alias': \\$$Key variants are unsupported — the engine keys records " +
          "explicitly (ValueToKey / extractField), not by mutating a serialized key")
      val predAliasOpt = opt("predicate")
      if (predAliasOpt.isDefined && name != "Filter")
        throw new IllegalArgumentException(
          s"transform '$alias': per-record predicates are only supported on Filter — " +
            "a schema-changing transform cannot apply to half a relational frame")
      val step: DataFrame => DataFrame = name match {
        case "Filter" =>
          val predAlias = predAliasOpt.getOrElse(throw new IllegalArgumentException(
            s"transform '$alias': Filter needs transforms.$alias.predicate"))
          val negate = opt("negate").exists(_.toBoolean)
          val p = predicate(config, predAlias, headersCol, topicCol, valueCols)
          // Connect's Filter DROPS matching records (negate inverts).
          // A predicate evaluating NULL (rlike on a NULL topic) must
          // read as FALSE like Connect's boolean — under raw
          // three-valued logic the row would vanish from BOTH negate
          // settings instead of surviving exactly one
          df => {
            val matched = coalesce(p(df), lit(false))
            df.where(if (negate) matched else !matched)
          }
        case "ReplaceField" =>
          val renames = opt("renames").map(csv(_).map { r =>
            r.split(":") match {
              case Array(from, to) => (from, to)
              case _ => throw new IllegalArgumentException(
                s"transform '$alias': renames entries must be from:to, got '$r'")
            }
          }).getOrElse(Seq.empty)
          val exclude = opt("exclude").orElse(opt("blacklist")).map(csv).getOrElse(Seq.empty)
          val include = opt("include").orElse(opt("whitelist")).map(csv)
          df => {
            val dropped = Smt.dropFields(exclude: _*)(df)
            val kept = include match {
              case Some(fs) => // allowlist keeps metadata columns (Connect
                // only filters value fields) — renames apply afterwards
                dropped.select((dropped.columns.toSeq.filter(metaSet.contains)
                  ++ fs).map(qcol): _*)
              case None => dropped
            }
            Smt.renameFields(renames: _*)(kept)
          }
        case "MaskField" =>
          val fields = csv(req("fields"))
          val repl = opt("replacement").map(lit)
          Smt.maskFields(repl, fields: _*)
        case "InsertField" =>
          val static = opt("static.field").map { f =>
            (f, lit(req("static.value")))
          }
          val topicF = opt("topic.field").map(f => (f, col(topicCol)))
          val tsF = opt("timestamp.field").map(f => (f, col(tsCol)))
          val inserts = Seq(static, topicF, tsF).flatten
          if (inserts.isEmpty) throw new IllegalArgumentException(
            s"transform '$alias': InsertField needs static.field, topic.field or timestamp.field")
          df => inserts.foldLeft(df) { case (d, (f, v)) => Smt.insertField(f, v)(d) }
        case "ExtractField" =>
          val field = req("field")
          // Connect: the record value BECOMES value.field; metadata rides
          df => df.select((df.columns.toSeq.filter(metaSet.contains)
            .map(qcol) :+ qcol(field)): _*)
        case "HoistField" =>
          val field = req("field")
          df => Smt.hoistField(field, valueCols(df): _*)(df)
        case "Flatten" =>
          Smt.flatten(opt("delimiter").getOrElse("."))
        case "Cast" =>
          val casts = csv(req("spec")).map { c =>
            c.split(":") match {
              case Array(f, t) => (f, connectType(t))
              case _ => throw new IllegalArgumentException(
                s"transform '$alias': Cast spec entries must be field:type, got '$c'")
            }
          }
          Smt.castFields(casts: _*)
        case "RegexRouter" =>
          val regex = req("regex"); val repl = req("replacement")
          // full-match semantics (Matcher.matches + replaceFirst)
          df => df.withColumn(topicCol,
            regexp_replace(col(topicCol), s"^(?:$regex)$$", repl))
        case "TimestampRouter" =>
          val fmt = opt("timestamp.format").getOrElse("yyyyMMdd")
          val topicFormat = opt("topic.format").getOrElse("${topic}-${timestamp}")
          Smt.timestampRoute(topicCol, tsCol, fmt, topicCol, topicFormat)
        case "TimestampConverter" =>
          val field = req("field")
          val fmt = opt("format")
          val target = req("target.type")
          df => {
            val in = qcol(field)
            val dt = df.schema(field).dataType
            val converted = (target, dt) match {
              case ("unix", _: TimestampType) => Smt.timestampToUnix(in)
              case ("string", _: TimestampType) => Smt.timestampToString(in,
                fmt.getOrElse(throw new IllegalArgumentException(
                  s"transform '$alias': target.type=string needs format")))
              case ("Timestamp", _: LongType | _: IntegerType) => Smt.unixToTimestamp(in)
              case ("Timestamp", _: StringType) => Smt.stringToTimestamp(in,
                fmt.getOrElse(throw new IllegalArgumentException(
                  s"transform '$alias': string→Timestamp needs format")))
              case ("Timestamp", _: TimestampType) => in
              case (t, d) => throw new IllegalArgumentException(
                s"transform '$alias': unsupported TimestampConverter $d → target.type=$t")
            }
            df.withColumn(field, converted)
          }
        case "ValueToKey" =>
          val fields = csv(req("fields"))
          Smt.valueToKey(keyCol, fields: _*)
        case "SetSchemaMetadata" =>
          val name = opt("schema.name")
          val version = opt("schema.version").map(_.toInt)
          if (name.isEmpty && version.isEmpty) throw new IllegalArgumentException(
            s"transform '$alias': SetSchemaMetadata needs schema.name and/or schema.version")
          df => Smt.setSchemaMetadata(name, version, metaSet)(df)
        case "InsertHeader" =>
          val header = req("header"); val value = req("value.literal")
          Smt.insertHeader(headersCol, header, lit(value))
        case "DropHeaders" =>
          val keys = csv(req("headers"))
          Smt.dropHeaders(headersCol, keys: _*)
        case "HeaderFrom" =>
          val fields = csv(req("fields")); val headers = csv(req("headers"))
          require(fields.length == headers.length,
            s"transform '$alias': HeaderFrom needs equal-length fields and headers lists")
          val move = req("operation") match {
            case "copy" => false
            case "move" => true
            case other => throw new IllegalArgumentException(
              s"transform '$alias': HeaderFrom operation must be copy or move, got '$other'")
          }
          df => {
            val withHeaders = fields.zip(headers).foldLeft(df) { case (d, (f, h)) =>
              Smt.insertHeader(headersCol, h, qcol(f))(d)
            }
            if (move) Smt.dropFields(fields: _*)(withHeaders) else withHeaders
          }
        case other => throw new IllegalArgumentException(
          s"transform '$alias': unknown type '$other' — supported: Filter, ReplaceField, " +
            "MaskField, InsertField, ExtractField, HoistField, Flatten, Cast, RegexRouter, " +
            "TimestampRouter, TimestampConverter, ValueToKey, SetSchemaMetadata, " +
            "InsertHeader, DropHeaders, HeaderFrom")
      }
      step
    }
    df => steps.foldLeft(df)((d, f) => f(d))
  }
}
