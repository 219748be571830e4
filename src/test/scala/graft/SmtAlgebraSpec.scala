package graft

import graft.functions.{VectorFunctions => VF}
import graft.operators.Smt
import graft.sources.KafkaEnvelope
import org.apache.spark.sql.functions._

/** SMT algebra + envelope + vector-function properties (SURVEY §2.2,
  * §2.9 L3): the invariants that make the composable transforms safe to
  * chain, and the float/quantized cosine agreement. */
class SmtAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")

  test("S8: unwrapJson preserves a caller column named __v (temp-name uniquified)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))
    val df = Seq(("""{"k": 7}""", "keep-me")).toDF("value", "__v")
    val out = KafkaEnvelope.unwrapJson(df, schema)
    assert(out.columns.toSet === Set("__v", "k"))
    assert(out.select($"__v").as[String].collect() === Array("keep-me"))
    assert(out.select($"k").as[Long].collect() === Array(7L))
  }

  test("P11: timestampRoute honors Connect ${topic}/${timestamp} placeholders") {
    val df = Seq(("events", java.sql.Timestamp.from(
      java.time.Instant.parse("2024-03-05T00:00:00Z")))).toDF("topic", "ts")
    val custom = df.transform(Smt.timestampRoute("topic", "ts", "yyyyMMdd", "route",
      topicFormat = "archive-${timestamp}-x-${topic}"))
    assert(custom.select($"route").as[String].collect() === Array("archive-20240305-x-events"))
    // default format = Connect's ${topic}-${timestamp}
    val dflt = df.transform(Smt.timestampRoute("topic", "ts", "yyyy-MM-dd", "route"))
    assert(dflt.select($"route").as[String].collect() === Array("events-2024-03-05"))
  }

  test("P5/P6: flatten ∘ hoist restores the flat column set") {
    val out = df.transform(Smt.hoistField("nested", "name", "v"))
      .transform(Smt.flatten("_"))
    assert(out.columns.toSet === Set("id", "nested_name", "nested_v"))
    assert(out.select("nested_v").as[Double].collect().sorted === Array(10.0, 20.0))
  }

  test("P5: flatten treats a literal dotted column as a column, not a path") {
    // a column literally named "a.b" next to a struct a{b} — the dotted
    // col() path form would resolve both to the struct's field
    val tricky = Seq((7L, 1L, 9L)).toDF("a.b", "x", "y")
      .transform(Smt.hoistField("a", "x", "y"))
    val out = tricky.transform(Smt.flatten("_"))
    assert(out.columns.toSet === Set("a.b", "a_x", "a_y"))
    assert(out.select(col("`a.b`")).as[Long].head() === 7L)
    assert(out.select($"a_x").as[Long].head() === 1L)
  }

  test("P6: hoistField fails loudly on a name collision with a kept column") {
    val e = intercept[IllegalArgumentException](
      df.transform(Smt.hoistField("name", "v"))) // "name" stays un-hoisted
    assert(e.getMessage.contains("collides"))
  }

  test("P12: unixToTimestamp is the exact epoch mapping (no wall-clock round-trip)") {
    val out = Seq(0L, 1667725200L).toDF("s")
      .select(unix_timestamp(Smt.unixToTimestamp($"s")).as("rt"))
      .as[Long].collect()
    assert(out === Array(0L, 1667725200L))
  }

  test("J8: NULL-keyed / NULL-ts right rows never become an as-of match") {
    import java.sql.Timestamp
    val t = (s: String) => Timestamp.valueOf(s)
    val left = Seq((1L, t("2024-01-01 10:00:00"), "L1"),
      (2L, t("2024-01-01 10:00:00"), "L2")).toDF("k", "ts", "tag")
    val right = Seq(
      (Some(1L), Option(t("2024-01-01 09:00:00")), 100.0), // real match for k=1
      (Some(1L), None, 666.0),                             // NULL ts: never matches
      (None, Option(t("2024-01-01 09:00:00")), 777.0)      // NULL key: never matches
    ).toDF("k", "ts", "p")
    val out = graft.operators.Joins.asofJoin(left, right, "k", "ts", "ts", Seq("p"))
      .select($"tag", $"p").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("L1") === Some(100.0)) // not 666 (null-ts row sorts first unfiltered)
    assert(out("L2") === None)        // no right rows for k=2 → NULL payload
  }

  test("J8c: bucketed as-of equals the plain as-of on hot keys, bucket boundaries, empty buckets") {
    import java.sql.Timestamp
    // adversarial fixture: one HOT key with right rows clustered so some
    // buckets are empty (the carry-in must skip them), left rows exactly
    // ON bucket boundaries and AT right timestamps (<= semantics), a key
    // with left rows before any right row, and NULL key/ts rows
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val t = (m: Long) => new Timestamp(base + m * 60000L)
    val left = ((1 to 200).map(i => (Some(7L), Option(t(i * 7L)), i.toLong)) ++
      Seq((Some(8L), Option(t(5L)), 900L),   // before any right row for k=8
        (Some(7L), Option(t(0L)), 901L),     // at the very first instant
        (None, Option(t(50L)), 902L),        // NULL key
        (Some(7L), None, 903L)))             // NULL ts
      .toDF("k", "ts", "lid")
    val right = ((1 to 40).map(i => (Some(7L), Option(t(i * 29L)), i * 1.0)) ++
      Seq((Some(8L), Option(t(100L)), 800.0),
        (Some(7L), None, 666.0), (None, Option(t(1L)), 777.0)))
      .toDF("k", "ts", "p")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"lid", $"p").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val plain = norm(graft.operators.Joins.asofJoin(left, right, "k", "ts", "ts", Seq("p")))
    // bucket width 10 min: right rows every 29 min leave empty buckets
    for (bucketSeconds <- Seq(600L, 3600L, 1L)) {
      val bucketed = norm(graft.operators.Joins.asofJoinBucketed(
        left, right, "k", "ts", "ts", Seq("p"), bucketSeconds))
      assert(bucketed === plain, s"divergence at bucketSeconds=$bucketSeconds")
    }
    assert(plain.size === 204 && plain(900L).isEmpty && plain(902L).isEmpty && plain(903L).isEmpty)
  }

  test("J8c: caller columns named __b/__m/__vin survive the bucketed as-of (temp names uniquify)") {
    import java.sql.Timestamp
    // the first cut hardcoded its temp columns: withColumn("__b", ...)
    // REPLACED a caller's __b and the final select emitted bucket ids as
    // that column's data — silent corruption. Temp names now uniquify.
    val t = (m: Long) => new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + m * 60000L)
    val left = Seq((1L, t(10), "keepB", "keepM", "keepV"), (1L, t(90), "b2", "m2", "v2"))
      .toDF("k", "ts", "__b", "__m", "__vin")
    val right = Seq((1L, t(5), 10.0), (1L, t(60), 60.0)).toDF("k", "ts", "p")
    val out = graft.operators.Joins.asofJoinBucketed(left, right, "k", "ts", "ts", Seq("p"), 600L)
    assert(out.columns.toSeq === Seq("k", "ts", "__b", "__m", "__vin", "p"))
    val rows = out.orderBy($"ts").collect()
    assert(rows.map(_.getString(2)).toSeq === Seq("keepB", "b2"), "caller __b corrupted")
    assert(rows.map(_.getString(3)).toSeq === Seq("keepM", "m2"), "caller __m corrupted")
    assert(rows.map(_.getString(4)).toSeq === Seq("keepV", "v2"), "caller __vin corrupted")
    assert(rows.map(_.getDouble(5)).toSeq === Seq(10.0, 60.0), "as-of payload wrong")
  }

  test("P9: rename ∘ rename composes; allowlist ∘ drop consistent") {
    val out = df.transform(Smt.renameFields("v" -> "x"))
      .transform(Smt.renameFields("x" -> "y"))
    assert(out.columns.contains("y") && !out.columns.contains("v"))
    val a = df.transform(Smt.dropFields("v")).columns.toSet
    val b = df.transform(Smt.allowlistFields("id", "name")).columns.toSet
    assert(a === b)
  }

  test("P14: insertHeader then headerFrom reads the value back; dropHeaders removes it") {
    val withH = Seq((1L, "x")).toDF("id", "s")
      .withColumn("headers", array())
      .transform(Smt.insertHeader("headers", "route", lit("r1").cast("binary")))
    val read = withH.transform(Smt.headerFrom("headers", "route", "out"))
      .select(col("out").cast("string")).as[String].head()
    assert(read === "r1")
    val dropped = withH.transform(Smt.dropHeaders("headers", "route"))
      .select(size(col("headers"))).as[Int].head()
    assert(dropped === 0)
  }

  test("S5: wrap spreads keys across partitions and keeps key→partition stable") {
    val data = (0 until 1000).map(i => (i.toLong % 50, java.sql.Timestamp.valueOf(
      f"2024-01-01 00:${i % 60}%02d:00"), s"v$i")).toDF("k", "ts", "v")
    val env = KafkaEnvelope.wrap(data, "k", "ts", "t", numPartitions = 8)
    val parts = env.select($"partition").distinct().as[Int].collect()
    assert(parts.length > 1, "all rows in one partition — scale bug")
    val perKey = env.select($"key".cast("string"), $"partition").distinct()
      .groupBy("key").count().agg(max("count")).as[Long].head()
    assert(perKey === 1L, "a key mapped to >1 partition")
  }

  test("L3: native cosine_f32 matches the HOF cosine and works from SQL text") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001).limit(50)
      .select(col("vec_id"), col("embedding"))
    val both = vecs.as("a").join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(VF.cosine(col("a.embedding"), col("b.embedding")).as("hof"),
        VF.cosineNative(col("a.embedding"), col("b.embedding")).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    // SQL-text path through the SparkSessionExtensions registration
    vecs.createOrReplaceTempView("emb_native_test")
    val viaSql = spark.sql(
      """SELECT cosine_f32(a.embedding, b.embedding) c
        |FROM emb_native_test a JOIN emb_native_test b ON b.vec_id = a.vec_id + 1""".stripMargin)
      .collect()
    assert(viaSql.nonEmpty && viaSql.forall(r => !r.isNullAt(0)))
  }

  test("L3: native cosine_q64 is bit-identical to the HOF fold (incl. mismatch/null → NULL)") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001).limit(100)
      .select(col("vec_id"), VF.quantize(col("embedding")).as("q"))
    val both = vecs.as("a").join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(VF.cosineQHof(col("a.q"), col("b.q")).as("hof"),
        VF.cosineQ(col("a.q"), col("b.q")).as("native"))
      .collect()
    assert(both.nonEmpty)
    // bit-exact, not tolerance (doubleToLongBits so NaN == NaN holds)
    both.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
      s"${r.getDouble(0)} != ${r.getDouble(1)}"))
    // length mismatch and null element both yield NULL like the HOF form
    val odd = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("a", "b")
      .select(VF.cosineQ(col("a"), col("b")).as("c"),
        VF.cosineQHof(col("a"), col("b")).as("ch")).collect().head
    assert(odd.isNullAt(0) && odd.isNullAt(1))
    val withNull = Seq(1).toDF("x")
      .select(VF.cosineQ(array(lit(1L), lit(null).cast("long")),
        array(lit(1L), lit(2L))).as("c")).collect().head
    assert(withNull.isNullAt(0))
  }

  test("L19: unicode_normalize composes NFC, NFKC folds compatibility forms; normalizeText pipeline; SQL surface") {
    import graft.functions.{TextFunctions => TF}
    val decomposed = "caf" + "e" + "\u0301" // e + combining acute
    val composed = "caf" + "\u00e9"          // precomposed e-acute
    val messy = "a" + "\u0000" + "b\tc\n\nd  e" + "\u000b" + "f"
    val rows = Seq(
      (1L, decomposed), (2L, composed), (3L, messy),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val out = rows.select($"id",
        TF.unicodeNormalize($"t").as("n"), TF.normalizeText($"t").as("c"))
      .orderBy($"id").collect()
    assert(out(0).getString(1) === composed) // NFC composes
    assert(out(0).getString(1) === out(1).getString(1)) // byte forms unify
    // NUL stripped; every whitespace run (tab, newlines, double space,
    // vertical tab) collapsed to one space
    assert(out(2).getString(2) === "ab c d e f")
    assert(out(3).isNullAt(1) && out(3).isNullAt(2)) // null propagates
    // NFKC folds compatibility characters (fi ligature U+FB01 -> fi)
    assert(Seq(Tuple1("\ufb01n")).toDF("t")
      .select(TF.unicodeNormalize($"t", "NFKC")).as[String].head() === "fin")
    // SQL registration agrees with the library form
    assert(rows.where($"t".isNotNull)
      .selectExpr("unicode_normalize(t, 'NFC') AS n")
      .select($"n").as[String].collect().sorted
      === rows.where($"t".isNotNull).select(TF.unicodeNormalize($"t"))
        .as[String].collect().sorted)
    // bad form fails analysis, not runtime
    intercept[Exception] {
      rows.select(TF.unicodeNormalize($"t", "NFX")).collect()
    }
  }

  test("L21: strip_html — tags, script/style content, comments, entities, malformed passthrough, SQL surface") {
    import graft.functions.{StripHtml, TextFunctions => TF}
    def s(h: String) = StripHtml.strip(h)
    assert(s("a<br>b") === "a b") // tag -> one space, words stay split
    assert(s("""<p class="x">hi</p>""") === " hi ")
    assert(s("<script>var x = '<div>';</script>after") === " after")
    assert(s("<style a=b>p { }</style>x") === " x")
    // HTML5 ignores the self-closing '/' on script/style — the element
    // stays open, so the body is still script content, not prose
    assert(s("<script src=x/>var y;</script>after") === " after")
    assert(s("<script src=x/>y") === " y") // no close tag: body survives
    // a '>' inside a quoted attribute value is data, not the tag close
    assert(s("""<a title="a>b">text</a>""") === " text ")
    assert(s("<a title='a>b'>text</a>") === " text ")
    // unterminated quote: fall back to the first raw '>' (never-garbage)
    assert(s("""<a title="unterminated>text""") === " text")
    assert(s("a<!-- <b> -->c") === "a c")
    assert(s("&amp;&lt;&gt;&quot;&apos;&nbsp;") === "&<>\"' ")
    assert(s("&#65;&#x42;&#X43;") === "ABC") // numeric dec + hex forms
    assert(s("<SCRIPT>var x=1;</SCRIPT>done") === " done") // case-insensitive close
    // never-garbage: malformed constructs pass through literally
    assert(s("a < b") === "a < b") // unterminated '<'
    // '<' before a non-letter is PROSE (HTML5 tokenizer rule) — a later
    // '>' must not turn the span into a deleted pseudo-tag
    assert(s("for a < b > c holds") === "for a < b > c holds")
    assert(s("i <3 you") === "i <3 you")
    assert(s("<!DOCTYPE html>x") === " x")
    assert(s("fish & chips") === "fish & chips") // bare ampersand
    assert(s("&unknown;") === "&unknown;")
    assert(s("&#xZZ;") === "&#xZZ;")
    assert(s("&#xD800;") === "&#xD800;") // lone surrogate: literal, not garbage
    assert(s("&#x1F600;") === new String(Character.toChars(0x1F600))) // astral ok
    // unterminated script: the open tag becomes a space and the content
    // SURVIVES (skipping to a close tag that never comes would eat it)
    assert(s("<script>never closed") === " never closed")
    assert(s("") === "")
    // column + SQL surfaces agree with the driver-side kernel
    val df = Seq((1L, "x<p>y</p>&amp;z"), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
    assert(df.select(TF.stripHtml($"t")).as[String].collect().toSeq
      === Seq("x y &z", null))
    assert(df.selectExpr("strip_html(t)").as[String].collect().toSeq
      === Seq("x y &z", null))
  }

  test("L6b: native char_ngrams matches the substr form (unicode, edges) and works from SQL") {
    import graft.functions.{TextFunctions => TF}
    // seeded generator over a unicode-heavy alphabet: ASCII, 2-byte (é),
    // 3-byte (好), 4-byte (surrogate-pair emoji) chars plus empties
    val rng = new scala.util.Random(42)
    // code-point strings, not chars: indexing a String would split the
    // emoji surrogate pairs into invalid lone surrogates
    val alphabet = IndexedSeq("a", "b", "c", " ", "é", "好", "你", "🎉", "🚀", "x")
    val docs = (0 until 200).map { i =>
      val len = rng.nextInt(12)
      (i.toLong, (0 until len).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString)
    } :+ ((200L, "")) :+ ((201L, "ab")) :+ ((202L, null))
    val df = docs.toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val both = df.select(
        TF.charNgrams(col("text"), n).as("native"),
        TF.charNgramsHof(col("text"), n).as("hof")).collect()
      both.foreach { r =>
        assert(r.isNullAt(0) === r.isNullAt(1))
        if (!r.isNullAt(0))
          assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n")
      }
    }
    // SQL-text path through the SparkSessionExtensions registration;
    // n as a foldable expression (not a bare literal) must also resolve
    df.createOrReplaceTempView("char_ngrams_test")
    val viaSql = spark.sql(
      "SELECT size(char_ngrams(text, 3)) s, size(char_ngrams(text, 1+2)) s2 " +
        "FROM char_ngrams_test WHERE text IS NOT NULL")
      .collect()
    assert(viaSql.nonEmpty && viaSql.forall(r => !r.isNullAt(0)))
    assert(viaSql.forall(r => r.getInt(0) === r.getInt(1)))
  }

  test("P15: config-parsed SMT chain equals the hand-composed chain") {
    import graft.operators.SmtChain
    import graft.sources.ConnectorConfig.Config
    import org.apache.spark.sql.types._
    val rec = Seq(
      (1L, "events", "alice", "secret1", 10.0),
      (2L, "clicks", "bob", "secret2", 20.0))
      .toDF("id", "topic", "name", "token", "v")
      .withColumn("headers", array(struct(lit("origin").as("key"), lit("t").as("value"))))
    val cfg = Config("c1", Map(
      "transforms" -> "route, mask, tag, cast, trim",
      "transforms.route.type" -> "org.apache.kafka.connect.transforms.RegexRouter",
      "transforms.route.regex" -> "(.*)s",
      "transforms.route.replacement" -> "$1-out",
      "transforms.mask.type" -> "org.apache.kafka.connect.transforms.MaskField$Value",
      "transforms.mask.fields" -> "token",
      "transforms.tag.type" -> "InsertField$Value",
      "transforms.tag.static.field" -> "pipeline",
      "transforms.tag.static.value" -> "v1",
      "transforms.cast.type" -> "Cast$Value",
      "transforms.cast.spec" -> "v:string",
      "transforms.trim.type" -> "ReplaceField$Value",
      "transforms.trim.exclude" -> "name",
      "transforms.trim.renames" -> "v:amount"))
    val out = SmtChain.fromConfig(cfg)(rec)
    val hand = rec
      .withColumn("topic", regexp_replace($"topic", "^(?:(.*)s)$", "$1-out"))
      .transform(Smt.maskFields(None, "token"))
      .transform(Smt.insertField("pipeline", lit("v1")))
      .transform(Smt.castFields("v" -> StringType))
      .transform(Smt.dropFields("name"))
      .transform(Smt.renameFields("v" -> "amount"))
    assert(out.schema === hand.schema)
    assert(out.drop("headers").collect() === hand.drop("headers").collect())
    // full-match router semantics: "events" matched → rewritten; any
    // topic NOT fully matching passes through (Connect Matcher.matches)
    assert(out.select($"topic").as[String].collect().sorted
      === Array("click-out", "event-out"))
  }

  test("P13b: SetSchemaMetadata tags value-column schema metadata, chain-parsed == hand-applied, wire roundtrip") {
    import graft.operators.SmtChain
    import graft.sources.{ConnectorConfig, JsonSchemaSerde}
    import org.apache.spark.sql.types.StructType
    val rec = Seq((1L, "events", "alice", 10.0), (2L, "events", "bob", 20.0))
      .toDF("id", "topic", "name", "v")
    val cfg = ConnectorConfig.Config("c", Map(
      "transforms" -> "meta",
      "transforms.meta.type" -> "org.apache.kafka.connect.transforms.SetSchemaMetadata$Value",
      "transforms.meta.schema.name" -> "com.example.Order",
      "transforms.meta.schema.version" -> "3"))
    val out = SmtChain.fromConfig(cfg)(rec)
    val hand = Smt.setSchemaMetadata(Some("com.example.Order"), Some(3),
      SmtChain.MetaCols.toSet)(rec)
    assert(out.schema === hand.schema)
    assert(out.collect() === rec.collect()) // pure schema annotation
    // value columns tagged; the topic metadata column untouched
    assert(Smt.schemaMetadataOf(out, SmtChain.MetaCols.toSet)
      === (Some("com.example.Order"), Some(3L)))
    assert(!out.schema("topic").metadata.contains(Smt.SchemaNameKey))
    // the tag survives a parquet round-trip (schema persists in footers)
    val dir = tmpDir("schema_meta")
    out.write.mode("overwrite").parquet(dir)
    assert(Smt.schemaMetadataOf(spark.read.parquet(dir), SmtChain.MetaCols.toSet)._1
      === Some("com.example.Order"))
    // wire leg: the schema-carrying serde emits the tag, and the decoder
    // surfaces both halves for consumer-side routing
    val (nm, ver) = Smt.schemaMetadataOf(out, SmtChain.MetaCols.toSet)
    val enc = JsonSchemaSerde.serialize(out, Seq("id", "name", "v"),
      nm.get, "wire", ver.map(_.toInt))
    val wireJson = enc.select($"wire".cast("string")).as[String].head()
    assert(wireJson.contains(""""name":"com.example.Order","version":3"""))
    val payloadSchema = StructType(Seq(out.schema("id"), out.schema("name"), out.schema("v")))
    val dec = JsonSchemaSerde.deserialize(enc, "wire", payloadSchema,
      schemaVersionOut = Some("schema_version"))
    assert(dec.select($"schema_name", $"schema_version").distinct().collect()
      === Array(org.apache.spark.sql.Row("com.example.Order", 3)))
    // config error: neither name nor version
    val bad = intercept[IllegalArgumentException] {
      SmtChain.fromConfig(ConnectorConfig.Config("c", Map(
        "transforms" -> "m", "transforms.m.type" -> "SetSchemaMetadata")))(rec)
    }
    assert(bad.getMessage.contains("schema.name and/or schema.version"))
  }

  test("P15: Filter + predicate (+negate), HeaderFrom move, and config errors") {
    import graft.operators.SmtChain
    import graft.sources.ConnectorConfig.Config
    val rec = Seq((1L, "events", "x"), (2L, "clicks", "y")).toDF("id", "topic", "name")
      .withColumn("headers", array(struct(lit("h0").as("key"), lit("t").as("value"))))
    def chain(kv: (String, String)*) = SmtChain.fromConfig(Config("c", kv.toMap))
    // Filter drops records MATCHING the predicate; negate inverts
    val drop = chain(
      "transforms" -> "f", "transforms.f.type" -> "Filter",
      "transforms.f.predicate" -> "p",
      "predicates.p.type" -> "predicates.TopicNameMatches",
      "predicates.p.pattern" -> "click.*")(rec)
    assert(drop.select($"topic").as[String].collect() === Array("events"))
    val keep = chain(
      "transforms" -> "f", "transforms.f.type" -> "Filter",
      "transforms.f.predicate" -> "p", "transforms.f.negate" -> "true",
      "predicates.p.type" -> "predicates.TopicNameMatches",
      "predicates.p.pattern" -> "click.*")(rec)
    assert(keep.select($"topic").as[String].collect() === Array("clicks"))
    // a NULL predicate input reads as FALSE (Connect boolean parity):
    // the record survives exactly ONE negate setting — raw three-valued
    // logic would drop it from both
    val withNull = Seq((1L, null.asInstanceOf[String]), (2L, "clicks")).toDF("id", "topic")
    def filt(negate: Boolean) = chain(
      "transforms" -> "f", "transforms.f.type" -> "Filter",
      "transforms.f.predicate" -> "p", "transforms.f.negate" -> negate.toString,
      "predicates.p.type" -> "predicates.TopicNameMatches",
      "predicates.p.pattern" -> "click.*")(withNull)
      .select($"id").as[Long].collect().sorted
    assert(filt(negate = false) === Array(1L)) // NULL topic: not matched → kept
    assert(filt(negate = true) === Array(2L)) // and dropped only here
    // HeaderFrom move: field lands in headers and leaves the value
    val moved = chain(
      "transforms" -> "hf", "transforms.hf.type" -> "HeaderFrom$Value",
      "transforms.hf.fields" -> "name", "transforms.hf.headers" -> "who",
      "transforms.hf.operation" -> "move")(rec)
    assert(!moved.columns.contains("name"))
    assert(moved.select(Smt.hasHeaderKey("headers", "who")).as[Boolean]
      .collect().forall(identity))
    // errors are loud and specific
    def err(kv: (String, String)*): String =
      intercept[IllegalArgumentException](chain(kv: _*)(rec)).getMessage
    assert(err("transforms" -> "z", "transforms.z.type" -> "NoSuchSmt")
      .contains("unknown type"))
    assert(err("transforms" -> "z", "transforms.z.type" -> "MaskField$Key")
      .contains("$Key"))
    assert(err("transforms" -> "z", "transforms.z.type" -> "MaskField$Value",
      "transforms.z.fields" -> "name", "transforms.z.predicate" -> "p",
      "predicates.p.type" -> "predicates.RecordIsTombstone")
      .contains("only supported on Filter"))
    assert(err("transforms" -> "z", "transforms.z.type" -> "MaskField$Value")
      .contains("transforms.z.fields"))
  }

  test("P15: TimestampConverter config paths — unix/string/Timestamp by input type") {
    import graft.operators.SmtChain
    import graft.sources.ConnectorConfig.Config
    val t = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-05T06:07:08Z"))
    def conv(kv: (String, String)*)(df: org.apache.spark.sql.DataFrame) =
      SmtChain.fromConfig(Config("c", Map("transforms" -> "tc",
        "transforms.tc.type" -> "TimestampConverter$Value") ++ kv))(df)
    val ts = Seq((1L, t)).toDF("id", "ev")
    assert(conv("transforms.tc.field" -> "ev", "transforms.tc.target.type" -> "unix")(ts)
      .select($"ev").as[Long].collect() === Array(t.toInstant.getEpochSecond))
    assert(conv("transforms.tc.field" -> "ev", "transforms.tc.target.type" -> "string",
      "transforms.tc.format" -> "yyyyMMdd")(ts)
      .select($"ev").as[String].collect() === Array("20240305")) // UTC session
    val fromUnix = Seq((1L, t.toInstant.getEpochSecond)).toDF("id", "ev")
    assert(conv("transforms.tc.field" -> "ev", "transforms.tc.target.type" -> "Timestamp")(fromUnix)
      .select($"ev").as[java.sql.Timestamp].collect() === Array(t))
    val fromStr = Seq((1L, "2024-03-05 06:07:08")).toDF("id", "ev")
    assert(conv("transforms.tc.field" -> "ev", "transforms.tc.target.type" -> "Timestamp",
      "transforms.tc.format" -> "yyyy-MM-dd HH:mm:ss")(fromStr)
      .select($"ev").as[java.sql.Timestamp].collect() === Array(t))
    // string target without a format is a loud config error
    assert(intercept[IllegalArgumentException](
      conv("transforms.tc.field" -> "ev", "transforms.tc.target.type" -> "string")(ts))
      .getMessage.contains("format"))
  }

  test("L3: cosineQ agrees with float cosine to quantization tolerance; symmetric") {
    val vecs = Seq(
      (1L, Seq(0.1f, -0.2f, 0.3f)), (2L, Seq(0.25f, 0.05f, -0.4f)))
      .toDF("id", "v")
    val pair = vecs.as("a").crossJoin(vecs.as("b"))
      .select(VF.cosine(col("a.v"), col("b.v")).as("c"),
        VF.cosineQ(VF.quantize(col("a.v")), VF.quantize(col("b.v"))).as("cq"),
        VF.cosine(col("b.v"), col("a.v")).as("c_rev"))
      .collect()
    pair.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-4)
      assert(r.getDouble(0) === r.getDouble(2)) // symmetry
    }
  }
}
