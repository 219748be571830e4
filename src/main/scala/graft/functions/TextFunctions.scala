package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions (SURVEY §2.9 L5-L7): tokenization,
  * n-grams, counting, quality signals, language-ID heuristic, PII masking,
  * document fingerprinting. All pure column expressions (codegen-friendly,
  * no UDFs) — per-row cost only, no shuffle, safe at any scale.
  */
object TextFunctions {

  /** Whitespace tokenizer (lower-cased, empty tokens dropped). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Word count = token count. */
  def wordCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric non-whitespace characters (a cheap proxy for
    * subword tokenizer counts; the regex is portable to the DuckDB
    * oracle). `\s`, not the literal space: real corpora are multi-line,
    * and counting every newline/tab as a token would systematically
    * inflate any length filtering or packing built on this. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Unicode normalization via the native [[UnicodeNormalize]]
    * expression (Spark ships no builtin; ASCII fast path inside). */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      UnicodeNormalize(ColumnBridge.expression(text), form))
  }

  /** Full text-cleaning normalization — the standard first pass of a
    * training-data pipeline: Unicode-normalize (composed/decomposed
    * byte forms of the same glyphs unify, or every downstream dedup /
    * fingerprint / token count diverges on encoding), strip the
    * non-whitespace control characters, collapse whitespace runs to
    * single spaces, trim. Character classes are spelled EXPLICITLY,
    * not `\s`: Java and RE2 disagree on `\x0B`, and the DuckDB oracle
    * replays these exact classes. The strip class excludes the
    * whitespace controls (U+0009-U+000D), so stripping FIRST is
    * safe and required — collapsing first would leave a double space
    * wherever a control character separated two whitespace runs
    * ("a <NUL><VT> b" must clean to "a b", not "a  b"). Pure
    * per-row projection; no shuffle. */
  def normalizeText(text: Column, form: String = "NFC"): Column =
    trim(regexp_replace(
      regexp_replace(unicodeNormalize(text, form),
        "[\\u0000-\\u0008\\u000E-\\u001F\\u007F]", ""),
      "[ \\t\\n\\r\\f\\u000B]+", " "))

  /** [[normalizeText]] preserving PARAGRAPH boundaries — the cleaning
    * pass for the paragraph-dedup intake leg, where '\n' is the
    * paragraph separator ([[graft.operators.Dedup.paragraphDedup]])
    * and must survive: horizontal whitespace runs collapse to one
    * space, newline runs (with any flanking whitespace) collapse to
    * ONE '\n', leading/trailing whitespace and newlines strip. Same
    * Unicode-normalize + control-strip front as [[normalizeText]];
    * the control strip excludes U+0009-U+000D so it runs first. */
  def normalizeTextKeepNewlines(text: Column, form: String = "NFC"): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(unicodeNormalize(text, form),
            "[\\u0000-\\u0008\\u000E-\\u001F\\u007F]", ""),
          "[ \\t\\f\\u000B]+", " "),
        "[ ]*[\\r\\n]+[ \\r\\n]*", "\n"),
      "^[\\n ]+|[\\n ]+$", "")

  /** HTML-to-text via the native [[StripHtml]] expression (tags → one
    * space, script/style content dropped, entities decoded; malformed
    * markup passes through literally). Compose with [[normalizeText]]
    * for whitespace cleanup — the standard web-corpus intake pair. */
  def stripHtml(text: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(StripHtml(ColumnBridge.expression(text)))
  }

  /** Block-level boilerplate removal (the jusText / Readability family
    * of public web-corpus extractors — Pomikálek 2011): [[stripHtml]]
    * removes MARKUP but keeps nav/footer TEXT; this stage drops whole
    * low-content blocks before any of that text reaches the corpus.
    *
    * Method — the standard public recipe, built entirely from built-in
    * regex/array expressions (no UDF, no parser state):
    *
    *  1. delete script/style bodies and comments (never visible);
    *  2. segment on block-level tags (`p div li ul ol … h1-6 header
    *     footer nav br hr` — the HTML flow-content boundary set), so
    *     each array element is one rendering block;
    *  3. per block, compute the VISIBLE text (inline tags → space,
    *     whitespace collapsed) and its LINK text (contents of `<a>`
    *     spans, same cleanup);
    *  4. keep blocks with `len(visible) >= minChars` AND
    *     `len(link) <= maxLinkDensity * len(visible)` — short fragments
    *     and link-dominated blocks (menus, breadcrumbs, footers) drop;
    *  5. join survivors with single spaces.
    *
    * Output still carries entities (&amp; etc.) — compose as
    * `normalizeText(stripHtml(extractContent(html)))`, the intake
    * front half with the boilerplate leg on. NULL html → NULL. Pure
    * per-row projection; no shuffle, parallelizes trivially.
    *
    * Codegen (r13 audit): the regexp legs compile into whole-stage
    * codegen; the per-block `transform`/`filter` lambdas evaluate via
    * CodegenFallback because every Spark higher-order function does
    * (`ArrayTransform implements CodegenFallback`, verified against
    * the 4.1.2 jar). The per-row cost is the regex engine over the
    * HTML, not the lambda dispatch — a custom Expression would only
    * inline the block loop, so the built-in form stays. */
  /** Block-level (flow-content) HTML tag boundary — the segmentation
    * class [[extractContent]] splits on and
    * [[blockTagsToNewlines]] rewrites to paragraph breaks. */
  private val BlockTagRe =
    "(?i)</?(?:p|div|li|ul|ol|dl|dt|dd|td|th|tr|table|h[1-6]|header|footer|nav|section|article|aside|main|blockquote|pre|form|figure|figcaption|br|hr)(?:\\s[^>]*)?/?>"

  /** Rewrite block-level HTML tags to '\n' so BLOCK structure becomes
    * PARAGRAPH structure before [[stripHtml]] — the paragraph-dedup
    * intake leg's pre-pass: `normalizeTextKeepNewlines(stripHtml(
    * blockTagsToNewlines(html)))` yields one '\n'-separated paragraph
    * per rendering block (raw newlines in the source survive too).
    * Inline tags are left for stripHtml; newlines this inserts inside
    * script/style bodies are dropped with those bodies. */
  def blockTagsToNewlines(html: Column): Column =
    regexp_replace(html, BlockTagRe, "\n")

  def extractContent(html: Column, minChars: Int = 20,
      maxLinkDensity: Double = 0.33, blockSep: String = " "): Column = {
    val noInvisible = regexp_replace(
      regexp_replace(
        regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " "),
        "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val blocks = split(noInvisible, BlockTagRe)
    def visibleOf(b: Column): Column =
      trim(regexp_replace(regexp_replace(b, "<[^>]*>", " "),
        "[ \\t\\n\\r\\f\\u000B]+", " "))
    val withMeta = transform(blocks, b => struct(
      visibleOf(b).as("v"),
      length(visibleOf(concat_ws(" ",
        regexp_extract_all(b,
          lit("(?is)<a(?:\\s[^>]*)?>(.*?)</a>"), lit(1))))).as("ll")))
    val kept = filter(withMeta, s =>
      length(s.getField("v")) >= minChars &&
        s.getField("ll").cast("double") <=
          lit(maxLinkDensity) * length(s.getField("v")).cast("double"))
    when(html.isNull, lit(null).cast("string"))
      .otherwise(array_join(transform(kept, s => s.getField("v")), blockSep))
  }

  /** Character n-grams of the whole string, as an array — the native
    * single-pass [[CharNgrams]] kernel (the built-in `substr`-per-position
    * form is O(len²); see the expression's scaladoc). */
  def charNgrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(CharNgrams(ColumnBridge.expression(text), n))
  }

  /** Portable polynomial feature-hash bucket — the native single-pass
    * [[PolyBucket]] kernel (the `aggregate`-over-`ascii(substr)` form
    * evaluates ~30 interpreted nodes per character; see the
    * expression's scaladoc). */
  def polyBucket(text: Column, dim: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(PolyBucket(ColumnBridge.expression(text), dim))
  }

  /** Equal-run statistics of a string list — the native one-pass
    * [[SortedRunStats]] kernel returning (occ, chars, bc, bl); replaces
    * the interpreted `aggregate(array_sort(…))` struct folds (see the
    * expression's scaladoc). */
  def sortedRunStats(arr: Column, extraChars: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      SortedRunStats(ColumnBridge.expression(arr), extraChars))
  }

  /** Every integer behind the Gopher metric pack in ONE native pass —
    * the fused [[GopherTextStats]] kernel (see its scaladoc for the
    * parity contract with the built-in HOF folds it replaces). */
  def gopherTextStats(text: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(GopherTextStats(ColumnBridge.expression(text)))
  }

  /** Built-in-only form of [[charNgrams]] — kept as the semantic
    * reference for the native kernel's parity property test. */
  def charNgramsHof(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), length(text) - (n - 1)), i => text.substr(i, lit(n))))

  /** Token n-grams: join each window of n consecutive tokens with a space. */
  def tokenNgrams(text: Column, n: Int): Column = ngramsOfTokens(tokens(text), n)

  /** n-grams over an already-tokenized array column — callers that need
    * the token list anyway should materialize it once and use this form
    * (the lambda below re-evaluates its array argument per element, so
    * passing a raw `tokens(text)` expression costs O(tokens²)). */
  def ngramsOfTokens(ts: Column, n: Int): Column =
    when(size(ts) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(ts) - n), i => concat_ws(" ", slice(ts, i + 1, lit(n)))))

  /** Evaluate `c` ONCE per row and compute `f` over the bound value —
    * the in-expression form of the l02 "materialize it as its own
    * projected column" rule, for Column-in/Column-out operators that
    * cannot stage projections. Two re-evaluation traps make this
    * necessary: (a) an HOF lambda re-evaluates an expression-valued
    * argument PER ELEMENT (`slice(tokens(text), i, n)` inside
    * `transform` re-tokenizes per n-gram — O(k²); the [[ngramsOfTokens]]
    * caveat), and (b) whole-stage codegen's subexpression elimination
    * SKIPS lambda-containing trees, so a composite referenced by k
    * struct fields/flags evaluates k times (the l02 16× signature
    * lesson, BASELINE.md round-4 notes). A lambda VARIABLE is a cheap
    * slot read in both cases: wrapping `c` in a one-element transform
    * binds it once per row. Measured on the Gopher pack at sf0.1:
    * 128-150 s/rep unbound → 11.5 s bound → 6 s once the folds moved
    * into the [[SortedRunStats]] kernel (the l41 attempt log). */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Distinct token-shingle set (for Jaccard / MinHash). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(tokenNgrams(text, n))

  /** Shingle set over a materialized token array (the scale path). */
  def shingleSetOfTokens(ts: Column, n: Int): Column = array_distinct(ngramsOfTokens(ts, n))

  /** Jaccard similarity of two string arrays (set semantics), exact
    * integer cardinalities → deterministic double ratio. */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a); val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd)).cast("double")
    val uni = size(array_union(ad, bd)).cast("double")
    when(uni === 0, lit(0.0d)).otherwise(inter / uni)
  }

  /** Punctuation ratio: basic-punct chars / total chars (same char class
    * spelled identically in the DuckDB oracle). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0d)).otherwise(
      (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double")
        / length(text).cast("double"))

  /** Mean token length (0 for empty docs). */
  def meanWordLen(text: Column): Column = meanWordLenOfTokens(tokens(text))

  /** Stopword-hit ratio against a fixed list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val ts = tokens(text)
    val sw = array(stopwords.map(lit): _*)
    when(size(ts) === 0, lit(0.0d)).otherwise(
      size(filter(ts, t => array_contains(sw, t))).cast("double")
        / size(ts).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * punctuation noise and a sane mean word length. Weights are fixed,
    * arithmetic is deterministic (integer counts → double ops in a fixed
    * expression tree). */
  def qualityScore(text: Column): Column =
    qualityExpr(text, meanWordLen(text))

  /** The one spelling of the quality arithmetic — both the scalar form
    * above and [[withQuality]] feed it their own mean-word-length column,
    * so a weight tweak can never desync the two (or the DuckDB oracle
    * that mirrors them). */
  private def qualityExpr(text: Column, mwl: Column): Column = {
    val lenScore = least(length(text).cast("double") / 400.0d, lit(1.0d))
    val punctPenalty = lit(1.0d) - least(punctRatio(text) * 5.0d, lit(1.0d))
    val wordScore = when(mwl >= 3.0d && mwl <= 10.0d, lit(1.0d)).otherwise(lit(0.5d))
    // explicit NULL-in → NULL-out: `least` SKIPS null arguments
    // (least(null, 1.0) = 1.0), so without the guard a NULL text earns
    // the full length score and the word-score fallback — 0.6, ABOVE
    // any gate at τ ≤ 0.6. A score must never manufacture quality out
    // of absent text (found by the ScaleSpec intake case; the DuckDB
    // oracles agree: their CASE arithmetic yields NULL for NULL text).
    when(text.isNull, lit(null).cast("double"))
      .otherwise(round(lenScore * 0.5d + punctPenalty * 0.3d + wordScore * 0.2d, 6))
  }

  /** Per-language stopword lists for the langId heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf", "ich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "que", "por"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "人", "这"))

  /** Language-ID heuristic: argmax of stopword hits per language, 'und'
    * when nothing matches. Deterministic tie-break: list order above. */
  def langId(text: Column): Column =
    // token list and per-language hit counts each bind ONCE: the
    // argmax when-chain references `best` K times and `best` references
    // every hit, so the unbound form re-ran filter(tokens(text)) ~K²
    // times per row (the bindOnce round-16 audit)
    bindOnce(tokens(text)) { ts =>
      val hitExprs = langStopwords.map { case (lang, sws) =>
        val sw = array(sws.map(lit): _*)
        size(filter(ts, t => array_contains(sw, t))).as(lang)
      }
      bindOnce(struct(hitExprs: _*)) { hs =>
        val hits = langStopwords.map { case (lang, _) =>
          lang -> hs.getField(lang) }
        val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
        hits.foldLeft(when(best === 0, lit("und"))) { case (acc, (lang, h)) =>
          acc.when(h === best, lit(lang))
        }.otherwise(lit("und"))
      }
    }

  /** PII masking (L7): emails then digit-runs-of-7+ (phone-ish). */
  def maskPii(text: Column): Column = {
    val noEmail = regexp_replace(text, PiiEmailRe, "<EMAIL>")
    regexp_replace(noEmail, PiiPhoneRe, "<PHONE>")
  }

  // ---- L7b: the full Dolma-style PII pack (dolma's pii taggers:
  // email, phone, IPv4 — detect/count, mask, and the document policy
  // "drop when PII-dense, mask otherwise"). Patterns stay in the
  // java.util.regex ∩ RE2 common subset (classes, bounded repeats,
  // \b, alternation — no lookaround) so the DuckDB oracle runs them
  // verbatim. ----

  /** Email pattern (the L7 pattern, shared). */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Phone-ish digit run: 7+ chars of digits/separators, digit-fenced.
    * Dots are deliberately NOT separators — an IPv4 octet run must not
    * read as a phone. */
  val PiiPhoneRe = "[0-9][0-9 ()+-]{5,}[0-9]"
  /** IPv4 with exact octet ranges (the Dolma form), word-fenced. */
  val PiiIpv4Re = "\\b((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\b"

  /** Per-type PII counts over the RAW text (detection before any
    * masking): struct(n_email, n_phone, n_ip). NULL text → NULL. */
  def piiCounts(text: Column): Column =
    when(text.isNull, lit(null)).otherwise(struct(
      regexp_count(text, lit(PiiEmailRe)).cast("long").as("n_email"),
      regexp_count(text, lit(PiiPhoneRe)).cast("long").as("n_phone"),
      regexp_count(text, lit(PiiIpv4Re)).cast("long").as("n_ip")))

  /** Mask all three PII classes: emails, then IPv4 (before phones — a
    * masked IP can never be re-read as a digit run), then phone runs. */
  def maskPiiAll(text: Column): Column = {
    val noEmail = regexp_replace(text, PiiEmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, PiiIpv4Re, "<IP>")
    regexp_replace(noIp, PiiPhoneRe, "<PHONE>")
  }

  /** The Dolma document policy's keep half: true when the total PII
    * instance count is ≤ `maxPii` (PII-dense documents DROP — masking
    * a page that is mostly addresses leaves no training signal); NULL
    * text PASSES (the no-evidence gate convention). Survivors are then
    * masked by [[maskPiiAll]]. */
  def piiKeeps(text: Column, maxPii: Int): Column = {
    require(maxPii >= 0, s"maxPii must be >= 0, got $maxPii")
    text.isNull || bindOnce(piiCounts(text))(c =>
      c.getField("n_email") + c.getField("n_phone") + c.getField("n_ip") <=
        maxPii)
  }

  /** Polynomial rolling-hash fingerprint over the token stream:
    * h = fold(h * 31 + tokenLen31) mod 2^31-1 — cheap, deterministic,
    * portable (uses token lengths + first-char codes, not engine hash()). */
  def fingerprint(text: Column): Column = fingerprintOfTokens(tokens(text))

  /** [[fingerprint]] over a materialized token array. */
  def fingerprintOfTokens(ts: Column): Column =
    aggregate(ts, lit(7L),
      (acc, t) => (acc * 31L + length(t).cast("long") * 131L + ascii(t)) % 2147483647L)

  /** [[meanWordLen]] over a materialized token array. */
  def meanWordLenOfTokens(ts: Column): Column =
    when(size(ts) === 0, lit(0.0d)).otherwise(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(ts).cast("double"))

  // ---- DataFrame-level variants ----
  // The scalar forms above are convenient, but a single Column expression
  // re-inlines its token pipeline into every consumer (subexpression
  // elimination skips lambda-containing trees): langId expands to ~35
  // tokenizer copies per row, qualityScore to ~7 (.explain-counted).
  // These variants materialize the intermediates as real columns —
  // multi-referenced non-cheap aliases survive CollapseProject — so the
  // tokenizer and each per-language filter run once per row. Use them
  // whenever the input is a DataFrame; the scalar forms remain for
  // one-shot contexts.
  //
  // Reserved names: the temps `__toks`, `__mwl`, `__best`, `__hits_<lang>`
  // are overwritten and dropped — input columns with those names do not
  // survive, and the declared output columns (n_words, punct_ratio, ...)
  // replace any same-named input column (withColumn semantics).

  /** n_words / punct_ratio / mean_wlen columns, tokenizing once. */
  def withTextStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("n_words", size(col("__toks")))
      .withColumn("punct_ratio", punctRatio(col(textCol)))
      .withColumn("mean_wlen", meanWordLenOfTokens(col("__toks")))
      .drop("__toks")

  /** [[langId]] as a column `out`, with tokens, per-language hit counts
    * and the argmax materialized once each (the scalar form re-evaluates
    * every hit filter inside each `when` branch AND inside the inlined
    * `greatest`). Same deterministic tie-break: list order. */
  def withLangId(df: DataFrame, textCol: String,
      out: String = "pred_lang"): DataFrame = {
    val hitCols = langStopwords.map { case (lang, _) => s"__hits_$lang" }
    val withHits = langStopwords.foldLeft(
        df.withColumn("__toks", tokens(col(textCol)))) {
      case (d, (lang, sws)) =>
        val sw = array(sws.map(lit): _*)
        d.withColumn(s"__hits_$lang",
          size(filter(col("__toks"), t => array_contains(sw, t))))
    }.withColumn("__best", hitCols.map(col).reduce(greatest(_, _)))
    val pred = langStopwords.foldLeft(when(col("__best") === 0, lit("und"))) {
      case (acc, (lang, _)) =>
        acc.when(col(s"__hits_$lang") === col("__best"), lit(lang))
    }.otherwise(lit("und"))
    withHits.withColumn(out, pred)
      .drop("__toks" +: "__best" +: hitCols: _*)
  }

  /** [[qualityScore]] + [[fingerprint]] as columns, tokenizing once. */
  def withQuality(df: DataFrame, textCol: String,
      qualityOut: String = "quality", fpOut: String = "fp"): DataFrame =
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("__mwl", meanWordLenOfTokens(col("__toks")))
      .withColumn(qualityOut, qualityExpr(col(textCol), col("__mwl")))
      .withColumn(fpOut, fingerprintOfTokens(col("__toks")))
      .drop("__toks", "__mwl")

  /** Quality column only, tokenizing once — the intake hot path (the
    * scalar [[qualityScore]] re-inlines its tokenizer ~7×; this form
    * skips [[withQuality]]'s fingerprint fold too). Same arithmetic,
    * same NULL semantics as the scalar form. */
  def withQualityOnly(df: DataFrame, textCol: String,
      out: String = "quality"): DataFrame =
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("__mwl", meanWordLenOfTokens(col("__toks")))
      .withColumn(out, qualityExpr(col(textCol), col("__mwl")))
      .drop("__toks", "__mwl")
}
