package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The C4 line-level rule pack + bad-word blocklist (Raffel et al.
  * 2020 §2.2 — the "Colossal Clean Crawled Corpus" cleaning recipe,
  * the other public heuristic filter family next to Gopher ([[
  * GopherRules]])). Gopher is doc-level: a document passes or dies
  * whole. C4 is LINE SURGERY: each line passes its own rules and the
  * document is REBUILT from the surviving lines (the paragraph-dedup
  * reassembly shape), then a handful of doc-level rules judge the
  * rebuilt text.
  *
  * Published rules implemented (each with its §2.2 sentence):
  *  - keep only lines ending in a terminal punctuation mark
  *    (`. ! ? "`);
  *  - keep only lines with at least `minWordsPerLine` words (5);
  *  - drop lines containing "javascript" (the enable-JS boilerplate)
  *    or any cookie/policy phrase ("terms of use", "privacy policy",
  *    "cookie policy", "uses cookies", "use of cookies",
  *    "use cookies") — substring match on the lowered line;
  *  - drop documents with fewer than `minSentences` (3) sentences
  *    AFTER the line surgery — the deterministic sentence count is the
  *    number of `[.!?]` marks in the rebuilt text (the from-scratch
  *    stand-in for C4's nltk splitter: both engines count the same
  *    engine-exact integer);
  *  - drop documents containing "lorem ipsum" (lowered substring) or
  *    a curly brace `{` (code pages) — judged on the REBUILT text,
  *    the published order (page filters run on the cleaned page);
  *  - drop documents containing any blocklist word ("List of Dirty,
  *    Naughty, Obscene…" in the paper) — whole-word regex match on
  *    the lowered rebuilt text; the default list here is a small
  *    illustrative subset, production supplies the full published
  *    list via [[Config]].
  * (C4's remaining rule — drop all but one of any three-sentence span
  * occurring more than once — is the repeated-span dedup family,
  * [[Dedup.repeatedSpanDedup]] / registry row l38.)
  *
  * Scale shape: everything is a pure per-row column expression — the
  * line split, the per-line predicate, the rebuild, and the doc rules
  * are array folds over the line list; no explode, no groupBy, no
  * join, nothing leaves the row; one whole-stage-codegen span. The
  * per-line predicate reads a pre-lowered struct slot so no condition
  * re-lowers the line (the HOF re-evaluation discipline of l41).
  *
  * Engine-portability: every quantity the keep verdict compares is an
  * engine-exact integer or a substring/regex membership both engines
  * state identically, so the whole surgery restates in DuckDB via
  * `list_filter` + `array_to_string` (the l44 oracle row).
  */
object C4Rules {

  /** A small illustrative subset of the published blocklist (the
    * paper's is the ~400-entry LDNOOBW list); whole-word match. */
  val DefaultBadWords: Seq[String] = Seq("porn", "xxx", "fuck", "bitch")

  /** Thresholds and match lists — defaults are C4's published values.
    * `badWords` entries must be plain lower-case words (they are
    * spliced into a word-boundary regex alternation verbatim). */
  final case class Config(
      minWordsPerLine: Int = 5,
      minSentences: Int = 3,
      endMarks: Seq[String] = Seq(".", "!", "?", "\""),
      dropLineSubstrings: Seq[String] = Seq("javascript", "terms of use",
        "privacy policy", "cookie policy", "uses cookies",
        "use of cookies", "use cookies"),
      badWords: Seq[String] = DefaultBadWords,
      dropLoremIpsum: Boolean = true,
      dropCurlyBrace: Boolean = true) {
    require(minWordsPerLine >= 0 && minSentences >= 0, "bad minimums")
    require(endMarks.nonEmpty, "endMarks must be nonempty")
    require(badWords.forall(_.matches("[a-z0-9]+")),
      s"badWords must be plain lower-case words: $badWords")
  }

  /** Whole-word blocklist alternation — ONE regex pass over the
    * rebuilt text (`\b(?:w1|w2|…)\b` on the lowered text); the same
    * pattern string feeds DuckDB's RE2 verbatim. Empty list → None. */
  def badWordPattern(cfg: Config): Option[String] =
    if (cfg.badWords.isEmpty) None
    else Some(cfg.badWords.mkString("\\b(?:", "|", ")\\b"))

  /** Trimmed non-empty lines (the [[GopherRules]] split). */
  private def linesOf(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** Lines surviving the per-line rules. Each element carries its
    * lowered form in a struct slot so the substring checks don't
    * re-lower per condition (lambda trees skip codegen subexpression
    * elimination — the l41 lesson). */
  def keptLines(text: Column, cfg: Config = Config()): Column = {
    val paired = transform(linesOf(text),
      l => struct(l.as("l"), lower(l).as("ll")))
    val kept = filter(paired, s => {
      val l = s.getField("l")
      val ll = s.getField("ll")
      val ends = cfg.endMarks.map(m => l.endsWith(m)).reduce(_ || _)
      val words = size(filter(split(l, "\\s+"), w => length(w) > 0)) >=
        cfg.minWordsPerLine
      val noDrop = cfg.dropLineSubstrings
        .map(p => !ll.contains(p))
        .foldLeft(lit(true))(_ && _)
      ends && words && noDrop
    })
    transform(kept, s => s.getField("l"))
  }

  /** The rebuilt document: surviving lines joined with '\n'. NULL
    * text → NULL; a document whose every line dies rebuilds to ''
    * (and then fails `minSentences`). */
  def cleanedText(text: Column, cfg: Config = Config()): Column =
    when(text.isNull, lit(null).cast("string"))
      .otherwise(array_join(keptLines(text, cfg), "\n"))

  /** Doc-level metric struct over an ALREADY-REBUILT text column:
    * (n_kept, n_sentences, has_lorem, has_brace, has_bad_word). The
    * line count derives from the rebuilt text itself (splitting the
    * '\n'-joined trimmed non-empty lines is lossless), so callers that
    * project the clean text anyway don't re-run the surgery. */
  def metricsOfCleaned(ct: Column, cfg: Config = Config()): Column = {
    val badHit = badWordPattern(cfg) match {
      case Some(p) => lower(ct).rlike(p)
      case None => lit(false)
    }
    struct(
      when(length(ct) === 0, lit(0L))
        .otherwise(size(split(ct, "\n")).cast("long")).as("n_kept"),
      regexp_count(ct, lit("[.!?]")).cast("long").as("n_sentences"),
      (lit(cfg.dropLoremIpsum) && lower(ct).contains("lorem ipsum"))
        .as("has_lorem"),
      (lit(cfg.dropCurlyBrace) && ct.contains("{")).as("has_brace"),
      badHit.as("has_bad_word"))
  }

  /** Doc-level keep verdict over a [[metricsOfCleaned]] struct. */
  def allOk(m: Column, cfg: Config = Config()): Column =
    m.getField("n_sentences") >= cfg.minSentences &&
      !m.getField("has_lorem") && !m.getField("has_brace") &&
      !m.getField("has_bad_word")

  /** Keep-filter form (the intake-gate shape): run the line surgery
    * and judge the rebuilt text; NULL text PASSES (no-evidence —
    * upstream gates own NULL handling, matching the other gates). The
    * rebuilt text binds once; the intake leg re-derives it for the
    * survivor rewrite (the accepted PII-leg shape: filter pass +
    * rewrite pass, both O(len) per row). */
  def keeps(text: Column, cfg: Config = Config()): Column =
    text.isNull || TF.bindOnce(cleanedText(text, cfg))(ct =>
      allOk(metricsOfCleaned(ct, cfg), cfg))
}
