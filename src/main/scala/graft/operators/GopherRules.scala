package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Gopher repetition/quality rule pack (Rae et al. 2021, table A1 —
  * the document filter family Dolma and RefinedWeb reuse verbatim):
  * word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  * bullet/ellipsis line fractions, alpha-word fraction, stop-word
  * presence, duplicate-line/paragraph fractions (row and character
  * weighted), and top-2/3/4-gram character coverage. l12 proves the
  * top-n-gram sub-piece; this pack is the full published family as ONE
  * per-row struct.
  *
  * Reference behavior analogue: the reference pipeline
  * (`main.sh:146-196`) gates records per-row via connector SMT chains;
  * this is the corresponding per-document content gate a training-data
  * intake needs.
  *
  * Scale shape: EVERY metric is a pure per-row column expression —
  * array folds over the token/line/paragraph lists, no explode, no
  * groupBy, no join, no shuffle, nothing leaves the row. The l12
  * registry row computes its top-bigram share via explode + two
  * groupBys (fine for one metric, but fifteen metrics × explode would
  * be fifteen shuffles); here the duplicate-run counting that a groupBy
  * would do happens INSIDE the row: sort the list, fold adjacent runs
  * (`array_sort` + `aggregate`) — O(k log k) per doc in list length,
  * embarrassingly parallel at 100 TB, and the whole struct stays in one
  * whole-stage-codegen span (PlanSpec pins zero exchanges on the gate).
  *
  * Engine-portability (the oracle discipline): each fraction is ONE
  * IEEE division of two engine-exact integers (counts and char sums),
  * so DuckDB restates every rule bit-for-bit via unnest + per-doc
  * groupBys — a genuine cross-strategy differential (Spark: in-row
  * folds; DuckDB: relational regroup). Metrics that need a list the
  * doc cannot produce (no tokens, no n-grams, no lines) are NULL, and
  * NULL metrics PASS their rule (the no-evidence convention of the
  * lmGate/quality legs) — except the word-count bounds, where zero
  * words IS evidence (and fails `minWords`).
  *
  * Definitions follow the public implementations (Dolma's
  * gopher_taggers, DataTrove's GopherRepetitionFilter /
  * GopherQualityFilter):
  *  - words = [[TF.tokens]] (lower-cased whitespace tokens);
  *  - lines / paragraphs = trimmed non-empty segments split on `\n` /
  *    on runs of 2+ newlines;
  *  - `dup_line_frac` = occurrences of any repeated line / lines
  *    (ALL occurrences count, per DataTrove), char-weighted variant
  *    weights each occurrence by its char length;
  *  - `top{2,3,4}gram_char_frac` = (occurrences of the most frequent
  *    word n-gram × its word-char length) / total word chars, ties on
  *    count resolved to the longest n-gram (deterministic both
  *    engines);
  *  - symbols = '#' characters plus non-overlapping '...'/'…' matches.
  */
object GopherRules {

  /** Thresholds — defaults are Gopher table A1's published values. A
    * rule whose threshold you set to `None`-like extremes is
    * effectively off; the struct always carries every metric. */
  final case class Config(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8,
      minStopWords: Int = 2,
      maxDupLineFrac: Double = 0.3,
      maxDupParaFrac: Double = 0.3,
      maxDupLineCharFrac: Double = 0.2,
      maxDupParaCharFrac: Double = 0.2,
      maxTop2CharFrac: Double = 0.2,
      maxTop3CharFrac: Double = 0.18,
      maxTop4CharFrac: Double = 0.16) {
    require(minWords >= 0 && maxWords >= minWords, s"bad word bounds")
    require(minStopWords >= 0, "minStopWords must be >= 0")
  }

  /** Gopher's stop-word list (table A1: "contains at least 2 of ..."). */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Bullet glyphs a line may start with (the DataTrove set + '*'). */
  private val Bullets = Seq("•", "●", "-", "*")

  /** Trimmed non-empty lines. */
  private def linesOf(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** Trimmed non-empty paragraphs (split on blank-line runs). */
  private def parasOf(text: Column): Column =
    filter(transform(split(text, "\n{2,}"), p => trim(p)), p => length(p) > 0)

  /** Σ length over a string array (0 for empty). */
  private def charSum(arr: Column): Column =
    aggregate(arr, lit(0L), (a, x) => a + length(x))

  /** In-row duplicate-run stats over a string list — (dup_occurrences,
    * dup_chars) where a value occurring c > 1 times contributes c
    * occurrences and c·len chars, exactly what the oracle's
    * `SUM(c) FILTER (c > 1)` regroup computes. One call into the native
    * [[graft.functions.SortedRunStats]] kernel (the interpreted
    * `aggregate(array_sort(…))` struct fold cost ~40 expression-node
    * evaluations per element — the l41 attempt-log lesson). */
  private def dupStats(arr: Column): Column =
    TF.sortedRunStats(arr, 0)

  /** In-row most-frequent-run stats over a string list: (top count,
    * char length of the winner) with count ties resolved to the LONGEST
    * value — the deterministic argmax both engines reproduce
    * (`MAX(len) over values at MAX(count)` in the oracle). `extraChars`
    * is subtracted from the winner's length (the n-gram's n−1 joining
    * spaces, so coverage counts word chars only). Same native kernel
    * call as [[dupStats]] — the bc/bl half of the struct. */
  private def topRunStats(arr: Column, extraChars: Int): Column =
    TF.sortedRunStats(arr, extraChars)

  /** NULL-safe integer-ratio → double (NULL when the denominator is 0:
    * the metric had nothing to measure). */
  private def frac(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double"))
      .otherwise(lit(null).cast("double"))

  /** The full Gopher metric struct for one document. NULL text → NULL
    * struct (the caller's no-evidence convention). Fields:
    * n_words, mean_word_len, alpha_frac, n_stop, symbol_ratio,
    * bullet_frac, ellipsis_frac, dup_line_frac, dup_line_char_frac,
    * dup_para_frac, dup_para_char_frac, top2_char_frac, top3_char_frac,
    * top4_char_frac.
    *
    * Since r20 the integer front half (every count, char sum and
    * sorted-run fold) is ONE call into the fused native
    * [[graft.functions.GopherTextStats]] kernel; only the final
    * NULL-guarded divisions remain column arithmetic. The previous
    * bindOnce-over-HOF-folds form is retained as [[metricsHof]] — the
    * kernel's bit-parity reference (GopherRulesSpec pins them equal
    * property-wise; the DuckDB l41 oracle restates the whole pack
    * relationally on top). */
  def metrics(text: Column): Column = {
    val assembled = TF.bindOnce(TF.gopherTextStats(text)) { s =>
      def f(name: String): Column = s.getField(name)
      def topFrac(p: String): Column =
        when(f(s"${p}_n") > 0, frac(f(s"${p}_bc") * f(s"${p}_bl"), f("wc")))
          .otherwise(lit(null).cast("double"))
      struct(
        f("nw").as("n_words"),
        frac(f("wc"), f("nw")).as("mean_word_len"),
        frac(f("aw"), f("nw")).as("alpha_frac"),
        f("nstop").as("n_stop"),
        frac(f("sym"), f("nw")).as("symbol_ratio"),
        frac(f("bul"), f("nl")).as("bullet_frac"),
        frac(f("ell"), f("nl")).as("ellipsis_frac"),
        frac(f("dl_occ"), f("nl")).as("dup_line_frac"),
        frac(f("dl_chars"), f("lchars")).as("dup_line_char_frac"),
        frac(f("dp_occ"), f("np")).as("dup_para_frac"),
        frac(f("dp_chars"), f("pchars")).as("dup_para_char_frac"),
        topFrac("t2").as("top2_char_frac"),
        topFrac("t3").as("top3_char_frac"),
        topFrac("t4").as("top4_char_frac"))
    }
    when(text.isNull, lit(null)).otherwise(assembled)
  }

  /** The pre-r20 built-in-only form of [[metrics]] — kept as the
    * semantic reference for the fused kernel's parity property test
    * (the [[TF.charNgramsHof]] discipline).
    *
    * Evaluation discipline ([[TF.bindOnce]] — the l41 attempt log's
    * 130 s → 6 s lesson): the token/line/paragraph lists bind ONCE at
    * level 1 (fourteen metric fields otherwise re-derive them per
    * reference — codegen subexpression elimination skips lambda trees
    * — and `ngramsOfTokens` over an UNBOUND token expression
    * re-tokenizes per n-gram, O(k²)); every sorted-run FOLD result
    * binds once at level 2 (each feeds two final fields); the final
    * struct assembly is pure arithmetic over the bound slots. */
  private[graft] def metricsHof(text: Column): Column = {
    val bound = TF.bindOnce(struct(TF.tokens(text).as("ts"),
        linesOf(text).as("ls"), parasOf(text).as("ps"))) { v =>
      val toks = v.getField("ts")
      val lines = v.getField("ls")
      val paras = v.getField("ps")
      // n-gram top-run stats: the n-gram list builds from the BOUND
      // token slot (per-element slice of a lambda variable — linear),
      // feeds its fold once, and carries its own size for the
      // no-evidence guard
      def topStats(n: Int): Column =
        TF.bindOnce(TF.ngramsOfTokens(toks, n)) { ng =>
          val st = topRunStats(ng, n - 1)
          struct(st.getField("bc").as("bc"), st.getField("bl").as("bl"),
            size(ng).cast("long").as("n"))
        }
      val stats = struct(
        size(toks).cast("long").as("nw"),
        charSum(toks).as("wc"),
        size(filter(toks, t => t.rlike("[a-z]"))).cast("long").as("aw"),
        size(filter(typedLit(StopWords),
          w => array_contains(toks, w))).cast("long").as("nstop"),
        ((length(text) - length(replace(text, lit("#"), lit("")))).cast("long")
          + regexp_count(text, lit("\\.\\.\\.|…")).cast("long")).as("sym"),
        size(lines).cast("long").as("nl"),
        charSum(lines).as("lchars"),
        size(filter(lines, l =>
          Bullets.map(b => l.startsWith(b)).reduce(_ || _)))
          .cast("long").as("bul"),
        size(filter(lines, l => l.endsWith("...") || l.endsWith("…")))
          .cast("long").as("ell"),
        dupStats(lines).as("dl"),
        size(paras).cast("long").as("np"),
        charSum(paras).as("pchars"),
        dupStats(paras).as("dp"),
        topStats(2).as("t2"), topStats(3).as("t3"), topStats(4).as("t4"))
      TF.bindOnce(stats) { s =>
        def topFrac(t: String): Column = {
          val st = s.getField(t)
          // size guard: the fold over an EMPTY n-gram list yields
          // (0, 0) and 0/chars = 0.0 — but "no n-grams" is no
          // evidence, and the rule must PASS, not read "zero
          // coverage" (NULL metric)
          when(st.getField("n") > 0,
            frac(st.getField("bc") * st.getField("bl"), s.getField("wc")))
            .otherwise(lit(null).cast("double"))
        }
        struct(
          s.getField("nw").as("n_words"),
          frac(s.getField("wc"), s.getField("nw")).as("mean_word_len"),
          frac(s.getField("aw"), s.getField("nw")).as("alpha_frac"),
          s.getField("nstop").as("n_stop"),
          frac(s.getField("sym"), s.getField("nw")).as("symbol_ratio"),
          frac(s.getField("bul"), s.getField("nl")).as("bullet_frac"),
          frac(s.getField("ell"), s.getField("nl")).as("ellipsis_frac"),
          frac(s.getField("dl").getField("occ"),
            s.getField("nl")).as("dup_line_frac"),
          frac(s.getField("dl").getField("chars"),
            s.getField("lchars")).as("dup_line_char_frac"),
          frac(s.getField("dp").getField("occ"),
            s.getField("np")).as("dup_para_frac"),
          frac(s.getField("dp").getField("chars"),
            s.getField("pchars")).as("dup_para_char_frac"),
          topFrac("t2").as("top2_char_frac"),
          topFrac("t3").as("top3_char_frac"),
          topFrac("t4").as("top4_char_frac"))
      }
    }
    when(text.isNull, lit(null)).otherwise(bound)
  }

  /** Per-rule pass flags over a metrics struct (NULL metric → pass,
    * except the word-count bounds where 0 words is evidence). */
  def ruleFlags(m: Column, cfg: Config): Column = {
    def pass(c: Column) = coalesce(c, lit(true))
    struct(
      (m.getField("n_words") >= cfg.minWords &&
        m.getField("n_words") <= cfg.maxWords).as("ok_words"),
      pass(m.getField("mean_word_len").between(
        cfg.minMeanWordLen, cfg.maxMeanWordLen)).as("ok_word_len"),
      pass(m.getField("alpha_frac") >= cfg.minAlphaFrac).as("ok_alpha"),
      (m.getField("n_stop") >= cfg.minStopWords).as("ok_stop"),
      pass(m.getField("symbol_ratio") <= cfg.maxSymbolRatio).as("ok_symbol"),
      pass(m.getField("bullet_frac") <= cfg.maxBulletFrac).as("ok_bullet"),
      pass(m.getField("ellipsis_frac") <= cfg.maxEllipsisFrac).as("ok_ellipsis"),
      pass(m.getField("dup_line_frac") <= cfg.maxDupLineFrac).as("ok_dup_line"),
      pass(m.getField("dup_line_char_frac") <=
        cfg.maxDupLineCharFrac).as("ok_dup_line_chars"),
      pass(m.getField("dup_para_frac") <= cfg.maxDupParaFrac).as("ok_dup_para"),
      pass(m.getField("dup_para_char_frac") <=
        cfg.maxDupParaCharFrac).as("ok_dup_para_chars"),
      pass(m.getField("top2_char_frac") <= cfg.maxTop2CharFrac).as("ok_top2"),
      pass(m.getField("top3_char_frac") <= cfg.maxTop3CharFrac).as("ok_top3"),
      pass(m.getField("top4_char_frac") <= cfg.maxTop4CharFrac).as("ok_top4"))
  }

  /** Every flag of a [[ruleFlags]] struct (registry rows that carry
    * the struct as a column compose keep from it without re-deriving
    * the metrics expression). */
  def allOk(flags: Column): Column =
    Seq("ok_words", "ok_word_len", "ok_alpha", "ok_stop",
      "ok_symbol", "ok_bullet", "ok_ellipsis", "ok_dup_line",
      "ok_dup_line_chars", "ok_dup_para", "ok_dup_para_chars",
      "ok_top2", "ok_top3", "ok_top4")
      .map(flags.getField).reduce(_ && _)

  /** Keep-filter form (the intake-gate shape): true iff every rule
    * passes; NULL text PASSES (no-evidence — upstream gates own
    * NULL/empty handling, matching [[QualityClassifier.keeps]]). The
    * metric struct binds once — fourteen flag reads would otherwise
    * each re-run the whole computation ([[TF.bindOnce]]). */
  def keeps(text: Column, cfg: Config = Config()): Column =
    text.isNull ||
      TF.bindOnce(metrics(text))(m => allOk(ruleFlags(m, cfg)))
}
