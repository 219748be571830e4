package graft

import graft.operators.{GopherRules => G}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit contracts for the Gopher rule pack (the l41 registry row
  * carries the cross-engine differential over documents ∪ planted
  * fixture; these pin each metric's arithmetic on hand-computed docs
  * and each rule's flag on its violating plant). */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def metricsOf(text: String): Row =
    Seq(Option(text)).toDF("text")
      .select(G.metrics($"text").as("m")).select("m.*").head()

  private def flagsOf(text: String): Row =
    Seq(Option(text)).toDF("text")
      .select(G.ruleFlags(G.metrics($"text"), G.Config()).as("f"))
      .select("f.*").head()

  private def flag(text: String, name: String): Boolean = {
    val r = flagsOf(text)
    r.getBoolean(r.fieldIndex(name))
  }

  private def keepOf(text: String): Boolean =
    Seq(Option(text)).toDF("text")
      .select(G.keeps($"text").as("k")).as[Boolean].head()

  test("fused kernel parity: metrics == metricsHof bit-for-bit over corpus docs, plants, and adversarial strings") {
    // the hand-built adversarial set: whitespace runs, tabs, CRs,
    // blank-line runs, bullets/ellipses, unicode (incl. non-ASCII
    // uppercase for the toLowerCase path and a surrogate pair for the
    // numChars-vs-UTF-16 distinction), '#'/dots overlaps, empty, and
    // every plant the l41 fixture carries
    val weird = Seq(
      "", " ", "\n", "\n\n\n", "a", "ONE Two tHRee", "a  b\t\tc\r\nd",
      "• bullet\n- dash\n* star\n● dot", "end...\nend…\nend....",
      "##x#y ... …. .....", "a b a b a b", "x\n\nx\n\n\nx\nx",
      "ÜBER Straße ÇĞİ drôle", "emoji 😀 pair 😀",
      "the be to of and that have with", "  lead trail  ",
      "tok1 tok2 tok3", "line with trailing spaces   \nnext",
      "verttab", "多个 中文 词 多个 中文 词")
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select($"text").as[String].collect().toSeq
    val all = (docs ++ weird).map(Option(_)) :+ None
    val df = all.toDF("text").localCheckpoint(true)
    val both = df.select(
      G.metrics($"text").as("a"), G.metricsHof($"text").as("b"))
    val diff = both.where(!($"a" <=> $"b")).count()
    assert(diff === 0L, s"$diff rows diverged between the fused kernel and the HOF form")
  }

  test("L45: hand-computed metrics — dup lines, top-2-gram, word stats") {
    val t = "one two one two three\none two one two three\nfour five"
    val r = metricsOf(t)
    def d(n: String): Double = r.getDouble(r.fieldIndex(n))
    assert(r.getLong(r.fieldIndex("n_words")) === 12L)
    assert(d("mean_word_len") === 42.0 / 12) // Σ token chars / tokens
    assert(d("alpha_frac") === 1.0)
    assert(r.getLong(r.fieldIndex("n_stop")) === 0L)
    // 2 duplicated lines of 21 chars over 3 lines / 51 line chars
    assert(d("dup_line_frac") === 2.0 / 3)
    assert(d("dup_line_char_frac") === 42.0 / 51)
    assert(d("dup_para_frac") === 0.0) // single paragraph, no blank lines
    // "one two" ×4, 6 word chars, over 42 total word chars
    assert(d("top2_char_frac") === 24.0 / 42)
  }

  test("L45: top-n-gram count ties resolve to the LONGEST n-gram") {
    // "a b" ×2 (2 word chars) ties "xx yy" ×2 (4 word chars) → 2×4/12
    val r = metricsOf("a b a b xx yy xx yy")
    assert(r.getDouble(r.fieldIndex("top2_char_frac")) === 8.0 / 12)
  }

  test("L45: metrics NULL when unmeasurable; those rules pass") {
    val r = metricsOf("12345") // one token, no lines beyond itself, no bigrams
    assert(r.isNullAt(r.fieldIndex("top2_char_frac"))) // <2 tokens
    val f = flagsOf("12345")
    assert(f.getBoolean(f.fieldIndex("ok_top2"))) // NULL passes
    assert(!f.getBoolean(f.fieldIndex("ok_words"))) // 1 word IS evidence
    assert(!f.getBoolean(f.fieldIndex("ok_alpha"))) // digit-only token
  }

  test("L45: each planted class trips exactly its rule flag") {
    val cases = Seq( // (unit, reps, flag expected false)
      ("• buy the thing now\n", 20, "ok_bullet"),
      ("we kept going and then stopped...\n", 20, "ok_ellipsis"),
      ("the same line of text repeated here\n", 30, "ok_dup_line"),
      ("one paragraph of text that repeats with many same words\n\n", 10,
        "ok_dup_para"),
      ("tag # marker # thing of the lot ", 20, "ok_symbol"),
      ("1234 5678 9012 3456 7890 of the ", 20, "ok_alpha"),
      ("click here ", 40, "ok_top2"),
      ("too short", 1, "ok_words"),
      ("pneumonoultramicroscopicsilicovolcanoconiosis" +
        " supercalifragilistic of the and that ", 15, "ok_word_len"),
      ("lorem ipsum dolor sit amet consectetur ", 15, "ok_stop"))
    cases.foreach { case (u, reps, f) =>
      assert(!flag(u * reps, f), s"expected $f=false for unit [$u]")
      assert(!keepOf(u * reps))
    }
  }

  test("L45: the compliant doc passes all fourteen rules; NULL text keeps") {
    val ok =
      "the quick brown fox jumps over a lazy dog\n" +
        "every good sentence should have some different words\n" +
        "people write many things about the wide world\n" +
        "reading takes time and gives back useful knowledge\n" +
        "rivers flow down from tall mountains into the sea\n" +
        "builders design strong houses with solid stone walls\n" +
        "farmers grow fresh food across wide open fields\n" +
        "children learn new games during long summer days\n"
    assert(keepOf(ok))
    val nullKeep = Seq(Option.empty[String]).toDF("text")
      .select(G.keeps($"text").as("k")).as[Boolean].head()
    assert(nullKeep)
  }

  test("L45: dup-paragraph metrics split on blank-line runs only") {
    // two identical paragraphs (each two lines) + one distinct
    val t = "alpha beta\ngamma delta\n\nalpha beta\ngamma delta\n\nepsilon zeta"
    val r = metricsOf(t)
    assert(r.getDouble(r.fieldIndex("dup_para_frac")) === 2.0 / 3)
    // within-paragraph lines ARE line duplicates (4 of 5 lines repeat)
    assert(r.getDouble(r.fieldIndex("dup_line_frac")) === 4.0 / 5)
  }
}
