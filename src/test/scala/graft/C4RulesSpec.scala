package graft

import graft.operators.{C4Rules => C4}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit contracts for the C4 line-surgery pack (the l44 registry row
  * carries the cross-engine differential over documents ∪ planted
  * fixture; these pin each line rule, the rebuild, the doc rules, and
  * the NULL conventions on hand-written docs). */
class C4RulesSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = C4.Config()

  private def cleanOf(text: String): String =
    Seq(Option(text)).toDF("text")
      .select(C4.cleanedText($"text", cfg).as("c")).as[String].head()

  private def metricsOf(text: String): Row =
    Seq(Option(text)).toDF("text")
      .select(C4.metricsOfCleaned(C4.cleanedText($"text", cfg), cfg).as("m"))
      .select("m.*").head()

  private def keepOf(text: Option[String]): Boolean =
    Seq(text).toDF("text")
      .select(C4.keeps($"text", cfg).as("k")).as[Boolean].head()

  private val good3 =
    "the cat sat on the mat today.\n" +
      "the dog ran across the green field.\n" +
      "many people walk along the river at dawn."

  test("L49: each line rule drops exactly its line; the doc rebuilds from survivors") {
    // terminal punctuation required
    assert(cleanOf(good3 + "\nthis line has five good words") === good3)
    // at least five words required
    assert(cleanOf(good3 + "\nfour words right here.") === good3)
    // javascript / policy-phrase lines drop (substring on lowered line)
    assert(cleanOf(good3 + "\nplease enable JavaScript to continue reading.") === good3)
    assert(cleanOf(good3 + "\nthis site Uses Cookies to improve your experience.") === good3)
    assert(cleanOf(good3 + "\nplease read our privacy policy before continuing on.") === good3)
    // a line ending in a closing quote survives (C4 end-mark set)
    val q = "they shouted \"we will go to the hills.\""
    assert(cleanOf(good3 + "\n" + q) === good3 + "\n" + q)
    // whitespace-only and empty lines never appear in the rebuild
    assert(cleanOf("   \n" + good3 + "\n\n   \n") === good3)
  }

  test("L49: doc-level rules judge the REBUILT text") {
    // fewer than 3 sentence marks after surgery → dies
    assert(!keepOf(Some("the cat sat on the mat today.\nthe dog ran across the green field.")))
    assert(keepOf(Some(good3)))
    // lorem ipsum / brace / bad word inside a SURVIVING line kill the doc
    assert(!keepOf(Some(good3 + "\nthe printed sample read lorem ipsum dolor sit amet today.")))
    assert(!keepOf(Some(good3 + "\nthe code sample { x } appears in the documentation today.")))
    assert(!keepOf(Some(good3 + "\nthe filter flags porn content in this line today.")))
    // ... but a doc-level trigger inside a DYING line is gone before
    // the doc rules run (the surgery-then-judge order)
    assert(keepOf(Some(good3 + "\nlorem ipsum short")))
    assert(keepOf(Some(good3 + "\n{ code }")))
  }

  test("L49: bad-word matching is whole-word on the lowered text") {
    // substring inside a longer word must NOT match (\b boundaries)
    assert(keepOf(Some(good3 + "\nthe sternly worded report was xxxl sized anyway today.")))
    assert(!keepOf(Some(good3 + "\nthe report was rated XXX by the reviewing board today.")))
  }

  test("L49: metrics of the rebuilt text — counts, flags, empty rebuild") {
    val m = metricsOf(good3 + "\nno punctuation line of five words")
    assert(m.getLong(m.fieldIndex("n_kept")) === 3L)
    assert(m.getLong(m.fieldIndex("n_sentences")) === 3L)
    assert(!m.getBoolean(m.fieldIndex("has_lorem")))
    assert(!m.getBoolean(m.fieldIndex("has_brace")))
    assert(!m.getBoolean(m.fieldIndex("has_bad_word")))
    // every line dies → empty rebuild → zero counts, doc dies
    val e = metricsOf("no terminal punctuation here at all")
    assert(e.getLong(e.fieldIndex("n_kept")) === 0L)
    assert(e.getLong(e.fieldIndex("n_sentences")) === 0L)
    assert(!keepOf(Some("no terminal punctuation here at all")))
  }

  test("L49: NULL text passes the gate and rebuilds to NULL") {
    assert(keepOf(None))
    val c = Seq(Option.empty[String]).toDF("text")
      .select(C4.cleanedText($"text", cfg).as("c")).collect()(0)
    assert(c.isNullAt(0))
  }

  test("L49: config knobs — relaxed word minimum and custom blocklist") {
    val lax = C4.Config(minWordsPerLine = 2, minSentences = 1,
      badWords = Seq("gadget"))
    val got = Seq(Option("two words.\nthe gadget broke."))
      .toDF("text").select(C4.keeps($"text", lax).as("k")).as[Boolean].head()
    assert(!got) // blocklist word in a surviving line kills
    val ok = Seq(Option("two words.\nanother fine line."))
      .toDF("text").select(C4.keeps($"text", lax).as("k")).as[Boolean].head()
    assert(ok)
  }
}
