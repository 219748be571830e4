package graft

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Block-level boilerplate removal (TF.extractContent — the jusText
  * family). The l26 registry row pins the end-to-end planted-page
  * contract against DuckDB; these cases pin the classifier's two rules
  * (minChars, link density) at their boundaries, plus the invisible
  * content and NULL paths the oracle row cannot isolate. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, minChars: Int = 20,
      maxLinkDensity: Double = 0.33): String =
    Seq(html).toDF("h")
      .select(TF.extractContent(col("h"), minChars, maxLinkDensity).as("c"))
      .collect()(0).getString(0)

  test("content survives; link-only menus and short fragments drop") {
    val page = """<div class="nav"><ul><li><a href="/">Home</a></li><li><a href="/x">About us</a></li></ul></div><p>This content block is long enough to keep entirely.</p><div>tiny</div>"""
    assert(extract(page) === "This content block is long enough to keep entirely.")
  }

  test("link-density boundary: a long block dies once links dominate it") {
    // visible 48 chars incl. 31 link chars (density .65 > .33) → drop;
    // same block with the links' text inlined as plain text → keep
    val footer = """<div><a href="/tos">Terms of Service</a> <a href="/p">Privacy Policy</a> (c) 2026 site</div><p>Plain sentence that is clearly long enough to stay.</p>"""
    assert(extract(footer) === "Plain sentence that is clearly long enough to stay.")
    val plain = """<div>Terms of Service Privacy Policy (c) 2026 site</div>"""
    assert(extract(plain) === "Terms of Service Privacy Policy (c) 2026 site")
  }

  test("minChars boundary is inclusive and counts collapsed visible text") {
    // exactly 20 visible chars (tags → space, runs collapsed) survives
    val b20 = "<p>abcde fghij klmnop x</p>"
    assert(b20.length - "<p></p>".length === 20)
    assert(extract(b20) === "abcde fghij klmnop x")
    assert(extract("<p>abcde fghij klmno </p>") === "")
  }

  test("script/style bodies and comments never become text; inline tags do not split blocks") {
    val page = """<script>var x = "<p>fake block</p>";</script><style>p { color: red }</style><!-- <p>note</p> --><p>Real <b>bold</b> run of twenty+ chars.</p>"""
    assert(extract(page) === "Real bold run of twenty+ chars.")
  }

  test("anchors without attributes count toward link density; NULL html stays NULL") {
    // bare <a> (no attrs) must still register as link text
    val bare = """<div><a>One</a> <a>Two</a> <a>Three</a> and four words</div>"""
    assert(extract(bare, minChars = 5) === "")
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "h")
      .select(TF.extractContent(col("h")).as("c")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("multiple surviving blocks join in document order with single spaces") {
    val page = """<p>First surviving block of text here.</p><ul><li><a href="/">Nav</a></li></ul><p>Second surviving block of text here.</p>"""
    assert(extract(page) ===
      "First surviving block of text here. Second surviving block of text here.")
  }
}
