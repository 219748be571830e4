package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object StripHtml {

  /** The ubiquitous named entities (HTML 4 core + the quotes/dashes web
    * text actually carries). `nbsp` maps to a REGULAR space by design:
    * this is a strip-for-text-processing decoder, and U+00A0 would
    * silently survive every downstream whitespace collapse (` `
    * is in no engine's `\s`). */
  private val entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "trade" -> "™")

  /** Single-pass HTML-to-text: every tag becomes one space (so
    * `a<br>b` tokenizes as two words, never one), comments and the
    * entire CONTENT of `<script>`/`<style>` elements drop (code and CSS
    * are not prose), and entities decode — the named set above plus
    * full numeric `&#NNN;` / `&#xHH;` forms. Anything malformed (an
    * unterminated tag or entity, an unknown name, a codepoint out of
    * range) passes through literally rather than being eaten — the
    * never-garbage contract: stripping must not destroy text it does
    * not understand. Compose with
    * [[TextFunctions.normalizeText]] for whitespace cleanup. */
  def strip(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n)
    // '<' opens markup only before a letter, '/', '!' or '?' (the HTML5
    // tokenizer's rule): prose comparisons and emoticons ("a < b > c",
    // "<3") are literal text, and deleting the span between them would
    // destroy real words
    def opensMarkup(i: Int): Boolean = i + 1 < n && {
      val d = html.charAt(i + 1)
      Character.isLetter(d) || d == '/' || d == '!' || d == '?'
    }
    // closing-'>' scan honoring quoted attribute values: a '>' inside
    // "..." or '...' is attribute DATA, not the tag close (the HTML5
    // attribute-value states), so '<a title="a>b">' closes at the final
    // '>'. An unterminated quote falls back to the first raw '>' — the
    // never-garbage contract prefers over-keeping to eating the file.
    def findTagClose(from: Int): Int = {
      var p = from
      while (p < n) {
        val c = html.charAt(p)
        if (c == '>') return p
        if (c == '"' || c == '\'') {
          val endQ = html.indexOf(c, p + 1)
          if (endQ < 0) return html.indexOf('>', from) // unterminated quote
          p = endQ + 1
        } else p += 1
      }
      -1
    }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && opensMarkup(i)) {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          if (end < 0) { out.append(c); i += 1 } // unterminated: literal
          else { out.append(' '); i = end + 3 }
        } else {
          val close = findTagClose(i + 1)
          if (close < 0) { out.append(c); i += 1 } // unterminated: literal
          else {
            // tag name, lower-cased, for the script/style content skip
            var j = i + 1
            if (j < n && html.charAt(j) == '/') j += 1
            var k = j
            while (k < close && Character.isLetterOrDigit(html.charAt(k))) k += 1
            val name = html.substring(j, k).toLowerCase
            // a trailing '/' is IGNORED on script/style (the HTML5
            // tokenizer has no self-closing state for raw-text elements:
            // '<script src=x/>' keeps the element open in every browser)
            if ((name == "script" || name == "style") &&
                html.charAt(i + 1) != '/') {
              // case-INSENSITIVE close-tag scan: </SCRIPT> is as common
              // as </script> in older markup, and missing it would leak
              // the element's code/CSS into the prose output
              val endTag = "</" + name
              var e = -1
              var p = close + 1
              while (e < 0 && p <= n - endTag.length) {
                if (html.regionMatches(true, p, endTag, 0, endTag.length)) e = p
                else p += 1
              }
              // tolerate whitespace before the closing '>'
              val eClose = if (e < 0) -1 else html.indexOf('>', e + endTag.length)
              if (e < 0 || eClose < 0) { out.append(' '); i = close + 1 }
              else { out.append(' '); i = eClose + 1 }
            } else { out.append(' '); i = close + 1 }
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        // entities are short; a distant ';' means this '&' is literal
        if (semi < 0 || semi - i > 10) { out.append(c); i += 1 }
        else {
          val body = html.substring(i + 1, semi)
          // surrogate codepoints are excluded even though
          // isValidCodePoint admits them: toChars on a lone surrogate
          // builds an invalid UTF-16 string whose UTF-8 re-encode is
          // garbage bytes — such references pass through literally
          def fromCp(cp: Int): String =
            if (Character.isValidCodePoint(cp) &&
                !(cp >= Character.MIN_SURROGATE && cp <= Character.MAX_SURROGATE))
              new String(Character.toChars(cp))
            else null
          val decoded: String =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try fromCp(Integer.parseInt(body.substring(2), 16))
              catch { case _: NumberFormatException => null }
            } else if (body.startsWith("#")) {
              try fromCp(Integer.parseInt(body.substring(1)))
              catch { case _: NumberFormatException => null }
            } else entities.getOrElse(body, null)
          if (decoded == null) { out.append(c); i += 1 } // unknown: literal
          else { out.append(decoded); i = semi + 1 }
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  def strip(s: UTF8String): UTF8String = {
    // fast path: no markup, no entities — return the input untouched
    val n = s.numBytes()
    var i = 0
    var clean = true
    while (clean && i < n) {
      val b = s.getByte(i)
      if (b == '<' || b == '&') clean = false
      i += 1
    }
    if (clean) s else UTF8String.fromString(strip(s.toString))
  }
}

/** HTML-to-text as a native expression (custom-Expression tier, like
  * [[UnicodeNormalize]]): web corpora arrive as markup, and tags,
  * scripts and entities poison every downstream token count, dedup
  * shingle and quality signal. One imperative pass per row with a
  * no-markup byte-scan fast path; malformed input passes through
  * literally (never-garbage contract — see [[StripHtml.strip]]). */
case class StripHtml(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_html"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_html requires a string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    StripHtml.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripHtml.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripHtml =
    copy(child = newChild)
}
