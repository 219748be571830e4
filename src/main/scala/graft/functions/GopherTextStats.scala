package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native FUSED text-metrics pass for the Gopher rule pack (custom-
  * Expression tier, the [[SortedRunStats]] discipline): ONE walk over
  * the document computes every integer the fourteen Gopher metrics
  * divide — token/line/paragraph counts and char sums, alpha/stop/
  * symbol/bullet/ellipsis counts, duplicate-run stats for lines and
  * paragraphs, and the top-2/3/4-gram run stats — where the built-in
  * form evaluates ~8 higher-order-function folds per row (every Spark
  * HOF is CodegenFallback: an interpreted lambda dispatch plus
  * accumulator allocation PER ELEMENT), re-tokenizes for each n-gram
  * order, and allocates three separate n-gram string lists.
  *
  * Parity contract (pinned property-wise in GopherRulesSpec against the
  * retained HOF form [[graft.operators.GopherRules.metricsHof]]): every
  * primitive is the SAME primitive the built-in expressions call —
  * `UTF8String.toLowerCase` (Lower), `UTF8String.split(regex, -1)`
  * (StringSplit), `UTF8String.trim()` (StringTrim), `numChars` (Length),
  * `java.util.regex` find/loop (RLike / RegExpCount), UTF8String
  * byte-order sort + run walk ([[SortedRunStatsKernel]]) — so the
  * emitted integers are bit-identical and the DuckDB oracle that
  * restates the rules relationally is untouched.
  *
  * Output: a 22-long struct (see [[GopherTextStatsKernel.schema]]);
  * NULL text → NULL struct (the caller's no-evidence convention rides
  * on standard null propagation).
  */
case class GopherTextStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gopher_text_stats requires string, got $t")
  }
  override def dataType: DataType = GopherTextStatsKernel.schema
  override def prettyName: String = "gopher_text_stats"

  override protected def nullSafeEval(input: Any): Any =
    GopherTextStatsKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GopherTextStatsKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherTextStats =
    copy(child = newChild)
}

object GopherTextStatsKernel {
  /** Field order is load-bearing for consumers reading by name via
    * getField — keep additions at the end. */
  val schema: StructType = StructType(Seq(
    "nw", "wc", "aw", "nstop", "sym", "nl", "lchars", "bul", "ell",
    "dl_occ", "dl_chars", "np", "pchars", "dp_occ", "dp_chars",
    "t2_bc", "t2_bl", "t2_n", "t3_bc", "t3_bl", "t3_n",
    "t4_bc", "t4_bl", "t4_n").map(StructField(_, LongType, nullable = false)))

  private val WsRe = UTF8String.fromString("\\s+")
  private val NlRe = UTF8String.fromString("\n")
  private val ParaRe = UTF8String.fromString("\n{2,}")
  private val AlphaRe = java.util.regex.Pattern.compile("[a-z]")
  private val EllipsisRe = java.util.regex.Pattern.compile("\\.\\.\\.|…")
  private val Space = UTF8String.fromString(" ")
  private val StopWords: Array[UTF8String] =
    graft.operators.GopherRules.StopWords.map(UTF8String.fromString).toArray
  private val Bullets: Array[UTF8String] =
    Array("•", "●", "-", "*").map(UTF8String.fromString)
  private val Dots = UTF8String.fromString("...")
  private val Ellipsis = UTF8String.fromString("…")

  /** (occ, chars, bc, bl) over the first `n` entries of `vs` — the
    * [[SortedRunStatsKernel]] walk inlined over a plain array (same
    * UTF8String byte-order sort, same tie rule). SORTS `vs` IN PLACE. */
  private def runStats(vs: Array[UTF8String], n: Int,
      extraChars: Int): Array[Long] = {
    if (n == 0) return Array(0L, 0L, 0L, 0L)
    java.util.Arrays.sort(vs.asInstanceOf[Array[AnyRef]], 0, n)
    var occ = 0L; var chars = 0L; var bc = 0L; var bl = 0L
    var runStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || (i > runStart && !vs(i).equals(vs(runStart)))) {
        val run = (i - runStart).toLong
        val len = vs(runStart).numChars().toLong
        if (run > 1) { occ += run; chars += run * len }
        val topLen = len - extraChars
        if (run > bc) { bc = run; bl = topLen }
        else if (run == bc && topLen > bl) bl = topLen
        runStart = i
      }
      i += 1
    }
    Array(occ, chars, bc, bl)
  }

  /** n-gram run stats over the token array: grams joined with " "
    * (the `concat_ws(" ", slice(toks, …))` spelling), extraChars =
    * n−1. Returns (bc, bl, nGrams). */
  private def gramStats(toks: Array[UTF8String], n: Int): Array[Long] = {
    val k = toks.length - n + 1
    if (k <= 0) return Array(0L, 0L, 0L)
    val grams = new Array[UTF8String](k)
    var i = 0
    while (i < k) {
      // UTF8String.concatWs is exactly what concat_ws evaluates to
      grams(i) = UTF8String.concatWs(Space,
        java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      i += 1
    }
    val st = runStats(grams, k, n - 1)
    Array(st(2), st(3), k.toLong)
  }

  def compute(text: UTF8String): InternalRow = {
    // tokens: filter(split(lower(text), "\s+"), len > 0)
    val rawToks = text.toLowerCase.split(WsRe, -1)
    var nTok = 0
    var i = 0
    while (i < rawToks.length) {
      if (rawToks(i).numChars() > 0) { rawToks(nTok) = rawToks(i); nTok += 1 }
      i += 1
    }
    val toks = if (nTok == rawToks.length) rawToks
      else java.util.Arrays.copyOf(rawToks, nTok)
    var wc = 0L; var aw = 0L
    i = 0
    while (i < nTok) {
      wc += toks(i).numChars()
      // rlike("[a-z]"): ASCII lowercase bytes never occur inside a
      // UTF-8 multibyte sequence, so the byte scan equals the regex
      val t = toks(i)
      var j = 0
      var hit = false
      while (!hit && j < t.numBytes()) {
        val b = t.getByte(j)
        if (b >= 'a'.toByte && b <= 'z'.toByte) hit = true
        j += 1
      }
      if (hit) aw += 1
      i += 1
    }
    var nstop = 0L
    i = 0
    while (i < StopWords.length) {
      val w = StopWords(i)
      var j = 0
      var found = false
      while (!found && j < nTok) { if (toks(j).equals(w)) found = true; j += 1 }
      if (found) nstop += 1
      i += 1
    }
    // symbols over the RAW text: '#' chars + non-overlapping ".../…"
    var sym = 0L
    i = 0
    while (i < text.numBytes()) { if (text.getByte(i) == '#'.toByte) sym += 1; i += 1 }
    val em = EllipsisRe.matcher(text.toString)
    while (em.find()) sym += 1
    // lines: filter(transform(split(text, "\n"), trim), len > 0)
    val rawLines = text.split(NlRe, -1)
    var nl = 0
    i = 0
    while (i < rawLines.length) {
      val tr = rawLines(i).trim()
      if (tr.numChars() > 0) { rawLines(nl) = tr; nl += 1 }
      i += 1
    }
    var lchars = 0L; var bul = 0L; var ell = 0L
    i = 0
    while (i < nl) {
      val l = rawLines(i)
      lchars += l.numChars()
      var b = 0
      var isBul = false
      while (!isBul && b < Bullets.length) {
        if (l.startsWith(Bullets(b))) isBul = true
        b += 1
      }
      if (isBul) bul += 1
      if (l.endsWith(Dots) || l.endsWith(Ellipsis)) ell += 1
      i += 1
    }
    // runStats sorts in place — bullet/ellipsis counts above must come first
    val dl = runStats(rawLines, nl, 0)
    // paragraphs: filter(transform(split(text, "\n{2,}"), trim), len > 0)
    val rawParas = text.split(ParaRe, -1)
    var np = 0
    i = 0
    while (i < rawParas.length) {
      val tr = rawParas(i).trim()
      if (tr.numChars() > 0) { rawParas(np) = tr; np += 1 }
      i += 1
    }
    var pchars = 0L
    i = 0
    while (i < np) { pchars += rawParas(i).numChars(); i += 1 }
    val dp = runStats(rawParas, np, 0)
    val t2 = gramStats(toks, 2)
    val t3 = gramStats(toks, 3)
    val t4 = gramStats(toks, 4)
    InternalRow(nTok.toLong, wc, aw, nstop, sym, nl.toLong, lchars, bul, ell,
      dl(0), dl(1), np.toLong, pchars, dp(0), dp(1),
      t2(0), t2(1), t2(2), t3(0), t3(1), t3(2), t4(0), t4(1), t4(2))
  }
}
