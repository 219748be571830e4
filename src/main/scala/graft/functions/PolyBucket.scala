package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native portable feature-hash bucket (SURVEY §2.9 L42/L46/L47,
  * custom-Expression tier): the explicit per-character polynomial fold
  * `h = (h·31 + codepoint) mod 1000003` seeded 7, then `mod dim` — the
  * engine-portable hash every trained operator buckets features with
  * (QualityClassifier / LangId / Dsir), restated by the DuckDB oracles
  * as `list_reduce` over `ascii` values.
  *
  * The built-in formulation (`aggregate(transform(sequence(1, len),
  * i => ascii(substr(i, 1))), …)`) evaluates ~30 interpreted expression
  * nodes per character — all Spark higher-order functions are
  * CodegenFallback — which multiplied across a few hundred features per
  * document made the hash the dominant cost of every trained gate's
  * scoring fold (the l42/l43 attempt-log lesson). This kernel is one
  * statically-compiled code-point loop.
  *
  * Semantics match the fold exactly: Spark's `ascii` is
  * `toString.codePointAt(0)` of the 1-char (= 1-code-point) substring,
  * so the loop walks `String.codePointAt` with `Character.charCount`
  * strides. NULL in → NULL out. (The fold and the kernel differ only on
  * the EMPTY string — `sequence(1, 0)` counts DOWN, folding two phantom
  * zeros — but no caller hashes an empty feature: tokens and n-grams
  * are non-empty by construction.)
  */
case class PolyBucket(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0, s"poly_bucket needs dim > 0, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"poly_bucket requires a string column, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "poly_bucket"

  override protected def nullSafeEval(input: Any): Any =
    PolyBucketKernel.compute(input.asInstanceOf[UTF8String], dim)

  // one static call from generated code — stays inside whole-stage
  // codegen, no row boxing
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyBucketKernel.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): PolyBucket =
    copy(child = newChild)
}

object PolyBucketKernel {
  /** Seed-7 polynomial code-point fold mod 1000003, then mod dim.
    *
    * Walks code points directly over the UTF-8 bytes
    * (`numBytesForFirstByte` strides + `codePointFrom`) — no
    * per-feature `java.lang.String` allocation/decode on what is the
    * hottest path of every trained gate's scoring fold. Structurally
    * malformed UTF-8 (truncated sequence, bad continuation byte) falls
    * back to the `toString` code-point walk, whose replacement-char
    * decoding defined the kernel's original semantics — well-formed
    * text (every real caller) never takes the fallback. */
  def compute(s: UTF8String, dim: Int): Int = {
    val nb = s.numBytes()
    var h = 7L
    var i = 0
    while (i < nb) {
      val b0 = s.getByte(i)
      val len = UTF8String.numBytesForFirstByte(b0)
      // structural validity: a continuation/invalid lead reports len 1
      // with its high bit set; >4 never occurs in well-formed UTF-8
      if (len > 4 || (len == 1 && (b0 & 0x80) != 0) || i + len > nb)
        return computeFallback(s, dim)
      var j = i + 1
      while (j < i + len) {
        if ((s.getByte(j) & 0xC0) != 0x80) return computeFallback(s, dim)
        j += 1
      }
      val cp = s.codePointFrom(i)
      // semantic validity: overlong forms, surrogates, and
      // out-of-range code points decode to U+FFFD on the String path
      val ok = len match {
        case 1 => true
        case 2 => cp >= 0x80
        case 3 => cp >= 0x800 && !(cp >= 0xD800 && cp <= 0xDFFF)
        case _ => cp >= 0x10000 && cp <= 0x10FFFF
      }
      if (!ok) return computeFallback(s, dim)
      h = (h * 31L + cp) % 1000003L
      i += len
    }
    (h % dim).toInt
  }

  /** The original String-decoding walk — exact legacy semantics for
    * malformed input (Java replaces bad sequences with U+FFFD). */
  private def computeFallback(s: UTF8String, dim: Int): Int = {
    val str = s.toString
    var h = 7L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % 1000003L
      i += Character.charCount(cp)
    }
    (h % dim).toInt
  }
}
