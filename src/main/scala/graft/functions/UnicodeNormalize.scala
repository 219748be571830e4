package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object UnicodeNormalize {
  /** Runtime kernel shared by eval and codegen, two fast paths:
    * a byte scan returns pure-ASCII input (the overwhelming majority
    * of corpus bytes) untouched with ZERO allocation — ASCII is
    * normalized under every form — and non-ASCII text that
    * `isNormalized` accepts skips only the re-encode (the decode to
    * String is unavoidable there: the Normalizer API is String-in). */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n && (s.getByte(i) & 0x80) == 0) i += 1
    if (i == n) return s // pure ASCII: no decode, no allocation
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** Unicode normalization of a string column (NFC/NFD/NFKC/NFKD) — the
  * first step of any text-cleaning pipeline (a corpus mixes composed
  * and decomposed encodings of the same glyphs; dedup, fingerprints and
  * token counts all diverge on the byte forms unless normalized first).
  * Spark ships no normalizer builtin, so this is the custom-Expression
  * tier of the operator ladder (same as [[CosineF32]]): no UDF
  * dispatch, stays inside whole-stage codegen, with an is-normalized
  * fast path that makes ASCII effectively free. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize requires a string, got ${child.dataType}")
    else if (!Set("NFC", "NFD", "NFKC", "NFKD").contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$form' (NFC, NFD, NFKC, NFKD)")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val formEnum: Normalizer.Form =
    Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], formEnum)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", formEnum,
      classOf[Normalizer.Form].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormalize.normalize($c, $formRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}
