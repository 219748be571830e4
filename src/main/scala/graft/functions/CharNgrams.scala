package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-grams over a string column (SURVEY §2.9 L6,
  * custom-Expression tier of the operator ladder): one pass over the
  * UTF-8 bytes collecting char-boundary offsets, then each n-gram is an
  * O(1) byte-range slice — O(len + ngrams) total.
  *
  * The built-in formulation (`transform(sequence(...), i => substr(i, n))`)
  * is O(len²): every `substr(i, n)` re-scans from the string start to
  * find char position i. At ~300-char test docs that is interpretive
  * noise; at real multi-KB corpus documents the quadratic term dominates.
  * (The tempting linear rewrite — `split(text, "")` materialized then
  * sliced per position — is worse still: project collapse inlines the
  * used-once split into the HOF lambda and re-runs the regex split per
  * element; measured 12× slower than even the substr form.)
  *
  * Semantics match `substr`-based n-grams exactly: char boundaries via
  * UTF-8 first-byte classification, `numChars < n` yields an empty array,
  * NULL in → NULL out. Elements are never null.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"char_ngrams needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires a string column, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    CharNgramsKernel.compute(input.asInstanceOf[UTF8String], n)

  // The loop lives in the statically-compiled kernel; generated code
  // makes one call, so the expression stays inside whole-stage codegen
  // (no CodegenFallback row boxing).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgramsKernel.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgramsKernel {
  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Single-pass n-gram slicer; called from both interpreted eval and
    * generated code (static forwarder). */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val numChars = s.numChars()
    if (numChars < n) return Empty
    val bytes = s.getBytes
    // char start byte-offsets; starts(numChars) = total length sentinel
    val starts = new Array[Int](numChars + 1)
    var c = 0
    var i = 0
    while (i < bytes.length) {
      starts(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    starts(c) = bytes.length
    val out = new Array[Any](numChars - n + 1)
    var j = 0
    while (j < out.length) {
      out(j) = UTF8String.fromBytes(bytes, starts(j), starts(j + n) - starts(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
