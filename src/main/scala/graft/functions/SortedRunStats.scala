package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native equal-run statistics over a string list (SURVEY §2.9 L45,
  * custom-Expression tier): sort, walk adjacent runs once, and emit the
  * four integers the Gopher repetition rules divide —
  * `(dup_occ, dup_chars, top_count, top_len)` where a value occurring
  * c > 1 times contributes c occurrences and c·chars to the dup pair,
  * and the top pair is the max run count with ties resolved to the
  * LONGEST value (`top_len` = numChars − `extraChars`, the n-gram
  * joining-space correction; `top_len` of the empty list is 0).
  *
  * This replaces the `aggregate(array_sort(…), struct-accumulator)`
  * folds ([[graft.operators.GopherRules]]'s dupStats/topRunStats),
  * which evaluate ~40 interpreted expression nodes + one struct
  * allocation PER ELEMENT (all higher-order functions are
  * CodegenFallback) — measured as the dominant cost of the Gopher gate
  * (the l41 attempt-log lesson). Semantics are identical: the fold's
  * result depends only on equal-value grouping and per-value char
  * lengths, both engine-exact integers, so the DuckDB regroup oracle
  * is unchanged. NULL list elements are ignored (treated as absent —
  * the `list_filter(.., x -> x IS NOT NULL)` reading); every real
  * caller builds the list from trimmed non-empty segments or token
  * n-grams and never produces one, so the skip never fires there.
  */
case class SortedRunStats(child: Expression, extraChars: Int)
    extends UnaryExpression {
  require(extraChars >= 0, s"extraChars must be >= 0, got $extraChars")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sorted_run_stats requires array<string>, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("occ", LongType, nullable = false),
    StructField("chars", LongType, nullable = false),
    StructField("bc", LongType, nullable = false),
    StructField("bl", LongType, nullable = false)))
  override def prettyName: String = "sorted_run_stats"

  override protected def nullSafeEval(input: Any): Any =
    SortedRunStatsKernel.compute(input.asInstanceOf[ArrayData], extraChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SortedRunStatsKernel.compute($c, $extraChars)")

  override protected def withNewChildInternal(newChild: Expression): SortedRunStats =
    copy(child = newChild)
}

object SortedRunStatsKernel {
  /** One sort + one run walk; called from interpreted eval and
    * generated code (static forwarder). The zero result is allocated
    * per call — consumers are entitled to hold the returned row, and a
    * shared mutable singleton escaping per-row eval is exactly the
    * aliasing Spark internals occasionally violate across versions. */
  def compute(arr: ArrayData, extraChars: Int): InternalRow = {
    val n0 = arr.numElements()
    val vs0 = new Array[UTF8String](n0)
    var n = 0
    var i = 0
    while (i < n0) {
      val v = arr.getUTF8String(i)
      if (v != null) { vs0(n) = v; n += 1 } // nulls absent by contract
      i += 1
    }
    if (n == 0) return InternalRow(0L, 0L, 0L, 0L)
    val vs = if (n == n0) vs0 else java.util.Arrays.copyOf(vs0, n)
    // grouping is all that matters (the fold sorted only to make equal
    // values adjacent); UTF8String ordering is cheap byte compare
    java.util.Arrays.sort(vs.asInstanceOf[Array[AnyRef]])
    var occ = 0L; var chars = 0L; var bc = 0L; var bl = 0L
    var runStart = 0
    i = 0
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
    InternalRow(occ, chars, bc, bl)
  }
}
