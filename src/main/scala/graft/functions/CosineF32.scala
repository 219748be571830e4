package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two `array<float>` columns (SURVEY
  * §2.9 L3, custom-Expression tier of the operator ladder): one fused
  * codegen'd loop computing dot product and both norms in a single pass
  * over the primitive float arrays — no per-element lambda dispatch, no
  * intermediate arrays, stays inside whole-stage codegen.
  *
  * The higher-order-function form (`VectorFunctions.cosine`) allocates a
  * zipped array and evaluates three separate folds; this expression is
  * the hot-path replacement for brute-force scoring over large corpora.
  * Arrays are expected element-non-null (embedding columns); a length
  * mismatch (corrupt/truncated embedding) yields NULL — the same
  * semantics as the HOF form (zip_with null-pads) and [[CosineQ64]].
  * Scoring the common prefix instead would let a plausible-looking
  * partial score slip into top-k results.
  *
  * Semantics: double accumulation in index order, `dot / sqrt(nx * ny)`.
  */
case class CosineF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_f32 requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_f32"

  // Parquet/Arrow list elements are nullable by default, so the real
  // embedding columns arrive as containsNull=true even when no element
  // is ever null. A null element nulls the whole result (SQL semantics)
  // instead of getFloat() silently reading garbage; the per-element null
  // check is only emitted/taken when the input type admits nulls, so the
  // containsNull=false path stays the original tight loop.
  @transient private lazy val elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })
  // Unconditionally nullable: a length mismatch yields NULL even when
  // both inputs (and their elements) are non-nullable, so deriving
  // nullability from the children would let the optimizer elide null
  // checks around a value that CAN be null — and doGenCode would emit
  // `false = true;` (uncompilable) for the mismatch branch when
  // ev.isNull is the literal `false`. Same contract as [[CosineQ64]].
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    val checkNulls = elementsNullable
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val nullCheck = if (elementsNullable)
        s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) { ${ev.isNull} = true; }
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |if (!${ev.isNull}) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $xi = (double) $x.getFloat($i);
         |    double $yi = (double) $y.getFloat($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dot / java.lang.Math.sqrt($nx * $ny);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineF32 =
    copy(left = newLeft, right = newRight)
}
