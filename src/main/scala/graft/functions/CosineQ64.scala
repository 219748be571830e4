package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native cosine over two integer-quantized `array<long>` vectors
  * (SURVEY §2.9 L3/L4): one fused loop computing the exact Long dot
  * product and both squared norms, then the same two double casts, one
  * multiply, one sqrt and one divide as the higher-order-function form
  * (`VectorFunctions.cosineQ`) — bit-identical results (integer sums are
  * order-independent and exact; quantized components ≤1e6 keep every
  * product and 64-dim sum far inside Long), so the DuckDB oracles that
  * pinned the HOF form stay green while the brute-force scoring path
  * gets a codegen'd kernel instead of zip_with+aggregate lambdas.
  *
  * Semantics matched to the HOF form exactly:
  *  - length mismatch → NULL (zip_with pads with null → null sum)
  *  - any NULL element → NULL (null product poisons the fold)
  *  - zero vector → 0/0 = NaN
  */
case class CosineQ64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_q64 requires (array<long>, array<long>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_q64"
  override def nullable: Boolean = true

  // same containsNull elision as CosineF32: the per-element null branch
  // is only emitted/taken when the input type admits null elements
  @transient private lazy val elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val checkNulls = elementsNullable
    var dot = 0L; var nx = 0L; var ny = 0L
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = x.getLong(i)
      val yi = y.getLong(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot.toDouble / math.sqrt(nx.toDouble * ny.toDouble)
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
         |long $dot = 0L; long $nx = 0L; long $ny = 0L;
         |if (!${ev.isNull}) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    long $xi = $x.getLong($i);
         |    long $yi = $y.getLong($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = (double) $dot / java.lang.Math.sqrt((double) $nx * (double) $ny);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineQ64 =
    copy(left = newLeft, right = newRight)
}
