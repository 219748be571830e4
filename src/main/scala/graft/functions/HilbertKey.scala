package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

object HilbertKey {
  /** Hilbert index of a grid cell: Skilling's AxesToTranspose
    * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 —
    * public-domain algorithm) applied in place to the rank array,
    * followed by the Morton bit-interleave of the transposed coordinates
    * in REVERSED dimension order (x(0) carries the most significant bit
    * of each n-bit group). Bit-for-bit the same mapping as the
    * column-ladder form ([[graft.operators.Layout.hilbertTranspose]] +
    * `zKey(ranks.reverse)`), which the parity test in LayoutSpec pins.
    * MUTATES `x`; callers own the scratch array. */
  def index(x: Array[Long], bits: Int): Long = {
    val n = x.length
    if (n > 1) {
      // inverse-undo walk, Q = 2^(bits-1) down to 2
      var q = 1L << (bits - 1)
      while (q > 1L) {
        val p = q - 1L
        var i = 0
        while (i < n) {
          if ((x(i) & q) != 0L) x(0) ^= p
          else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
          i += 1
        }
        q >>= 1
      }
      // Gray encode, sequential: each step reads the updated predecessor
      var i = 1
      while (i < n) { x(i) ^= x(i - 1); i += 1 }
      // trailing correction: t = XOR of (2^b - 1) over set bits of x(n-1)
      var t = 0L
      var b = 1
      while (b < bits) {
        if ((x(n - 1) & (1L << b)) != 0L) t ^= (1L << b) - 1L
        b += 1
      }
      i = 0
      while (i < n) { x(i) ^= t; i += 1 }
    }
    // interleave reversed dims: key bit (i*n + j) = bit i of x(n-1-j)
    var key = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < n) {
        key |= ((x(n - 1 - j) >> i) & 1L) << (i * n + j)
        j += 1
      }
      i += 1
    }
    key
  }
}

/** Native Hilbert-curve key over per-column grid ranks (each a BIGINT in
  * `[0, 2^bits)`): one imperative pass per row instead of the
  * `(bits-1) x n` chained when/XOR self-projections of the column-ladder
  * form — the ladder is correct but rewrites every row ~30 times at the
  * default layout width, a measured ~5x write premium over Morton on
  * identical data. Same custom-Expression tier as [[CosineF32]].
  *
  * NULL semantics match the ladder exactly: any NULL rank nulls the key
  * (those rows sort first in the z-write). Evaluation order of the rank
  * children is preserved left-to-right. */
case class HilbertKey(ranks: Seq[Expression], bits: Int) extends Expression {

  override def children: Seq[Expression] = ranks
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hilbert_key"

  override def checkInputDataTypes(): TypeCheckResult =
    if (ranks.isEmpty)
      TypeCheckResult.TypeCheckFailure("hilbert_key needs at least one rank")
    else if (bits <= 0 || ranks.size * bits > 62)
      TypeCheckResult.TypeCheckFailure(
        s"need bits > 0 and |ranks| * bits <= 62, got ${ranks.size} x $bits")
    else ranks.find(_.dataType != LongType) match {
      case Some(e) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_key requires bigint ranks, got ${e.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](ranks.size)
    var i = 0
    while (i < ranks.size) {
      val v = ranks(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertKey.index(xs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // scratch array allocated once per operator instance, not per row;
    // index() consumes it synchronously so reuse across rows is safe
    val arr = ctx.addMutableState("long[]", "hilbertRanks",
      v => s"$v = new long[${ranks.size}];")
    val fills = ranks.map(_.genCode(ctx)).zipWithIndex.map { case (e, i) =>
      s"""
         |${e.code}
         |if (!${ev.isNull}) {
         |  if (${e.isNull}) { ${ev.isNull} = true; } else { $arr[$i] = ${e.value}; }
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long ${ev.value} = 0L;
        |$fills
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.functions.HilbertKey.index($arr, $bits);
        |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertKey =
    copy(ranks = newChildren)
}
