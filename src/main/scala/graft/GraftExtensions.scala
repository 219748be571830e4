package graft

import graft.functions.{CharNgrams, CosineF32, CosineQ64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions installed via `SparkSessionExtensions` — the
  * documented injection point for native functions/rules (enable with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; GraftSession does this
  * by default). Currently: the codegen'd `cosine_f32` (float arrays),
  * `cosine_q64` (integer-quantized arrays) and `char_ngrams` (single-pass
  * string n-grams) expressions, usable from SQL text and via
  * `expr("cosine_f32(a, b)")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_f32"),
      new ExpressionInfo(classOf[CosineF32].getName, "cosine_f32"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_f32 takes exactly 2 arguments")
        CosineF32(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_q64"),
      new ExpressionInfo(classOf[CosineQ64].getName, "cosine_q64"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_q64 takes exactly 2 arguments")
        CosineQ64(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "char_ngrams takes exactly 2 arguments")
        // accept any foldable integral n (1+2, CAST(3 AS INT), 3L...):
        // the builder runs before constant folding, so a bare-Literal
        // match would reject constants that fold one rule later
        val nExpr = children(1)
        val n = if (nExpr.foldable) nExpr.eval() match {
          case i: Int => i
          case l: Long if l.isValidInt => l.toInt
          case s: Short => s.toInt
          case b: Byte => b.toInt
          case other => throw new IllegalArgumentException(
            s"char_ngrams(text, n): n must be an integer constant, got $other")
        } else throw new IllegalArgumentException(
          s"char_ngrams(text, n): n must be a constant, got $nExpr")
        CharNgrams(children.head, n)
      }))
  }
}
