package graft

import graft.functions.{CharNgrams, CosineF32, CosineQ64, HilbertKey, PolyBucket, SortedRunStats, StripHtml, UnicodeNormalize}
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

  /** Evaluate a foldable integral argument (1+2, CAST(3 AS INT), 3L…)
    * — builders run before constant folding, so a bare-Literal match
    * would reject constants that fold one rule later. */
  private def foldableInt(fn: String, arg: String, e: Expression): Int =
    if (e.foldable) e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn(..., $arg): $arg must be an integer constant, got $other")
    } else throw new IllegalArgumentException(
      s"$fn(..., $arg): $arg must be a constant, got $e")

  private def inject(ext: SparkSessionExtensions, name: String,
      clazz: Class[_], arity: Int)(build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(children.size == arity, s"$name takes exactly $arity arguments")
        build(children)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    inject(ext, "cosine_f32", classOf[CosineF32], 2)(c => CosineF32(c.head, c(1)))
    inject(ext, "cosine_q64", classOf[CosineQ64], 2)(c => CosineQ64(c.head, c(1)))
    inject(ext, "char_ngrams", classOf[CharNgrams], 2) { c =>
      // accept any foldable integral n (1+2, CAST(3 AS INT), 3L...):
      // the builder runs before constant folding, so a bare-Literal
      // match would reject constants that fold one rule later
      val nExpr = c(1)
      val n = if (nExpr.foldable) nExpr.eval() match {
        case i: Int => i
        case l: Long if l.isValidInt => l.toInt
        case s: Short => s.toInt
        case b: Byte => b.toInt
        case other => throw new IllegalArgumentException(
          s"char_ngrams(text, n): n must be an integer constant, got $other")
      } else throw new IllegalArgumentException(
        s"char_ngrams(text, n): n must be a constant, got $nExpr")
      CharNgrams(c.head, n)
    }
    inject(ext, "poly_bucket", classOf[PolyBucket], 2) { c =>
      PolyBucket(c.head, foldableInt("poly_bucket", "dim", c(1)))
    }
    inject(ext, "sorted_run_stats", classOf[SortedRunStats], 2) { c =>
      SortedRunStats(c.head,
        foldableInt("sorted_run_stats", "extraChars", c(1)))
    }
    inject(ext, "strip_html", classOf[StripHtml], 1)(c => StripHtml(c.head))
    inject(ext, "unicode_normalize", classOf[UnicodeNormalize], 2) { c =>
      val formExpr = c(1)
      val form = if (formExpr.foldable) formExpr.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => throw new IllegalArgumentException(
          s"unicode_normalize(text, form): form must be a string constant, got $other")
      } else throw new IllegalArgumentException(
        s"unicode_normalize(text, form): form must be a constant, got $formExpr")
      UnicodeNormalize(c.head, form)
    }
    // variadic: hilbert_key(bits, rank0, rank1, ...) — bits constant first
    ext.injectFunction((
      FunctionIdentifier("hilbert_key"),
      new ExpressionInfo(classOf[HilbertKey].getName, "hilbert_key"),
      (children: Seq[Expression]) => {
        require(children.size >= 2,
          "hilbert_key(bits, rank0, ...) takes a constant plus >= 1 rank")
        val bitsExpr = children.head
        val bits = if (bitsExpr.foldable) bitsExpr.eval() match {
          case i: Int => i
          case l: Long if l.isValidInt => l.toInt
          case s: Short => s.toInt
          case b: Byte => b.toInt
          case other => throw new IllegalArgumentException(
            s"hilbert_key(bits, ...): bits must be an integer constant, got $other")
        } else throw new IllegalArgumentException(
          s"hilbert_key(bits, ...): bits must be a constant, got $bitsExpr")
        HilbertKey(children.tail, bits)
      }))
  }
}
