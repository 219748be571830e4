package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate flowing through [[Aggregators.topK]]. */
final case class Scored(sim: Double, id: Long)

/** Nullable input shell for [[Aggregators.topK]]: scores/ids arrive
  * straight off a scored projection, where NULL (null embedding, null
  * array element, null id) and NaN (zero-norm vector) are data, not
  * bugs. Option fields let the encoder accept them so `reduce` can skip
  * the row — a primitive input tuple would throw at encode time, and a
  * pre-aggregation `where` on the scored alias gets SUBSTITUTED into
  * the join condition by filter pushdown, re-evaluating the cosine
  * kernel 2-3× per candidate pair (plan-verified). */
final case class ScoredIn(sim: Option[Double], id: Option[Long])

/** Custom typed aggregation surface (SURVEY §2.4 A9): an
  * `Aggregator[IN,BUF,OUT]` registered via `functions.udaf`, the idiomatic
  * Spark form for user aggregates (map-side partial `reduce` + `merge`
  * make it a proper distributed combiner — no shuffle of raw rows).
  *
  * The arithmetic is integer-exact (cents × quantity) so results are
  * order-independent and reproducible against the DuckDB oracle.
  */
object Aggregators {

  /** Weighted mean of a price (given in exact cents) weighted by an
    * integer quantity: finish = (Σ cents·qty / 100) / Σ qty.
    *
    * Inputs are Options, not primitives: a primitive tuple encoder
    * throws "Null value appeared in non-nullable field" the moment a
    * nullable column reaches the udaf (the fixture tables have no NULLs,
    * so the oracle gate can't see that crash). A row missing EITHER
    * operand is skipped whole — it contributes to neither the numerator
    * nor the denominator (stricter than a naive SUM(p*q)/SUM(q), where a
    * (NULL, q) row would still inflate the denominator). */
  val weightedMean: Aggregator[(Option[Long], Option[Long]), (Long, Long), Double] =
    new Aggregator[(Option[Long], Option[Long]), (Long, Long), Double] {
      override def zero: (Long, Long) = (0L, 0L)
      override def reduce(b: (Long, Long), a: (Option[Long], Option[Long])): (Long, Long) =
        (a._1, a._2) match {
          case (Some(cents), Some(qty)) => (b._1 + cents * qty, b._2 + qty)
          case _ => b
        }
      override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
        (x._1 + y._1, x._2 + y._2)
      override def finish(b: (Long, Long)): Double =
        if (b._2 == 0L) 0.0 else b._1.toDouble / 100.0 / b._2.toDouble
      override def bufferEncoder: Encoder[(Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Bounded top-k combiner (SURVEY §2.9 L4): keeps the k best
    * (sim desc, id asc) candidates, never more than 2k in the buffer.
    * Used via `udaf` + `groupBy(qId)`, Spark's partial aggregation turns
    * it into a distributed two-stage top-k: each input partition reduces
    * to a ≤k-element buffer map-side, and only those buffers cross the
    * exchange — no task ever holds a whole corpus's scores, which is what
    * makes brute-force search survive a 100× corpus. `finish` returns the
    * candidates best-first, so `posexplode` position = rank-1.
    *
    * NULL and NaN candidates are skipped INSIDE `reduce` (see
    * [[ScoredIn]] — doing it here instead of a caller `where` keeps the
    * scoring expression single-copy in the plan); ties break on the
    * smaller id, so results are deterministic regardless of
    * partitioning. */
  def topK(k: Int): Aggregator[ScoredIn, Seq[Scored], Seq[Scored]] = {
    require(k >= 1, "topK needs k >= 1")
    new Aggregator[ScoredIn, Seq[Scored], Seq[Scored]] {
      private def better(a: Scored, b: Scored): Boolean =
        a.sim > b.sim || (a.sim == b.sim && a.id < b.id)
      private def trim(s: Seq[Scored]): Seq[Scored] = s.sortWith(better).take(k)
      override def zero: Seq[Scored] = Vector.empty
      override def reduce(b: Seq[Scored], a: ScoredIn): Seq[Scored] = (a.sim, a.id) match {
        case (Some(s), Some(i)) if !s.isNaN =>
          val nb = b :+ Scored(s, i)
          // compact every k appends → O(log k) amortized per row
          if (nb.length >= 2 * k) trim(nb) else nb
        case _ => b // NULL score/id or NaN: not a candidate
      }
      override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)
      override def finish(b: Seq[Scored]): Seq[Scored] = trim(b)
      override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    }
  }
}
