package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

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
    * integer quantity: finish = (Σ cents·qty / 100) / Σ qty. */
  val weightedMean: Aggregator[(Long, Long), (Long, Long), Double] =
    new Aggregator[(Long, Long), (Long, Long), Double] {
      override def zero: (Long, Long) = (0L, 0L)
      override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
        (b._1 + a._1 * a._2, b._2 + a._2)
      override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
        (x._1 + y._1, x._2 + y._2)
      override def finish(b: (Long, Long)): Double =
        if (b._2 == 0L) 0.0 else b._1.toDouble / 100.0 / b._2.toDouble
      override def bufferEncoder: Encoder[(Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
