package graft

import graft.operators.Aggregators
import org.apache.spark.sql.functions._

/** Typed-Aggregator behaviors the a09/l04 oracles can't see: NULL
  * operands against the udaf encoder (fixtures carry no NULLs). */
class AggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("weightedMean skips rows with a NULL operand instead of crashing") {
    val df = Seq(
      (Some(100L), Some(2L)), // counted
      (None, Some(5L)),       // skipped whole — must not inflate Σqty
      (Some(300L), None),     // skipped whole
      (Some(200L), Some(3L))  // counted
    ).toDF("cents", "qty")
    val wm = udaf(Aggregators.weightedMean)
    val r = df.agg(wm($"cents", $"qty").as("w")).as[Double].head()
    assert(r === (100.0 * 2 + 200.0 * 3) / 100.0 / 5.0)
  }

  test("weightedMean of an all-NULL group is 0.0, not a division blow-up") {
    val df = Seq((None: Option[Long], None: Option[Long])).toDF("cents", "qty")
    val wm = udaf(Aggregators.weightedMean)
    assert(df.agg(wm($"cents", $"qty").as("w")).as[Double].head() === 0.0)
  }
}
