package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Query-registry utilities enforcing the cross-engine determinism
  * conventions (SURVEY §5, FIXTURES.md):
  *
  *  - double aggregates go through DECIMAL(18,2): the cast of a
  *    2-decimal-generated double is unambiguous, decimal addition is
  *    exact and order-independent, and the final cast back to double is
  *    a single well-defined conversion — so Spark and DuckDB agree
  *    bit-for-bit regardless of partial-aggregation order.
  *  - timestamps leave result sets as epoch-microsecond BIGINTs
  *    (`unix_micros` / `epoch_us`) to dodge tz-encoding differences.
  *  - every oracle-compared query ends with a total ORDER BY.
  */
object QU {
  type Q = (SparkSession, String) => DataFrame

  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum rendered as double — matches
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic average — matches
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)`. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** Exact revenue term: price × (1 − discount) in decimal. */
  def revenue(price: Column, discount: Column): Column =
    sum(dec(price) * (lit(1) - dec(discount))).cast("double")

  /** Epoch micros; parquet NTZ timestamps cast through TIMESTAMP first
    * (identity wall-clock under the UTC session tz both engines use). */
  def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
}
