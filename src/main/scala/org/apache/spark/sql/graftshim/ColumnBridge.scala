package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters, so the
  * engine can plan its native Catalyst expressions (e.g.
  * `graft.functions.CosineF32`) without requiring a function-registry
  * round-trip on every session. Lives under `org.apache.spark.sql` for
  * access scope only — the standard pattern for Spark extension
  * libraries; keep this file free of any other logic. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
