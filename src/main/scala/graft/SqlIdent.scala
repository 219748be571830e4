package graft

/** The one backtick-quoting helper for Spark SQL column references —
  * shared by the SMT pack, the JSON schema serde and the stream-stream
  * join so the dotted-name hardening cannot silently diverge between
  * paths (a fix to the escaping lands everywhere at once). */
object SqlIdent {
  /** Backtick-quote a column name for use inside a SQL/expr string: a
    * dotted payload name (`a.b`) must not resolve as a nested path. */
  def bq(name: String): String = s"`${name.replace("`", "``")}`"
}
