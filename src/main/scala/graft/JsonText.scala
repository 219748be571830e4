package graft

/** The one JSON string escaper for the driver-facing mains: Verify's
  * oracle_sql.json and Bench's metric line are both parsed with a strict
  * json.load on the driver side, so one unescaped quote/control char in
  * a SQL string, query name or path silently zeroes a whole round.
  * Centralized so the two outputs can never drift (they already had:
  * one handled \r/\t, the other didn't). */
object JsonText {
  /** `s` as a quoted JSON string literal. */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
