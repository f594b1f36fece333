package graft

/** The ONE JSON string-escaping spelling for every hand-built contract
  * line (Bench's errors map, Verify's oracle_sql.json): backslash,
  * quote, the common named escapes, and ALL remaining control chars
  * (<0x20) as \\u%04x — a tab in builder-authored SQL or a raw control
  * byte in a binary-tainted exception message would otherwise make the
  * driver's json.load fail and silently zero the round's artifact.
  * Bench and Verify previously each spelled this; a fix applied to one
  * copy left the other emitting invalid JSON. */
object Json {
  /** `s` escaped, WITHOUT surrounding quotes. */
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `s` as a quoted JSON string literal. */
  def str(s: String): String = "\"" + escape(s) + "\""
}
