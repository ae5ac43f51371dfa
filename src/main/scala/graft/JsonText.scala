package graft

/** Minimal JSON string escaping shared by the driver-facing mains (Verify's
  * oracle_sql.json, Bench's summary line). Escapes backslash, quote, and
  * ALL control chars < 0x20 — a stray tab/CR/backspace in builder-authored
  * SQL or in an exception message must not make the driver's json.load
  * fail and silently zero a round's results.
  */
object JsonText {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `escape` wrapped in quotes. */
  def quote(s: String): String = "\"" + escape(s) + "\""
}
