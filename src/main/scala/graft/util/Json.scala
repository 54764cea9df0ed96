package graft.util

/** Minimal JSON string escaping shared by the Bench/Verify harness mains:
  * backslash, quote, and ALL control chars below 0x20 (a raw ANSI escape
  * or form-feed in an exception message must not invalidate the one JSON
  * line the driver parses). */
object Json {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
