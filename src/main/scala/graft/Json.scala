package graft

/** The one JSON string escaper (backslash, quote, ALL control chars) —
  * Verify's oracle dump, Bench's metric line and the job status store
  * all hand-roll tiny JSON documents; a single escaper keeps a stray
  * quote/backslash/tab in any interpolated string (query name, SQL,
  * path, metric key) from producing unparseable output. */
private[graft] object Json {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def str(s: String): String = "\"" + escape(s) + "\""
}
