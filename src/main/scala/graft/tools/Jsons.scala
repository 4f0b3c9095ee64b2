package graft.tools

/** Minimal JSON string quoting for the bench tools' hand-built one-line
  * artifacts. The tools interpolate file-system paths and query names into
  * JSON; a quote or backslash in an sfDir would otherwise corrupt the
  * committed artifact so the guard/jq can no longer parse it.
  */
object Jsons {
  /** `s` as a quoted JSON string literal (escapes ", \, and control chars). */
  def str(s: String): String = {
    val b = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }
}
