package graft.tools

/** Minimal JSON emission shared by the Verify/Bench harness mains (no JSON
  * library on the classpath beyond Spark's internals). */
object Jsons {

  /** JSON string literal: escapes backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL, or a quote in a path,
    * would otherwise make the driver's json.load fail and silently zero
    * the round's gate. */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
