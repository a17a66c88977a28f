package graft.lake

import scala.collection.mutable.ArrayBuffer

/** Splitter for Firehose-style concatenated JSON: one object = many
  * back-to-back JSON records with no separator
  * (`{"a":1}{"a":2}` — see FIXTURES.md §B.1).
  *
  * The reference splices `}{` → `},{` with a string replace
  * (`/root/reference/src/event_recorder/lambda_function.py:42`), which
  * corrupts any payload containing the literal substring `"}{"` inside
  * a string value (SURVEY.md §2.3 item 5). This implementation instead
  * tracks string/escape state and brace depth, so it is correct for
  * arbitrary JSON values — the documented *fix*, not a copy of the bug.
  *
  * Scale: pure per-record function used via flatMap over file lines /
  * whole objects; no state across records, so it parallelizes freely.
  */
object ConcatJson {

  /** Split a buffer of concatenated top-level JSON values into the
    * individual value strings. Whitespace (incl. newlines) between
    * values is tolerated, so JSON-Lines input splits identically. */
  def split(content: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var depth = 0
    var inString = false
    var escaped = false
    var start = -1
    var i = 0
    while (i < content.length) {
      val c = content.charAt(i)
      if (inString) {
        if (escaped) escaped = false
        else if (c == '\\') escaped = true
        else if (c == '"') inString = false
      } else c match {
        case '"' => inString = true
        case '{' | '[' =>
          if (depth == 0) start = i
          depth += 1
        case '}' | ']' =>
          depth -= 1
          if (depth == 0 && start >= 0) {
            out += content.substring(start, i + 1)
            start = -1
          }
        case _ => // whitespace / scalars between records: ignore
      }
      i += 1
    }
    out.toSeq
  }
}
