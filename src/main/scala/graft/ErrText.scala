package graft

/** Total first-line extraction for throwable messages. An exception
  * whose message is an EMPTY (non-null) string made the previous
  * `Option(e.getMessage).getOrElse(...).linesIterator.next()` pattern
  * itself throw `NoSuchElementException` from inside Verify's and
  * Bench's per-query catch handlers — aborting the loop whose whole
  * job is to survive broken queries and keep them visible. Pinned by
  * VerifyMarkerSpec. */
object ErrText {
  /** Full message, falling back to the class name when the message is
    * null or blank (what `_failed.json` records). */
  def message(e: Throwable): String =
    Option(e.getMessage).map(_.trim).filter(_.nonEmpty).getOrElse(e.getClass.getName)

  /** First line of [[message]] — safe for one-line logs. Never throws. */
  def firstLine(e: Throwable): String = {
    val m = message(e)
    m.linesIterator.nextOption().getOrElse(m)
  }
}
