package graft.domain

import graft.expr.NfcNormalize
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-normalization functions shared by dim seeding and every ingest
  * (SURVEY.md §2.9 F1–F3; reference `backend/app/utils.py:23-33,276-284,
  * 437-449`). All are pure `Column` expressions — no UDFs — except the
  * final NFC step which is the codegen'd [[graft.expr.NfcNormalize]].
  */
object TextNorm {

  /** F1 `clean_text`: null passthrough; CR/LF→space; strip Thai admin
    * prefixes (จังหวัด, กิ่งอำเภอ, อำเภอ — in that order, since
    * กิ่งอำเภอ contains อำเภอ) and "K. "; romanization fixes
    * Muang→Mueang / Wieng→Wiang; Unicode NFC. Replacements are
    * substring-wide (not anchored) and there is NO trim — both
    * faithfully preserved. */
  def cleanText(c: Column): Column = {
    var s = c.cast("string")
    s = regexp_replace(s, "\\r\\n|\\r|\\n", " ")
    s = regexp_replace(s, "จังหวัด", "")
    s = regexp_replace(s, "กิ่งอำเภอ", "")
    s = regexp_replace(s, "อำเภอ", "")
    s = regexp_replace(s, "K\\. ", "")
    s = regexp_replace(s, "Muang", "Mueang")
    s = regexp_replace(s, "Wieng", "Wiang")
    NfcNormalize.nfc(s)
  }

  /** F2 `normalize_th`: null→""; trim; collapse internal whitespace;
    * strip จ./อ. abbreviations (substring-wide). */
  def normalizeTh(c: Column): Column = {
    var s = regexp_replace(trim(c.cast("string")), "\\s+", " ")
    s = regexp_replace(s, "จ\\.", "")
    s = regexp_replace(s, "อ\\.", "")
    coalesce(s, lit(""))
  }

  /** F3 `normalize_sheets` (driver-side; sheet names are plain strings
    * before any DataFrame exists): lower; remove all whitespace; keep
    * only word chars + the Thai block; strip one trailing Gregorian or
    * Buddhist year. */
  def normalizeSheets(s: String): String = {
    var t = s.trim.toLowerCase
    t = t.replaceAll("\\s+", "")
    t = t.replaceAll("[^\\wก-๙]+", "")
    t = t.replaceAll("(19|20)\\d{2}$", "")
    t = t.replaceAll("(25)\\d{2}$", "")
    t
  }

  /** Accepted incident-log sheet names, in priority order
    * (reference utils.py:16-20). */
  val AcceptedSheets: Seq[String] = Seq(
    "ดินถล่ม67-รายการพื้นที่เกิด",
    "พื้นที่เกิด",
    "รายการพื้นที่เกิด รายหมู่บ้าน")

  /** S5 sheet chooser (utils.py:451-467): explicit request must match
    * after normalization (else error); otherwise first accepted sheet
    * present; otherwise the file's first sheet. */
  def chooseSheet(available: Seq[String], requested: Option[String]): String = {
    val normAvail = available.map(x => normalizeSheets(x) -> x).toMap
    requested match {
      case Some(req) =>
        normAvail.getOrElse(normalizeSheets(req),
          throw new IllegalArgumentException(
            s"sheet '$req' not found (have: ${available.mkString(", ")})"))
      case None =>
        AcceptedSheets.iterator
          .flatMap(n => normAvail.get(normalizeSheets(n)))
          .nextOption()
          .getOrElse(available.head)
    }
  }
}
