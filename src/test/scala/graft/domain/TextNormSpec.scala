package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("x").select(TextNorm.cleanText(col("x"))).head().getString(0)
  private def normTh(s: String): String =
    Seq(s).toDF("x").select(TextNorm.normalizeTh(col("x"))).head().getString(0)

  test("cleanText strips Thai admin prefixes anywhere in the string") {
    assert(clean("จังหวัดเชียงใหม่") == "เชียงใหม่")
    assert(clean("อำเภอเมืองเชียงใหม่") == "เมืองเชียงใหม่")
    // กิ่งอำเภอ must be replaced before อำเภอ (it contains it)
    assert(clean("กิ่งอำเภอแม่ออน") == "แม่ออน")
    assert(clean("K. Chiang Mai") == "Chiang Mai")
  }

  test("cleanText romanization fixes and newline handling") {
    assert(clean("Muang Lampang") == "Mueang Lampang")
    assert(clean("Wieng Sa") == "Wiang Sa")
    assert(clean("a\r\nb\rc\nd") == "a b c d")
  }

  test("cleanText does NOT trim (reference has no strip)") {
    assert(clean("  Nan  ") == "  Nan  ")
  }

  test("cleanText applies Unicode NFC") {
    val decomposed = "é" // e + combining acute
    assert(clean(decomposed) == "é")
  }

  test("cleanText passes null through") {
    val out = Seq[(Integer, String)]((1, null)).toDF("i", "x")
      .select(TextNorm.cleanText(col("x"))).head()
    assert(out.isNullAt(0))
  }

  test("normalizeTh trims, collapses whitespace, strips จ./อ.") {
    assert(normTh("  เชียงใหม่   ใต้ ") == "เชียงใหม่ ใต้")
    assert(normTh("จ.น่าน") == "น่าน")
    assert(normTh("อ.เมือง") == "เมือง")
  }

  test("normalizeTh maps null to empty string") {
    val out = Seq[(Integer, String)]((1, null)).toDF("i", "x")
      .select(TextNorm.normalizeTh(col("x"))).head().getString(0)
    assert(out == "")
  }

  test("normalizeSheets lowers, strips whitespace/specials and trailing years") {
    assert(TextNorm.normalizeSheets("ดินถล่ม67-รายการพื้นที่เกิด") == "ดินถล่ม67รายการพื้นที่เกิด")
    assert(TextNorm.normalizeSheets("Sheet Name 2024") == "sheetname")
    assert(TextNorm.normalizeSheets("รายงาน 2567") == "รายงาน")
  }

  test("chooseSheet: requested match, accepted priority, first fallback") {
    val avail = Seq("Summary", "พื้นที่เกิด", "Other")
    assert(TextNorm.chooseSheet(avail, Some("พื้นที่ เกิด")) == "พื้นที่เกิด")
    assert(TextNorm.chooseSheet(avail, None) == "พื้นที่เกิด")
    assert(TextNorm.chooseSheet(Seq("A", "B"), None) == "A")
    intercept[IllegalArgumentException] {
      TextNorm.chooseSheet(avail, Some("missing"))
    }
  }
}
