package graft.sources

import graft.SparkSpec
import graft.domain.{IncidentIngest, Schemas, TextNorm}
import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

class XlsxReaderSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-build a minimal xlsx: shared + inline strings, numbers,
    * ragged rows, two sheets. */
  private def buildXlsx(sheets: Seq[(String, Seq[Seq[String]])],
      sharedStrings: Seq[String] = Nil): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    val sheetXml = sheets.zipWithIndex.map { case ((_, rows), si) =>
      val rowsXml = rows.zipWithIndex.map { case (cells, ri) =>
        val cellXml = cells.zipWithIndex.map { case (v, ci) =>
          val ref = s"${('A' + ci).toChar}${ri + 1}"
          if (v.startsWith("s:")) // shared-string index marker
            s"""<c r="$ref" t="s"><v>${v.drop(2)}</v></c>"""
          else if (v.matches("-?[0-9.]+"))
            s"""<c r="$ref"><v>$v</v></c>"""
          else
            s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cellXml</row>"""
      }.mkString
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rowsXml</sheetData></worksheet>"""
    }
    val wbSheets = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="$name" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    put("xl/workbook.xml",
      s"""<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$wbSheets</sheets></workbook>""")
    val rels = sheets.zipWithIndex.map { case (_, i) =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>""")
    if (sharedStrings.nonEmpty)
      put("xl/sharedStrings.xml",
        s"""<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">${sharedStrings.map(s => s"<si><t>$s</t></si>").mkString}</sst>""")
    sheetXml.zipWithIndex.foreach { case (xml, i) => put(s"xl/worksheets/sheet${i + 1}.xml", xml) }
    z.close()
    out.toByteArray
  }

  test("legacy .xls (OLE2/BIFF) is detected and rejected with the conversion recipe") {
    // a minimal OLE2/CFB header: magic + zeroed sector fields — what a
    // real .xls starts with (the reference's pd.read_excel would accept
    // it; this engine rejects with the recipe, by recorded decision)
    val ole2 = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte) ++
      Array.fill[Byte](504)(0)
    val err = intercept[IllegalArgumentException](XlsxReader.parse(ole2))
    assert(err.getMessage.contains(".xls"))
    assert(err.getMessage.contains("convert"), "rejection must carry the conversion recipe")
    assert(XlsxReader.isOle2(ole2))
    assert(!XlsxReader.isOle2(buildXlsx(Seq(("s", Seq(Seq("a")))))))
  }

  test("non-zip garbage is rejected as not-an-xlsx, not an opaque zip error") {
    val err = intercept[IllegalArgumentException](
      XlsxReader.parse("this is not a spreadsheet".getBytes("UTF-8")))
    assert(err.getMessage.contains("xlsx"))
  }

  test("parses sheets, shared/inline strings, numbers, ragged rows") {
    val bytes = buildXlsx(
      sheets = Seq(
        "Summary" -> Seq(Seq("colA", "colB"), Seq("s:0", "42"), Seq("only-a")),
        "พื้นที่เกิด" -> Seq(Seq("Disaster Date", "Province", "District"),
          Seq("2024-05-03", "เชียงใหม่", "เมือง"))),
      sharedStrings = Seq("hello"))
    val wb = XlsxReader.parse(bytes)
    assert(wb.sheetNames == Seq("Summary", "พื้นที่เกิด"))
    val df = XlsxReader.readSheet(spark, wb, Some("Summary"))
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("colA", "colB"))
    assert(rows(0).getString(0) == "hello" && rows(0).getString(1) == "42")
    assert(rows(1).getString(0) == "only-a" && rows(1).isNullAt(1))
  }

  test("end-to-end: choose sheet, read, ingest incidents (incl. Excel date serial)") {
    // serial 45415 = 2024-05-03 (days since 1899-12-30)
    val bytes = buildXlsx(Seq(
      "Other" -> Seq(Seq("x"), Seq("1")),
      "ดินถล่ม67-รายการพื้นที่เกิด" -> Seq(
        Seq("Disaster Date", "Province", "District"),
        Seq("2024-05-03", "เชียงใหม่", "เมือง"),
        Seq("45415", "เชียงใหม่", "เมือง"),       // same day, as a serial
        Seq("2024-05-04 00:00:00", "เชียงใหม่", "เมือง"))))
    val wb = XlsxReader.parse(bytes)
    val sheet = TextNorm.chooseSheet(wb.sheetNames, None)
    assert(sheet == "ดินถล่ม67-รายการพื้นที่เกิด")
    val df = IncidentIngest.normalizeColumns(XlsxReader.readSheet(spark, wb, Some(sheet))).get

    val provinces = Seq((1, "เชียงใหม่", "Chiang Mai")).toDF("province_id", "province_name", "province_name_en")
    val districts = Seq((11, "เมือง", 1)).toDF("district_id", "district_name", "province_id")
    val existing = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Schemas.incidentStatisticsPoints)
    val out = IncidentIngest.ingest(spark, df, provinces, districts, existing)
      .orderBy("disaster_date").collect()
      .map(r => (r.getAs[java.sql.Date]("disaster_date").toString, r.getAs[Int]("count_of_disasters")))
    assert(out.toSeq == Seq(("2024-05-03", 2), ("2024-05-04", 1)))
  }

  test("Thai two-header format via skipRows + rename") {
    val bytes = buildXlsx(Seq(
      "พื้นที่เกิด" -> Seq(
        Seq("รายงาน"), Seq(""),
        Seq("วันที่เกิดภัย", "จังหวัด", "อำเภอ"),
        Seq("2024-05-05", "เชียงใหม่", "เมือง"))))
    val wb = XlsxReader.parse(bytes)
    val attempt1 = XlsxReader.readSheet(spark, wb, None)
    assert(IncidentIngest.normalizeColumns(attempt1).isEmpty) // format 2 detected
    val attempt2 = XlsxReader.readSheet(spark, wb, None, skipRows = 2)
    val renamed = IncidentIngest.normalizeColumns(attempt2)
    assert(renamed.isDefined)
    assert(renamed.get.columns.toSeq.take(3) == IncidentIngest.RequiredCols)
  }
}
