package graft.sources

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths}
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.collection.mutable
import scala.jdk.CollectionConverters._
import scala.xml.XML

/** Minimal XLSX (OOXML spreadsheet) reader → DataFrame
  * (SURVEY.md §2.1 S5; the reference uses pandas+openpyxl at
  * `backend/app/utils.py:477-501`).
  *
  * An .xlsx is a zip: `xl/workbook.xml` lists sheets, each
  * `xl/worksheets/sheetN.xml` holds rows of cells (`t="s"` = index
  * into `xl/sharedStrings.xml`, `t="inlineStr"` = inline, otherwise a
  * raw value — numbers and date serials come through as their literal
  * text, which [[graft.domain.IncidentIngest]] parses leniently).
  * All cells surface as strings; the first row is the header (the
  * caller re-reads with `skipRows` for the Thai two-header format).
  *
  * Incident logs are small request-scoped uploads, so parsing happens
  * on the driver and the rows parallelize — staging I/O, not a scan
  * path (same stance as [[DbfReader]]).
  */
object XlsxReader {

  final case class Workbook(sheetNames: Seq[String], sheets: Map[String, Seq[Seq[String]]])

  /** OLE2/CFB magic (D0 CF 11 E0 A1 B1 1A E1) — the container of legacy
    * binary `.xls` (BIFF8). Detected specifically so the rejection can
    * say what the file IS and how to convert it, mirroring the
    * NetCDF-4/HDF5 decision (README): no in-repo BIFF parser ships
    * because this environment has no independent writer/decoder to
    * validate one against — a self-validated parser proves nothing. */
  private val Ole2Magic =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  private[sources] def isOle2(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes.take(8).sameElements(Ole2Magic)

  /** Parse the full workbook: sheet names in workbook order + cell
    * grids (rows of string cells, ragged rows padded to row width). */
  def parse(bytes: Array[Byte]): Workbook = {
    require(!isOle2(bytes),
      "legacy binary .xls (OLE2/BIFF) workbook not supported: convert once with " +
        "LibreOffice (`soffice --headless --convert-to xlsx <file>`) or Excel " +
        "(Save As → .xlsx) and re-upload; only OOXML .xlsx is parsed here")
    require(bytes.length >= 2 && bytes(0) == 'P'.toByte && bytes(1) == 'K'.toByte,
      "not an .xlsx workbook (missing zip magic): expected an OOXML spreadsheet")
    val entries = mutable.Map.empty[String, Array[Byte]]
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (!e.isDirectory) entries(e.getName) = zis.readAllBytes()
        e = zis.getNextEntry
      }
    } finally zis.close()

    val shared: IndexedSeq[String] = entries.get("xl/sharedStrings.xml") match {
      case Some(b) =>
        val x = XML.load(new ByteArrayInputStream(b))
        (x \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
      case None => IndexedSeq.empty
    }

    val wb = XML.load(new ByteArrayInputStream(entries("xl/workbook.xml")))
    val sheetNodes = (wb \ "sheets" \ "sheet")
    val names = sheetNodes.map(n => (n \@ "name")).toSeq

    // map workbook order → worksheet files; rels give the robust
    // mapping, but sheetN.xml in declared order covers real exports
    val rels = entries.get("xl/_rels/workbook.xml.rels").map { b =>
      val x = XML.load(new ByteArrayInputStream(b))
      (x \ "Relationship").map(r => (r \@ "Id") -> (r \@ "Target")).toMap
    }.getOrElse(Map.empty)

    val sheets = sheetNodes.zipWithIndex.map { case (n, i) =>
      val rid = n.attributes.asAttrMap.collectFirst { case (k, v) if k.endsWith(":id") || k == "id" => v }
      val target = rid.flatMap(rels.get)
        .map(t => if (t.startsWith("/")) t.drop(1) else s"xl/$t")
        .getOrElse(s"xl/worksheets/sheet${i + 1}.xml")
      val grid = entries.get(target).map(parseSheet(_, shared)).getOrElse(Seq.empty)
      (n \@ "name") -> grid
    }.toMap

    Workbook(names, sheets)
  }

  /** Column letter(s) of an A1-style cell ref → 0-based index. */
  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
  }

  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val x = XML.load(new ByteArrayInputStream(bytes))
    (x \ "sheetData" \ "row").map { row =>
      val cells = (row \ "c").map { c =>
        val idx = Option(c \@ "r").filter(_.nonEmpty).map(colIndex)
        val t = c \@ "t"
        val v = t match {
          case "s" => (c \ "v").headOption.map(_.text.trim.toInt).map(shared.apply).getOrElse("")
          case "inlineStr" => (c \ "is" \\ "t").map(_.text).mkString
          case _ => (c \ "v").headOption.map(_.text).getOrElse("")
        }
        (idx, v)
      }
      // place cells by their declared column; pad gaps with ""
      val width = cells.flatMap(_._1).maxOption.map(_ + 1).getOrElse(cells.length)
      val arr = Array.fill(width)("")
      cells.zipWithIndex.foreach { case ((idx, v), pos) => arr(idx.getOrElse(pos)) = v }
      arr.toSeq
    }
  }

  /** Read one sheet as a DataFrame: header row (after `skipRows`) →
    * column names (trimmed, deduplicated); remaining rows → strings. */
  def read(spark: SparkSession, path: String, sheet: Option[String] = None,
      skipRows: Int = 0): DataFrame = {
    val wb = parse(Files.readAllBytes(Paths.get(path)))
    readSheet(spark, wb, sheet, skipRows)
  }

  def readSheet(spark: SparkSession, wb: Workbook, sheet: Option[String],
      skipRows: Int = 0): DataFrame = {
    val name = sheet.getOrElse(wb.sheetNames.head)
    val grid = wb.sheets(name).drop(skipRows)
    require(grid.nonEmpty, s"sheet '$name' has no rows after skipping $skipRows")
    val width = grid.map(_.length).max
    val header = grid.head.padTo(width, "").map(_.trim)
    val named = header.zipWithIndex.map { case (h, i) => if (h.isEmpty) s"_c$i" else h }
    // dedup header collisions the pandas way: second occurrence -> name.1
    val seen = mutable.Map.empty[String, Int]
    val cols = named.map { h =>
      val k = seen.getOrElse(h, 0); seen(h) = k + 1
      if (k == 0) h else s"$h.$k"
    }
    val rows = grid.tail.map(r => Row.fromSeq(r.padTo(width, "").map(v => if (v.isEmpty) null else v)))
    val schema = StructType(cols.map(StructField(_, StringType)))
    spark.createDataFrame(rows.asJava, schema)
  }
}
