package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.Charset
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Minimal dBASE III/IV `.dbf` attribute-table reader → DataFrame
  * (SURVEY.md §2.1 S3/S4; the reference reads these with the Python
  * `dbfread` package at `backend/app/utils.py:293-294`).
  *
  * DBF is a fixed-width binary format: a 32-byte header (record count
  * at offset 4, header length at 8, record length at 10), then 32-byte
  * field descriptors until 0x0D, then records each prefixed by a
  * 1-byte deletion flag. Field types mapped: C→string, N/F→double (or
  * long when no decimals), D→date string, L→boolean.
  *
  * DBF files in this domain are small dimension/attribute tables
  * (≤ thousands of rows), so parsing happens on the driver and the
  * rows parallelize into a DataFrame; this is ingest staging I/O, not
  * a scan path that needs a DataSource V2 (SURVEY §7.3).
  */
object DbfReader {

  final case class DbfField(name: String, ftype: Char, length: Int, decimals: Int)

  private def charsetFor(name: String): Charset = {
    val candidates = Seq(name, "TIS-620", "x-TIS-620", "ISO-8859-11", "windows-874", "UTF-8")
    candidates.iterator.flatMap { c =>
      try Some(Charset.forName(c)) catch { case _: Exception => None }
    }.next()
  }

  /** @param encoding  used unless a `.cpg` sidecar declares the charset
    *                   (shapefile convention — the admin ADM2 table
    *                   ships UTF-8 with a cpg, the risk tables TIS-620)
    * @param withRecno  prepend a `_recno` long column (0-based file
    *                   order) — dim seeding assigns ids in file order. */
  def read(spark: SparkSession, path: String, encoding: String = "TIS-620",
      withRecno: Boolean = false): DataFrame = {
    val (schema, rows) = parseWithSchema(path, encoding, withRecno)
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Executor-safe row parse (used by [[DbfDataSource]] partitions). */
  def parseRows(path: String, encoding: String): Seq[Row] =
    parseWithSchema(path, encoding, withRecno = false)._2

  def parseWithSchema(path: String, encoding: String,
      withRecno: Boolean): (StructType, Seq[Row]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val cpg = Paths.get(path.replaceAll("\\.dbf$", ".cpg"))
    val declared =
      if (Files.exists(cpg)) new String(Files.readAllBytes(cpg), "ASCII").trim
      else encoding
    val cs = charsetFor(declared)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

    val numRecords = bb.getInt(4)
    val headerLen = bb.getShort(8) & 0xffff
    val recordLen = bb.getShort(10) & 0xffff

    // field descriptors: 32 bytes each, from offset 32 until 0x0D
    val fields = ArrayBuffer.empty[DbfField]
    var off = 32
    while (off < headerLen - 1 && bytes(off) != 0x0d) {
      val nameBytes = bytes.slice(off, off + 11).takeWhile(_ != 0)
      val name = new String(nameBytes, cs).trim
      val ftype = bytes(off + 11).toChar
      val length = bytes(off + 16) & 0xff
      val decimals = bytes(off + 17) & 0xff
      fields += DbfField(name, ftype, length, decimals)
      off += 32
    }

    val sparkFields = fields.map { f =>
      val dt = f.ftype match {
        case 'N' | 'F' => if (f.decimals == 0 && f.length < 10) LongType else DoubleType
        case 'L' => BooleanType
        case _ => StringType // C, D (date as yyyymmdd string), M, …
      }
      StructField(f.name, dt)
    }
    val schema = StructType(
      (if (withRecno) Seq(StructField("_recno", LongType, nullable = false)) else Nil) ++
        sparkFields.toSeq)

    val rows = ArrayBuffer.empty[Row]
    var rec = headerLen
    var i = 0
    while (i < numRecords && rec + recordLen <= bytes.length) {
      val deleted = bytes(rec) == '*'
      if (!deleted) {
        var fo = rec + 1
        val vals = fields.map { f =>
          val raw = new String(bytes.slice(fo, fo + f.length), cs)
          fo += f.length
          val s = raw.trim
          f.ftype match {
            case 'N' | 'F' =>
              if (s.isEmpty) null
              else if (f.decimals == 0 && f.length < 10)
                try s.toLong.asInstanceOf[AnyRef] catch { case _: Exception => null }
              else
                try s.toDouble.asInstanceOf[AnyRef] catch { case _: Exception => null }
            case 'L' =>
              if ("YyTt".contains(s.headOption.getOrElse('?'))) java.lang.Boolean.TRUE
              else if ("NnFf".contains(s.headOption.getOrElse('?'))) java.lang.Boolean.FALSE
              else null
            case _ => if (s.isEmpty) null else s
          }
        }
        rows += Row.fromSeq(
          (if (withRecno) Seq(rows.length.toLong) else Nil) ++ vals.toSeq)
      }
      rec += recordLen
      i += 1
    }

    (schema, rows.toSeq)
  }
}
