package graft.testutil

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Byte-level builders for the reference's upload formats, so specs can
  * drive the engine end-to-end from real file bytes. */
object FileBuilders {

  /** dBASE III file with all-character fields. */
  def dbf(fields: Seq[(String, Int)], records: Seq[Seq[String]],
      charset: String = "TIS-620"): Array[Byte] = {
    val recordLen = 1 + fields.map(_._2).sum
    val headerLen = 32 + fields.size * 32 + 1
    val out = new ByteArrayOutputStream()
    val head = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
    head.put(0, 0x03.toByte)
    head.putInt(4, records.size)
    head.putShort(8, headerLen.toShort)
    head.putShort(10, recordLen.toShort)
    out.write(head.array())
    fields.foreach { case (name, len) =>
      val fd = ByteBuffer.allocate(32)
      fd.position(0); fd.put(name.getBytes("ASCII"))
      fd.put(11, 'C'.toByte)
      fd.put(16, len.toByte)
      out.write(fd.array())
    }
    out.write(0x0d)
    records.foreach { cells =>
      out.write(' ')
      cells.zip(fields).foreach { case (v, (_, len)) =>
        val b = v.getBytes(charset)
        require(b.length <= len, s"value '$v' exceeds field width $len")
        out.write(b)
        out.write(Array.fill(len - b.length)(' '.toByte))
      }
    }
    out.toByteArray
  }

  /** Classic NetCDF (CDF-1) file with a CHIRPS-shaped layout: record
    * dimension `time` (double, CF units), fixed `latitude`/`longitude`
    * (double coords), and `precip[time,latitude,longitude]` (float,
    * `_FillValue`). precip is indexed (t)(lat)(lon). */
  def nc(times: Seq[Double], timeUnits: String, lats: Seq[Double], lons: Seq[Double],
      precip: Seq[Seq[Seq[Float]]], fillValue: Float = -9999f): Array[Byte] = {
    def pad4(n: Int): Int = (n + 3) & ~3
    val precipSlab = pad4(4 * lats.size * lons.size)

    def header(beginLat: Int, beginLon: Int, beginTime: Int, beginPrecip: Int): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      def name(s: String): Unit = {
        o.writeInt(s.length); o.write(s.getBytes("UTF-8"))
        (s.length until pad4(s.length)).foreach(_ => o.write(0))
      }
      o.write('C'); o.write('D'); o.write('F'); o.write(1)
      o.writeInt(times.size) // numrecs
      o.writeInt(0x0A); o.writeInt(3) // dim_list
      name("time"); o.writeInt(0) // record dim
      name("latitude"); o.writeInt(lats.size)
      name("longitude"); o.writeInt(lons.size)
      o.writeInt(0); o.writeInt(0) // gatt_list absent
      o.writeInt(0x0B); o.writeInt(4) // var_list
      name("latitude"); o.writeInt(1); o.writeInt(1)
      o.writeInt(0); o.writeInt(0) // no atts
      o.writeInt(6); o.writeInt(pad4(8 * lats.size)); o.writeInt(beginLat)
      name("longitude"); o.writeInt(1); o.writeInt(2)
      o.writeInt(0); o.writeInt(0)
      o.writeInt(6); o.writeInt(pad4(8 * lons.size)); o.writeInt(beginLon)
      name("time"); o.writeInt(1); o.writeInt(0)
      o.writeInt(0x0C); o.writeInt(1) // atts: units
      name("units"); o.writeInt(2); o.writeInt(timeUnits.length)
      o.write(timeUnits.getBytes("UTF-8"))
      (timeUnits.length until pad4(timeUnits.length)).foreach(_ => o.write(0))
      o.writeInt(6); o.writeInt(8); o.writeInt(beginTime)
      name("precip"); o.writeInt(3); o.writeInt(0); o.writeInt(1); o.writeInt(2)
      o.writeInt(0x0C); o.writeInt(1) // atts: _FillValue
      name("_FillValue"); o.writeInt(5); o.writeInt(1); o.writeFloat(fillValue)
      o.writeInt(5); o.writeInt(precipSlab); o.writeInt(beginPrecip)
      o.flush(); bos.toByteArray
    }

    val headerLen = header(0, 0, 0, 0).length
    val beginLat = headerLen
    val beginLon = beginLat + pad4(8 * lats.size)
    val beginTime = beginLon + pad4(8 * lons.size)
    val beginPrecip = beginTime + 8 // first record: time then precip slab

    val bos = new ByteArrayOutputStream()
    bos.write(header(beginLat, beginLon, beginTime, beginPrecip))
    val o = new java.io.DataOutputStream(bos)
    lats.foreach(o.writeDouble)
    lons.foreach(o.writeDouble)
    times.zipWithIndex.foreach { case (t, r) =>
      o.writeDouble(t)
      val flat = precip(r).flatten
      flat.foreach(o.writeFloat)
      (4 * flat.size until precipSlab).foreach(_ => o.write(0))
    }
    o.flush(); bos.toByteArray
  }

  /** ESRI `.shp` main file of polygon records. Each record is a list of
    * rings, each ring a closed list of (x, y) — callers supply outer
    * rings clockwise and holes counter-clockwise per the spec. */
  def shp(records: Seq[Seq[Seq[(Double, Double)]]]): Array[Byte] = {
    val contents = records.map { rings =>
      val numPoints = rings.map(_.size).sum
      val len = 44 + 4 * rings.size + 16 * numPoints
      val b = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(0, 5) // polygon
      val allX = rings.flatten.map(_._1); val allY = rings.flatten.map(_._2)
      b.putDouble(4, allX.min); b.putDouble(12, allY.min)
      b.putDouble(20, allX.max); b.putDouble(28, allY.max)
      b.putInt(36, rings.size)
      b.putInt(40, numPoints)
      var start = 0
      rings.zipWithIndex.foreach { case (r, i) =>
        b.putInt(44 + 4 * i, start); start += r.size
      }
      var off = 44 + 4 * rings.size
      rings.flatten.foreach { case (x, y) =>
        b.putDouble(off, x); b.putDouble(off + 8, y); off += 16
      }
      b.array()
    }
    val fileLen = 100 + contents.map(8 + _.length).sum
    val out = ByteBuffer.allocate(fileLen)
    out.order(ByteOrder.BIG_ENDIAN)
    out.putInt(0, 9994)
    out.putInt(24, fileLen / 2) // length in 16-bit words
    out.order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(28, 1000) // version
    out.putInt(32, 5) // shape type: polygon
    val xs = records.flatten.flatten.map(_._1); val ys = records.flatten.flatten.map(_._2)
    out.putDouble(36, xs.min); out.putDouble(44, ys.min)
    out.putDouble(52, xs.max); out.putDouble(60, ys.max)
    var off = 100
    out.order(ByteOrder.BIG_ENDIAN)
    contents.zipWithIndex.foreach { case (c, i) =>
      out.putInt(off, i + 1) // record numbers are 1-based in the file
      out.putInt(off + 4, c.length / 2)
      off += 8
      c.foreach { byte => out.put(off, byte); off += 1 }
    }
    out.array()
  }

  /** Minimal xlsx: inline strings for text, raw <v> for numeric-looking
    * cells; one or more sheets. */
  def xlsx(sheets: Seq[(String, Seq[Seq[String]])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    val wbSheets = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="$name" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    put("xl/workbook.xml",
      s"""<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$wbSheets</sheets></workbook>""")
    val rels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>""")
    sheets.zipWithIndex.foreach { case ((_, rows), si) =>
      val rowsXml = rows.zipWithIndex.map { case (cells, ri) =>
        val cellXml = cells.zipWithIndex.map { case (v, ci) =>
          val ref = s"${('A' + ci).toChar}${ri + 1}"
          if (v.matches("-?[0-9.]+")) s"""<c r="$ref"><v>$v</v></c>"""
          else s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cellXml</row>"""
      }.mkString
      put(s"xl/worksheets/sheet${si + 1}.xml",
        s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rowsXml</sheetData></worksheet>""")
    }
    z.close()
    out.toByteArray
  }
}
