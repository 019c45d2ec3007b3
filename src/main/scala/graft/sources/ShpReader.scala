package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import scala.collection.mutable.ArrayBuffer

/** Minimal ESRI `.shp` main-file reader: polygon records → WKT
  * (SURVEY.md §2.1 S3; the reference reads shapefile geometry with
  * `gpd.read_file` at `backend/app/utils.py:80,186-197` and falls back
  * to WKT round-tripping at `utils.py:189-197`).
  *
  * The main file is: a 100-byte header (file code 9994 big-endian at
  * offset 0, total length in 16-bit words big-endian at 24, shape type
  * little-endian at 32), then records of [record number, content
  * length] (both big-endian words) followed by little-endian content.
  * Polygon content (types 5/15/25): bbox (4 doubles), numParts,
  * numPoints, part start indices, then (x, y) double pairs; Z/M
  * arrays trail the XY block and are ignored. Ring orientation per the
  * spec: outer rings clockwise (negative shoelace area), holes
  * counter-clockwise; each hole is attached to the outer ring that
  * contains its first vertex.
  *
  * Like the sibling [[DbfReader]], this is driver-side ingest staging
  * for dimension-scale data (≤ thousands of polygons), not a fact-scan
  * path — the output feeds [[graft.spatial.CellDistrictMap]] once and
  * the big grid side only ever sees the resulting equi-join table.
  */
object ShpReader {

  final case class RawRing(xs: Array[Double], ys: Array[Double]) {
    /** Shoelace signed area ×2 — negative = clockwise = outer ring. */
    def signedArea2: Double = {
      var s = 0.0
      var i = 0
      val n = xs.length
      while (i < n) {
        val j = (i + 1) % n
        s += xs(i) * ys(j) - xs(j) * ys(i)
        i += 1
      }
      s
    }
    def containsPoint(x: Double, y: Double): Boolean = {
      var inside = false
      var i = 0
      var j = xs.length - 1
      while (i < xs.length) {
        if ((ys(i) > y) != (ys(j) > y) &&
          x < (xs(j) - xs(i)) * (y - ys(i)) / (ys(j) - ys(i)) + xs(i)) inside = !inside
        j = i; i += 1
      }
      inside
    }
  }

  /** Parse polygon records. Returns (0-based record index, rings) —
    * record order matches the sibling `.dbf`'s row order, which is how
    * shapefiles pair geometry with attributes. Null-shape records are
    * kept (empty ring list) so the pairing stays aligned. */
  def readRings(path: String): Seq[(Long, Seq[RawRing])] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(be.getInt(0) == 9994, s"not a shapefile (bad file code): $path")
    val fileLen = be.getInt(24) * 2 // 16-bit words → bytes

    val out = ArrayBuffer.empty[(Long, Seq[RawRing])]
    var off = 100
    var rec = 0L
    while (off + 8 <= fileLen && off + 8 <= bytes.length) {
      val contentLen = be.getInt(off + 4) * 2
      val c = off + 8 // content start
      val shapeType = le.getInt(c)
      val rings = shapeType match {
        case 0 => Seq.empty // null shape
        case 5 | 15 | 25 => // Polygon / PolygonZ / PolygonM — XY block is identical
          val numParts = le.getInt(c + 36)
          val numPoints = le.getInt(c + 40)
          val partsOff = c + 44
          val pointsOff = partsOff + 4 * numParts
          val starts = (0 until numParts).map(p => le.getInt(partsOff + 4 * p))
          val ends = starts.drop(1) :+ numPoints
          starts.zip(ends).map { case (s, e) =>
            val xs = new Array[Double](e - s)
            val ys = new Array[Double](e - s)
            var i = s
            while (i < e) {
              xs(i - s) = le.getDouble(pointsOff + 16 * i)
              ys(i - s) = le.getDouble(pointsOff + 16 * i + 8)
              i += 1
            }
            RawRing(xs, ys)
          }
        case t => throw new IllegalArgumentException(
          s"unsupported shape type $t in record $rec of $path (only polygons)")
      }
      out += ((rec, rings))
      rec += 1
      off += 8 + contentLen
    }
    out.toSeq
  }

  /** Group one record's rings into WKT: clockwise rings are outers,
    * counter-clockwise rings become holes of the outer containing
    * their first vertex (unmatched holes are promoted to outers —
    * lenient on digitization slop). */
  def ringsToWkt(rings: Seq[RawRing]): Option[String] = {
    if (rings.isEmpty) return None
    val (cw, ccw) = rings.partition(_.signedArea2 < 0)
    val outers = if (cw.nonEmpty) cw else ccw // degenerate file: all one way
    val holes = if (cw.nonEmpty) ccw else Seq.empty
    val grouped = outers.map(o => (o, ArrayBuffer.empty[RawRing]))
    val orphans = ArrayBuffer.empty[RawRing]
    holes.foreach { h =>
      grouped.find(_._1.containsPoint(h.xs(0), h.ys(0))) match {
        case Some((_, hs)) => hs += h
        case None => orphans += h
      }
    }
    def ringStr(r: RawRing): String =
      r.xs.indices.map(i => s"${r.xs(i)} ${r.ys(i)}").mkString("(", ", ", ")")
    val polys = grouped.map { case (o, hs) => (o +: hs.toSeq).map(ringStr).mkString("(", ", ", ")") } ++
      orphans.map(h => "(" + ringStr(h) + ")")
    Some("MULTIPOLYGON " + polys.mkString("(", ", ", ")"))
  }

  /** `.shp` → DataFrame of (_recno, wkt), aligned with
    * `DbfReader.read(..., withRecno = true)` for attribute pairing.
    * Records with no geometry (null shapes) are dropped. */
  def readWkt(spark: SparkSession, path: String): DataFrame = {
    val rows = readRings(path).flatMap { case (recno, rings) =>
      ringsToWkt(rings).map(w => Row(recno, w))
    }
    val schema = StructType(Seq(
      StructField("_recno", LongType, nullable = false),
      StructField("wkt", StringType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }
}
