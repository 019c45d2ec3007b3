package graft.sources

import graft.SparkSpec
import graft.spatial.CellDistrictMap
import graft.testutil.FileBuilders
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Binary `.shp` polygon parsing, ring orientation/hole handling, and
  * the end-to-end shapefile → cell-district-map path the reference
  * drives with gpd.read_file (utils.py:80). */
class ShpReaderSpec extends SparkSpec {
  import spark.implicits._

  // Two unit-ish squares; the second carries a hole in its middle.
  // Outer rings clockwise (negative shoelace), hole counter-clockwise.
  private val squareA = Seq( // x ∈ [98, 99], y ∈ [18, 19]
    (98.0, 18.0), (98.0, 19.0), (99.0, 19.0), (99.0, 18.0), (98.0, 18.0))
  private val squareB = Seq( // x ∈ [100, 101], y ∈ [18, 19]
    (100.0, 18.0), (100.0, 19.0), (101.0, 19.0), (101.0, 18.0), (100.0, 18.0))
  private val holeB = Seq( // CCW: x ∈ [100.4, 100.6], y ∈ [18.4, 18.6]
    (100.4, 18.4), (100.6, 18.4), (100.6, 18.6), (100.4, 18.6), (100.4, 18.4))

  private def writeShp(): String = {
    val path = Files.createTempFile("adm2", ".shp")
    Files.write(path, FileBuilders.shp(Seq(Seq(squareA), Seq(squareB, holeB))))
    path.toString
  }

  test("parses records, ring orientation, and grouped WKT") {
    val path = writeShp()
    val recs = ShpReader.readRings(path)
    assert(recs.map(_._1) == Seq(0L, 1L))
    assert(recs(0)._2.size == 1 && recs(1)._2.size == 2)
    assert(recs(0)._2.head.signedArea2 < 0) // outer = clockwise
    assert(recs(1)._2(1).signedArea2 > 0) // hole = counter-clockwise

    val wkts = ShpReader.readWkt(spark, path).orderBy("_recno").collect()
    assert(wkts.length == 2)
    assert(wkts(0).getString(1).startsWith("MULTIPOLYGON"))
    // hole must parse back into the same containment semantics
    val polysB = CellDistrictMap.parseWkt(wkts(1).getString(1))
    assert(polysB.exists(_.contains(100.2, 18.2))) // in outer, not hole
    assert(!polysB.exists(_.contains(100.5, 18.5))) // inside the hole
    assert(!polysB.exists(_.contains(99.5, 18.5))) // outside entirely
  }

  test("fromShapefile: .shp + .dbf pair → cell map (p-i-p equi-join table)") {
    val shpPath = writeShp()
    val dbfBytes = FileBuilders.dbf(
      fields = Seq(("ADM1_EN", 20), ("ADM2_EN", 30)),
      records = Seq(
        Seq("Chiang Mai", "Mueang Chiang Mai"),
        Seq("Lampang", "Mueang Lampang")),
      charset = "UTF-8")
    Files.write(java.nio.file.Paths.get(shpPath.replaceAll("\\.shp$", ".dbf")), dbfBytes)

    val cells = Seq(
      (18.5, 98.5),   // in square A
      (18.5, 100.2),  // in square B (outside the hole)
      (18.5, 100.5),  // inside B's hole → unassigned
      (18.5, 99.5),   // between the squares → unassigned
    ).toDF("latitude", "longitude")

    val cellMap = CellDistrictMap.fromShapefile(spark, cells, shpPath)
      .orderBy("longitude").collect()
    assert(cellMap.length == 2)
    assert(cellMap(0).getAs[String]("district") == "Mueang Chiang Mai")
    assert(cellMap(1).getAs[String]("province") == "Lampang")
  }
}
