package graft.sources

import graft.SparkSpec
import graft.testutil.FileBuilders
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The shapefile DataSource V2: attributes + geometry paired by record
  * number, column pruning, the header-only count path, and the bbox
  * record filter. */
class ShapefileDataSourceSpec extends SparkSpec {

  private val squareA = Seq(
    (98.0, 18.0), (98.0, 19.0), (99.0, 19.0), (99.0, 18.0), (98.0, 18.0))
  private val squareB = Seq(
    (100.0, 18.0), (100.0, 19.0), (101.0, 19.0), (101.0, 18.0), (100.0, 18.0))

  private def writePair(): String = {
    val dir = Files.createTempDirectory("shp-dsv2")
    val shp = dir.resolve("adm.shp")
    Files.write(shp, FileBuilders.shp(Seq(Seq(squareA), Seq(squareB))))
    Files.write(dir.resolve("adm.dbf"), FileBuilders.dbf(
      fields = Seq(("NAME_EN", 20), ("PROV", 20)),
      records = Seq(Seq("Mueang", "Chiang Mai"), Seq("Fang", "Chiang Rai"))))
    shp.toString
  }

  test("load pairs dbf attributes with shp geometry by record number") {
    val df = spark.read.format("shapefile").option("encoding", "UTF-8").load(writePair())
    assert(df.columns.toSeq == Seq("NAME_EN", "PROV", "_recno", "wkt"))
    val rows = df.orderBy("_recno").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("NAME_EN") == "Mueang")
    assert(rows(0).getAs[String]("wkt").startsWith("MULTIPOLYGON"))
    assert(rows(1).getAs[String]("PROV") == "Chiang Rai")
    assert(rows(1).getAs[String]("wkt").contains("100 ") ||
      rows(1).getAs[String]("wkt").contains("100.0"))
  }

  test("attribute-only projection and count(*) avoid unneeded parsing") {
    val path = writePair()
    val df = spark.read.format("shapefile").option("encoding", "UTF-8").load(path)
    assert(df.select("NAME_EN").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("Fang", "Mueang"))
    assert(df.count() == 2) // header-only record count path
    // wkt-only projection never opens the dbf
    assert(df.select("wkt").collect().forall(_.getString(0).startsWith("MULTIPOLYGON")))
  }

  test("bbox option drops records whose envelope misses it") {
    val df = spark.read.format("shapefile").option("encoding", "UTF-8")
      .option("bbox", "97.0,17.0,99.5,20.0") // covers square A only
      .load(writePair())
    val rows = df.select("NAME_EN").collect().map(_.getString(0)).toSeq
    assert(rows == Seq("Mueang"))
  }
}
