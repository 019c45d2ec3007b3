package graft.spatial

import graft.SparkSpec
import graft.domain.RainIngest
import java.sql.Timestamp

class CellDistrictMapSpec extends SparkSpec {
  import spark.implicits._

  test("WKT parsing + ray casting: polygon, hole, multipolygon") {
    val square = CellDistrictMap.parseWkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(square.head.contains(5, 5))
    assert(!square.head.contains(15, 5))

    val holed = CellDistrictMap.parseWkt(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(holed.head.contains(2, 2))
    assert(!holed.head.contains(5, 5)) // inside the hole

    val multi = CellDistrictMap.parseWkt(
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")
    assert(multi.exists(_.contains(1, 1)) && multi.exists(_.contains(6, 6)))
    assert(!multi.exists(_.contains(3, 3)))
  }

  test("fromPolygons assigns cells; unmatched cells drop") {
    // squares in (lon, lat): district A covers lon 98-99 lat 18-19
    val polygons = Seq(
      ("Chiang Mai", "Mueang", "POLYGON ((98 18, 99 18, 99 19, 98 19, 98 18))"),
      ("Nan", "Wiang Sa", "POLYGON ((100 18, 101 18, 101 19, 100 19, 100 18))"),
    ).toDF("province", "district", "wkt")
    val cells = Seq(
      (18.5, 98.5),  // Mueang
      (18.5, 100.5), // Wiang Sa
      (18.5, 99.5),  // gap → dropped
    ).toDF("latitude", "longitude")
    val out = CellDistrictMap.fromPolygons(spark, cells, polygons)
      .orderBy("longitude").collect()
      .map(r => (r.getDouble(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq((98.5, "Chiang Mai", "Mueang"), (100.5, "Nan", "Wiang Sa")))
  }

  test("polygon-built cell map slots into RainIngest unchanged") {
    val t1 = Timestamp.valueOf("2023-06-01 00:00:00")
    val polygons = Seq(
      ("Chiang Mai", "Mueang Chiang Mai", "POLYGON ((97.9 17.9, 98.1 17.9, 98.1 18.1, 97.9 18.1, 97.9 17.9))"),
    ).toDF("province", "district", "wkt")
    val grid = Seq(
      (t1, 18.00, 98.00, 10.0),
      (t1, 18.05, 98.05, 20.0),
      (t1, 19.00, 99.00, 5.0), // outside the polygon
    ).toDF("time", "latitude", "longitude", "precip")
    val cellMap = CellDistrictMap.fromPolygons(spark, grid.select("latitude", "longitude"), polygons)
    val provinces = Seq((1, "เชียงใหม่", "Chiang Mai")).toDF("province_id", "province_name", "province_name_en")
    val districts = Seq((11, "เมือง", "Mueang Chiang Mai", 1))
      .toDF("district_id", "district_name", "district_name_en", "province_id")
    val out = RainIngest.ingest(spark, grid, cellMap, provinces, districts, uploadId = 1L)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Int]("district_id") == 11)
  }
}
