package graft.spatial

import graft.SparkSpec

class GeoJsonSpec extends SparkSpec {
  import spark.implicits._

  test("feature collection from WKT polygons with typed properties") {
    val df = Seq(
      ("Chiang Mai", "Mueang Chiang Mai", 3, 82.5,
        "POLYGON ((98 18, 98 19, 99 19, 99 18, 98 18))"),
      ("Lampang", "Mueang \"LP\"", 1, 40.0,
        "MULTIPOLYGON (((100 18, 100 19, 101 19, 101 18, 100 18)), ((102 18, 102 19, 103 19, 103 18, 102 18)))"),
    ).toDF("province", "district", "risk_level", "score", "wkt")
    val fc = GeoJson.featureCollection(df)
    assert(fc.startsWith("""{"type":"FeatureCollection","features":["""))
    assert(fc.contains(""""type":"Polygon""""))
    assert(fc.contains(""""type":"MultiPolygon""""))
    assert(fc.contains(""""province":"Chiang Mai""""))
    assert(fc.contains(""""district":"Mueang \"LP\"""")) // quote escaping
    assert(fc.contains(""""risk_level":3""")) // numbers unquoted
    assert(fc.contains(""""score":82.5"""))
    assert(fc.contains("[98.0,18.0]"))
    // two features, both rings closed
    assert("\"type\":\"Feature\"".r.findAllIn(fc).length == 2)
  }

  test("geometry closes an unclosed ring") {
    val g = GeoJson.geometry("POLYGON ((0 0, 0 1, 1 1, 1 0))")
    assert(g.endsWith("""[[0.0,0.0],[0.0,1.0],[1.0,1.0],[1.0,0.0],[0.0,0.0]]]}"""))
  }
}
