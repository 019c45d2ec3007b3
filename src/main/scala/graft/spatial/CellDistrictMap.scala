package graft.spatial

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The spatial join (SURVEY.md §2.4 J3) modeled as data: grid cells are
  * assigned to district polygons ONCE, producing a broadcastable
  * `(latitude, longitude) → (province, district)` mapping table; every
  * ingest then does a plain, optimizer-visible equi-join
  * ([[graft.domain.RainIngest]]).
  *
  * Point-in-polygon runs against driver-collected, bbox-indexed
  * polygons through one scalar UDF — the sanctioned fallback
  * (SURVEY §4): the polygon set is a dimension (~10²-10³ rows), the
  * grid is the big side and streams through unchanged. For a fixed-
  * resolution grid the result is exactly `sjoin(..., within)`.
  */
object CellDistrictMap {

  /** Minimal WKT polygon support: POLYGON ((outer), (hole)...) and
    * MULTIPOLYGON (((...)), ((...))). Coordinates are `lon lat` pairs
    * (WKT x y), matching the reference's EPSG:4326 shapefiles. */
  final case class Ring(xs: Array[Double], ys: Array[Double]) {
    /** Even-odd ray casting; boundary points count as inside enough
      * for grid-cell assignment (ties are resolution artifacts). */
    def contains(x: Double, y: Double): Boolean = {
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

  final case class Poly(outer: Ring, holes: Seq[Ring],
      minX: Double, maxX: Double, minY: Double, maxY: Double) {
    def contains(x: Double, y: Double): Boolean =
      x >= minX && x <= maxX && y >= minY && y <= maxY &&
        outer.contains(x, y) && !holes.exists(_.contains(x, y))
  }

  private def parseRing(s: String): Ring = {
    val pts = s.split(",").map(_.trim.split("\\s+"))
    Ring(pts.map(_(0).toDouble), pts.map(_(1).toDouble))
  }

  /** Parse one WKT POLYGON/MULTIPOLYGON into its polygons. */
  def parseWkt(wkt: String): Seq[Poly] = {
    val t = wkt.trim
    val upper = t.toUpperCase
    def polyOf(body: String): Poly = {
      // body = "(ring), (ring)..." — split on "),(" boundaries
      val rings = body.split("\\)\\s*,\\s*\\(").map(_.replaceAll("[()]", "")).map(parseRing)
      val o = rings.head
      Poly(o, rings.tail.toSeq, o.xs.min, o.xs.max, o.ys.min, o.ys.max)
    }
    if (upper.startsWith("MULTIPOLYGON")) {
      val body = t.substring(t.indexOf('(') + 1, t.lastIndexOf(')'))
      // split top-level polygons on ")),((":
      body.split("\\)\\s*\\)\\s*,\\s*\\(\\s*\\(").map(p => polyOf(p.replaceAll("^\\(+|\\)+$", ""))).toSeq
    } else if (upper.startsWith("POLYGON")) {
      val body = t.substring(t.indexOf('(') + 1, t.lastIndexOf(')'))
      Seq(polyOf(body))
    } else throw new IllegalArgumentException(s"unsupported WKT: ${t.take(30)}…")
  }

  /** Build the mapping table straight from a shapefile pair: the `.shp`
    * main file supplies the district polygons ([[graft.sources.ShpReader]]),
    * the sibling `.dbf` the province/district names, paired by record
    * order — the reference's `gpd.read_file` input (utils.py:80).
    *
    * @param provinceField,districtField attribute columns naming each
    *        polygon's ADM1/ADM2 (the reference renames ADM1_EN/ADM2_EN
    *        at utils.py:89)
    */
  def fromShapefile(spark: SparkSession, cells: DataFrame, shpPath: String,
      provinceField: String = "ADM1_EN", districtField: String = "ADM2_EN"): DataFrame = {
    val attrs = graft.sources.DbfReader
      .read(spark, shpPath.replaceAll("\\.shp$", ".dbf"), withRecno = true)
      .select(col("_recno"), col(provinceField).as("province"), col(districtField).as("district"))
    val geom = graft.sources.ShpReader.readWkt(spark, shpPath)
    fromPolygons(spark, cells, attrs.join(geom, Seq("_recno")))
  }

  /** Build the mapping table.
    *
    * @param cells    distinct grid cells: (latitude, longitude)
    * @param polygons (province, district, wkt) — EPSG:4326, x=lon y=lat
    */
  def fromPolygons(spark: SparkSession, cells: DataFrame, polygons: DataFrame): DataFrame = {
    val polys: Array[(String, String, Seq[Poly])] = polygons
      .select("province", "district", "wkt").collect()
      .map(r => (r.getString(0), r.getString(1), parseWkt(r.getString(2))))
    val bc = spark.sparkContext.broadcast(polys)

    val assign = udf { (lat: Double, lon: Double) =>
      bc.value.collectFirst {
        case (prov, dist, ps) if ps.exists(_.contains(lon, lat)) => (prov, dist)
      }
    }

    cells
      .select(col("latitude"), col("longitude"))
      .distinct()
      .withColumn("pd", assign(col("latitude"), col("longitude")))
      .where(col("pd").isNotNull)
      .select(col("latitude"), col("longitude"),
        col("pd._1").as("province"), col("pd._2").as("district"))
  }
}
