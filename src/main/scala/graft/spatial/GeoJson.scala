package graft.spatial

import org.apache.spark.sql.{DataFrame, Row}

/** GeoJSON FeatureCollection export — the reference's (disabled)
  * north-region feature dump for the frontend map (SURVEY.md §2.2 K3;
  * reference `backend/app/utils.py:204-211`). Driver-side: the export
  * is a dimension-scale artifact (~10² district polygons + the day's
  * scored rows), not a fact-table sink.
  *
  * Input: any DataFrame with a `wkt` column (POLYGON/MULTIPOLYGON,
  * lon-lat order); every other column becomes a feature property.
  */
object GeoJson {

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + esc(s) + "\""
    case b: Boolean => b.toString
    // JSON has no NaN/Infinity tokens — emit null or the export is unparseable
    case d: java.lang.Double if d.isNaN || d.isInfinite => "null"
    case f: java.lang.Float if f.isNaN || f.isInfinite => "null"
    case n: java.lang.Number => n.toString
    case d: java.sql.Date => "\"" + d.toString + "\""
    case t: java.sql.Timestamp => "\"" + t.toString + "\""
    case other => "\"" + esc(other.toString) + "\""
  }

  private def ringCoords(r: CellDistrictMap.Ring): String = {
    // GeoJSON rings must close; WKT rings from our parsers already do,
    // but tolerate an unclosed input by repeating the first vertex
    val pts = r.xs.indices.map(i => s"[${r.xs(i)},${r.ys(i)}]")
    val closed = if (r.xs.nonEmpty &&
      (r.xs.head != r.xs.last || r.ys.head != r.ys.last)) pts :+ pts.head else pts
    closed.mkString("[", ",", "]")
  }

  /** One WKT polygon/multipolygon → GeoJSON geometry object. */
  def geometry(wkt: String): String = {
    val polys = CellDistrictMap.parseWkt(wkt)
    val polyCoords = polys.map(p =>
      (ringCoords(p.outer) +: p.holes.map(ringCoords)).mkString("[", ",", "]"))
    if (polys.size == 1)
      s"""{"type":"Polygon","coordinates":${polyCoords.head}}"""
    else
      s"""{"type":"MultiPolygon","coordinates":${polyCoords.mkString("[", ",", "]")}}"""
  }

  /** DataFrame (wkt + property columns) → FeatureCollection string. */
  def featureCollection(df: DataFrame): String = {
    val cols = df.columns
    val wktIdx = cols.indexOf("wkt")
    require(wktIdx >= 0, "featureCollection input needs a 'wkt' column")
    val features = df.collect().map { (row: Row) =>
      val props = cols.zipWithIndex.collect {
        case (c, i) if i != wktIdx => "\"" + esc(c) + "\":" + jsonValue(row.get(i))
      }.mkString("{", ",", "}")
      s"""{"type":"Feature","geometry":${geometry(row.getString(wktIdx))},"properties":$props}"""
    }
    s"""{"type":"FeatureCollection","features":${features.mkString("[", ",", "]")}}"""
  }
}
