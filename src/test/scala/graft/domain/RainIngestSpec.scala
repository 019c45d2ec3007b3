package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import java.sql.Timestamp

class RainIngestSpec extends SparkSpec {
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2023-06-01 00:00:00")
  private val t2 = Timestamp.valueOf("2023-06-02 00:00:00")

  private def provinces = Seq(
    (1, "เชียงใหม่", "Chiang Mai"),
    (2, "น่าน", "Nan"),
  ).toDF("province_id", "province_name", "province_name_en")

  // note "Muang Nan": the dim key is cleaned too, so it matches the
  // cell map's "Mueang Nan" via the Muang→Mueang romanization fix
  private def districts = Seq(
    (11, "เมืองเชียงใหม่", "Mueang Chiang Mai", 1),
    (21, "เมืองน่าน", "Muang Nan", 2),
  ).toDF("district_id", "district_name", "district_name_en", "province_id")

  private def cellMap = Seq(
    (18.00, 98.00, "Chiang Mai", "Mueang Chiang Mai"),
    (18.05, 98.00, "Chiang Mai", "Mueang Chiang Mai"),
    (19.00, 100.00, "Nan", "Mueang Nan"),
    (13.75, 100.50, "Bangkok", "Phra Nakhon"), // not northern → excluded
  ).toDF("latitude", "longitude", "province", "district")

  test("wrapLongitudes: only rewrites 0–360 grids") {
    val wrapped = RainIngest.wrapLongitudes(
      Seq((t1, 10.0, 260.0, 1.0), (t1, 10.0, 10.0, 1.0)).toDF("time", "latitude", "longitude", "precip"))
      .select("longitude").collect().map(_.getDouble(0)).toSet
    assert(wrapped == Set(-100.0, 10.0))

    val untouched = RainIngest.wrapLongitudes(
      Seq((t1, 10.0, 179.0, 1.0), (t1, 10.0, -10.0, 1.0)).toDF("time", "latitude", "longitude", "precip"))
      .select("longitude").collect().map(_.getDouble(0)).toSet
    assert(untouched == Set(179.0, -10.0))
  }

  test("full ingest: weighted mean + volume, drops, dim resolution") {
    val grid = Seq(
      // Chiang Mai, day 1: two cells
      (t1, 18.00, 98.00, 10.0),
      (t1, 18.05, 98.00, 20.0),
      // Nan, day 1
      (t1, 19.00, 100.00, 5.0),
      // dropped: zero, null, out-of-bbox, unmapped-cell
      (t1, 18.00, 98.00, 0.0),
      (t1, 50.00, 98.00, 9.0),
      (t1, 13.75, 100.50, 7.0), // Bangkok cell → filtered by province scope
      // day 2: Chiang Mai single cell
      (t2, 18.00, 98.00, 4.0),
    ).toDF("time", "latitude", "longitude", "precip")
      .unionByName(Seq((t1, 18.05, 98.00)).toDF("time", "latitude", "longitude")
        .withColumn("precip", org.apache.spark.sql.functions.lit(null).cast("double")))

    val out = RainIngest.ingest(spark, grid, cellMap, provinces, districts, uploadId = 7L)
      .orderBy("date", "district_id").collect()

    assert(out.length == 3)
    val w1 = math.cos(math.toRadians(18.00))
    val w2 = math.cos(math.toRadians(18.05))
    // dlat from matched cells {18.0, 18.05, 19.0} = 0.05; dlon {98, 100} = 2.0
    val area = (lat: Double) => 111.32 * 0.05 * 111.32 * 2.0 * math.cos(math.toRadians(lat))
    val vol = (p: Double, lat: Double) => p * area(lat) * 1000.0 / 1e6

    val cm1 = out.find(r => r.getAs[Int]("district_id") == 11 &&
      r.getAs[java.sql.Date]("date").toString == "2023-06-01").get
    assert(math.abs(cm1.getAs[Double]("rain_mm_wmean") - (10 * w1 + 20 * w2) / (w1 + w2)) < 1e-9)
    assert(math.abs(cm1.getAs[Double]("rainfall_mm") - (vol(10, 18.00) + vol(20, 18.05))) < 1e-9)
    assert(cm1.getAs[Long]("upload_id") == 7L)
    assert(cm1.getAs[Int]("year") == 2023)

    val nan1 = out.find(r => r.getAs[Int]("district_id") == 21).get
    assert(math.abs(nan1.getAs[Double]("rain_mm_wmean") - 5.0) < 1e-9)
    assert(nan1.getAs[Int]("province_id") == 2)

    val cm2 = out.find(r => r.getAs[java.sql.Date]("date").toString == "2023-06-02").get
    assert(math.abs(cm2.getAs[Double]("rain_mm_wmean") - 4.0) < 1e-9)
  }

  test("rows with unresolvable dims are dropped (P6)") {
    val grid = Seq((t1, 18.00, 98.00, 10.0), (t1, 19.00, 100.00, 5.0))
      .toDF("time", "latitude", "longitude", "precip")
    // dims missing Nan → its rows drop
    val out = RainIngest.ingest(spark, grid, cellMap,
      provinces.where(col("province_id") === 1), districts, uploadId = 1L)
    assert(out.select("district_id").collect().map(_.getInt(0)).toSeq == Seq(11))
  }
}
