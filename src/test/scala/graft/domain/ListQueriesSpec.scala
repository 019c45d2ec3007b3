package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import java.sql.Date

class ListQueriesSpec extends SparkSpec {
  import spark.implicits._
  import ListQueries._

  private def provinces = Seq(
    (1, "เชียงใหม่", "Chiang Mai"),
    (2, "น่าน", "Nan"),
  ).toDF("province_id", "province_name", "province_name_en")

  private def districts = Seq(
    (11, "เมืองเชียงใหม่", "Mueang Chiang Mai", 1),
    (12, "ฝาง", "Fang", 1),
    (21, "เวียงสา", "Wiang Sa", 2),
  ).toDF("district_id", "district_name", "district_name_en", "province_id")

  private def rain = Seq(
    (1L, 10L, Date.valueOf("2024-05-01"), 2024, 1, 11, 3.5, 100.0),
    (2L, 10L, Date.valueOf("2024-05-02"), 2024, 1, 12, 7.0, 200.0),
    (3L, 10L, Date.valueOf("2024-05-03"), 2024, 2, 21, 1.0, 50.0),
    (4L, 10L, Date.valueOf("2024-05-04"), 2024, 1, 11, 9.0, 300.0),
    (5L, 10L, Date.valueOf("2024-05-05"), 2024, 2, 21, 2.0, 60.0),
  ).toDF("pk_id", "upload_id", "date", "year", "province_id", "district_id", "rain_mm_wmean", "rainfall_mm")

  test("listRain: filter + sort + paginate envelope") {
    val res = listRain(rain, provinces, districts,
      FactFilters(provinceId = Some(1)),
      PageRequest(page = 1, pageSize = 2, orderBy = "rain_mm_wmean", orderType = "desc"))
    assert(res.total == 3 && res.allPage == 2 && res.page == 1)
    val rows = res.items.collect()
    assert(rows.map(_.getAs[Double]("rain_mm_wmean")).toSeq == Seq(9.0, 7.0))
    assert(rows.head.getAs[String]("province_name") == "เชียงใหม่")
    assert(rows.head.getAs[String]("district_name_en") == "Mueang Chiang Mai")
  }

  test("page clamp: page beyond the end returns the last page") {
    val res = listRain(rain, provinces, districts, FactFilters(),
      PageRequest(page = 99, pageSize = 2, orderBy = "date"))
    assert(res.allPage == 3 && res.page == 3)
    assert(res.items.collect().map(_.getAs[Long]("pk_id")).toSeq == Seq(5L))
  }

  test("unknown order_by falls back (rain → date)") {
    val res = listRain(rain, provinces, districts, FactFilters(),
      PageRequest(page = 1, pageSize = 3, orderBy = "nonsense", orderType = "desc"))
    assert(res.items.collect().map(_.getAs[Date]("date").toString).toSeq ==
      Seq("2024-05-05", "2024-05-04", "2024-05-03"))
  }

  test("date-range filters") {
    val res = listRain(rain, provinces, districts,
      FactFilters(dateStart = Some("2024-05-02"), dateEnd = Some("2024-05-04")),
      PageRequest(pageSize = 10, orderBy = "date"))
    assert(res.total == 3)
  }

  test("listRisk: quirky fallback sort = district dim's province_id; no helper col leaks") {
    val risk = Seq(
      (1L, 5L, 2, 21, 3),
      (2L, 5L, 1, 11, 1),
      (3L, 5L, 1, 12, 2),
    ).toDF("risk_id", "upload_risk_id", "province_id", "district_id", "risk_level")
    val res = listRisk(risk, provinces, districts, FactFilters(),
      PageRequest(pageSize = 10, orderBy = "unknown"))
    val rows = res.items.collect()
    assert(!rows.head.schema.fieldNames.contains("d_province_id"))
    // fallback asc by district-dim province_id: (11,12 under p1) before 21
    assert(rows.map(_.getAs[Int]("district_id")).toSeq.takeRight(1) == Seq(21))
  }

  test("listProvinceDistrict + listProvince + listDistrict") {
    val pd = listProvinceDistrict(provinces, districts, FactFilters(provinceId = Some(1)),
      PageRequest(pageSize = 10, orderBy = "district_name"))
    assert(pd.total == 2)
    assert(listProvince(provinces).collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(listDistrict(districts, Some(2)).collect().map(_.getInt(0)).toSeq == Seq(21))
  }

  test("dateLimit") {
    val r = dateLimit(rain).head()
    assert(r.getAs[Date]("min_date").toString == "2024-05-01")
    assert(r.getAs[Date]("max_date").toString == "2024-05-05")
  }

  test("graph: risk fans out per upload, incident coalesce, score") {
    val risk = Seq(
      (1L, 5L, 1, 11, 2),
      (2L, 6L, 1, 11, 3), // second upload for district 11 → fan-out
      (3L, 5L, 1, 12, 1),
    ).toDF("risk_id", "upload_risk_id", "province_id", "district_id", "risk_level")
    val incidents = Seq(
      (1L, Date.valueOf("2024-05-01"), 2024, 1, 11, 2),
      (2L, Date.valueOf("2024-05-02"), 2024, 1, 12, 9), // other day → ignored
    ).toDF("incident_id", "disaster_date", "year", "province_id", "district_id", "count_of_disasters")

    val out = graph("2024-05-01", rain, provinces, districts, risk, incidents)
      .orderBy("district_id", "risk_level").collect()
    // rain on 05-01: district 11 only; fans out ×2 risk rows
    assert(out.length == 2)
    assert(out.map(_.getAs[Int]("risk_level")).toSeq == Seq(2, 3))
    assert(out.forall(_.getAs[Int]("count_of_disasters") == 2))
    // score: rain 3.5/2 + risk*10 + boost: cnt=2 → max(80, base+10)
    val s = out.map(_.getAs[Double]("score")).toSeq
    assert(s == Seq(80.0, 80.0))
  }

  test("PageRequest bounds validated") {
    intercept[IllegalArgumentException](PageRequest(page = 0))
    intercept[IllegalArgumentException](PageRequest(pageSize = 201))
    intercept[IllegalArgumentException](PageRequest(orderType = "sideways"))
  }
}
