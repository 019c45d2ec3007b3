package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import scala.util.Random

/** Randomized invariant tests (SURVEY.md §5.3) — bulk-evaluated in one
  * DataFrame pass per property against a driver-side reference
  * implementation, seeded for reproducibility.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of F4 class_to_num's numeric path (Python
    * semantics: thirds on [0,1], else banker's round clamped to [1,3]). */
  private def refClassToNum(v: Double): Int =
    if (v >= 0 && v <= 1) {
      if (v < 1.0 / 3.0) 1 else if (v < 2.0 / 3.0) 2 else 3
    } else {
      val r = BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toInt
      math.max(1, math.min(3, r))
    }

  test("classToNum: total over random doubles, matches reference semantics") {
    val rnd = new Random(42)
    val vals = Seq.fill(2000)(rnd.nextDouble() * 20 - 10) ++
      Seq(0.0, 1.0, 1.0 / 3.0, 2.0 / 3.0, 1.5, 2.5, -0.0, 3.5)
    val got = vals.toDF("v").select(Buckets.classToNum(col("v")))
      .collect().map(_.getInt(0))
    vals.zip(got).foreach { case (v, g) =>
      assert(g == refClassToNum(v), s"classToNum($v) = $g, want ${refClassToNum(v)}")
    }
  }

  test("pagination: pages partition the filtered set exactly") {
    val rnd = new Random(7)
    val n = 137
    val rain = (1 to n).map(i =>
      (i.toLong, 1L, java.sql.Date.valueOf("2024-01-01"), 2024, 1, 11, rnd.nextDouble() * 100, 0.0))
      .toDF("pk_id", "upload_id", "date", "year", "province_id", "district_id", "rain_mm_wmean", "rainfall_mm")
    val provinces = Seq((1, "p", "p")).toDF("province_id", "province_name", "province_name_en")
    val districts = Seq((11, "d", "d", 1)).toDF("district_id", "district_name", "district_name_en", "province_id")

    for (pageSize <- Seq(1, 10, 50, 200)) {
      val expectPages = math.max((n + pageSize - 1) / pageSize, 1)
      var seen = Set.empty[Long]
      var page = 1
      var done = false
      while (!done) {
        val res = ListQueries.listRain(rain, provinces, districts,
          ListQueries.FactFilters(),
          ListQueries.PageRequest(page = page, pageSize = pageSize, orderBy = "rain_mm_wmean"))
        assert(res.total == n && res.allPage == expectPages)
        val ids = res.items.select("pk_id").collect().map(_.getLong(0))
        assert(ids.length == math.min(pageSize, n - (page - 1) * pageSize))
        assert(ids.toSet.intersect(seen).isEmpty, "pages overlap")
        seen ++= ids
        page += 1
        done = page > res.allPage
      }
      assert(seen.size == n, s"pages did not cover the set at pageSize=$pageSize")
    }
  }

  test("risk fill invariant: every district of every in-file province gets exactly one row") {
    val rnd = new Random(13)
    val provinces = (1 to 5).map(i => (i, s"P$i", s"P$i"))
      .toDF("province_id", "province_name", "province_name_en")
    val districts = (1 to 40).map(i => (i, s"D${i % 12}", i % 5 + 1))
      .toDF("district_id", "district_name", "province_id")
    val classes = Seq("low", "medium", "high", "junk", "0.5", "2")
    val dbf = (1 to 300).map { _ =>
      (s"D${rnd.nextInt(15)}", s"P${rnd.nextInt(7) + 1}", classes(rnd.nextInt(classes.size)))
    }.toDF("amphoe_t", "prov_nam_t", "class")

    val out = RiskIngest.ingest(spark, dbf, provinces, districts, uploadRiskId = 1L)
    val rows = out.collect()
    // one row per district
    assert(rows.map(_.getAs[Int]("district_id")).distinct.length == rows.length)
    // coverage = all districts of provinces that appear in the file with ≥1 mappable class
    val provsInFile = dbf.where(!col("class").isin("junk"))
      .select("prov_nam_t").distinct().collect().map(_.getString(0))
      .filter(p => (1 to 5).map(i => s"P$i").contains(p)).toSet
    val expected = districts.collect()
      .filter(r => provsInFile.contains(s"P${r.getInt(2)}")).map(_.getInt(0)).toSet
    assert(rows.map(_.getAs[Int]("district_id")).toSet == expected)
    // levels always in [1,3]
    assert(rows.forall(r => (1 to 3).contains(r.getAs[Int]("risk_level"))))
  }
}
