package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import java.sql.Date

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("facts partition by year; appends accumulate; date predicates prune partitions") {
    val root = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val wh = new Warehouse(spark, root)
    val r23 = Seq((1L, 1L, Date.valueOf("2023-06-01"), 2023, 1, 11, 1.0, 2.0))
      .toDF("pk_id", "upload_id", "date", "year", "province_id", "district_id", "rain_mm_wmean", "rainfall_mm")
    val r24 = Seq((2L, 1L, Date.valueOf("2024-06-01"), 2024, 1, 11, 3.0, 4.0))
      .toDF("pk_id", "upload_id", "date", "year", "province_id", "district_id", "rain_mm_wmean", "rainfall_mm")
    wh.write("rain_points", r23)
    wh.write("rain_points", r24)

    assert(new java.io.File(s"$root/rain_points/year=2023").exists())
    assert(new java.io.File(s"$root/rain_points/year=2024").exists())
    assert(wh.read("rain_points").count() == 2)

    // partition pruning visible in the physical plan
    val plan = wh.read("rain_points").where(col("year") === 2024)
      .queryExecution.executedPlan.toString
    assert(plan.contains("year=2024") || plan.toLowerCase.contains("partitionfilters"))

    // overwrite mode replaces
    wh.write("province", Seq((1, "a", "b")).toDF("province_id", "province_name", "province_name_en"),
      SaveMode.Overwrite)
    assert(wh.read("province").count() == 1)
  }

  test("readOrEmpty yields a typed empty frame for missing tables") {
    val root = java.nio.file.Files.createTempDirectory("graft-wh2").toString
    val wh = new Warehouse(spark, root)
    val empty = wh.readOrEmpty("incident_statistics_points", graft.domain.Schemas.incidentStatisticsPoints)
    assert(empty.count() == 0)
    assert(empty.columns.contains("disaster_date"))
  }
}
