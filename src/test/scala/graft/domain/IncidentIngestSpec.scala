package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class IncidentIngestSpec extends SparkSpec {
  import spark.implicits._

  private def provinces = Seq(
    (1, "เชียงใหม่", "Chiang Mai"),
    (2, "น่าน", "Nan"),
  ).toDF("province_id", "province_name", "province_name_en")

  private def districts = Seq(
    (11, "เมือง", 1),
    (21, "เวียงสา", 2),
  ).toDF("district_id", "district_name", "province_id")

  private def emptyExisting: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Schemas.incidentStatisticsPoints)

  test("normalizeColumns: English passthrough, Thai format-2 rename, rejection") {
    val en = Seq(("2024-05-03", "a", "b")).toDF(" Disaster Date ", "Province", "District")
    assert(IncidentIngest.normalizeColumns(en).isDefined)
    val th = Seq(("2024-05-03", "a", "b")).toDF("วันที่เกิดภัย", "จังหวัด", "อำเภอ")
    val renamed = IncidentIngest.normalizeColumns(th)
    assert(renamed.isDefined && IncidentIngest.RequiredCols.forall(renamed.get.columns.contains))
    val bad = Seq(("x", "y")).toDF("foo", "bar")
    assert(IncidentIngest.normalizeColumns(bad).isEmpty)
  }

  private def file = Seq(
    ("2024-05-03", "เชียงใหม่ ", " เมือง"),  // trimmed name matching
    ("2024-05-03", "เชียงใหม่", "เมือง"),
    ("2024-05-03", "เชียงใหม่", "เมือง"),    // 3 incidents same key
    ("2024-05-04", "เชียงใหม่", "เมือง"),
    ("2024-05-05", "น่าน", "เวียงสา"),
    ("not-a-date", "เชียงใหม่", "เมือง"),     // coerced to NULL date — the
    // reference KEEPS this row (only null ids drop) and inserts it with
    // a null date and count 1 (utils.py:533 drops ids only)
    ("also-bad", "เชียงใหม่", "เมือง"),       // second bad-date row, same
    // district: still ONE null-date insert with count 1 (the reference's
    // count join can't match null keys, so fillna(1) wins)
    ("2024-05-03", "ไม่รู้จัก", "เมือง"),     // unmatched province → dropped
  ).toDF("Disaster Date", "Province", "District")

  private def dateStr(r: org.apache.spark.sql.Row): String =
    Option(r.getAs[java.sql.Date]("disaster_date")).map(_.toString).getOrElse("null")

  test("counts per key, in-file dedup, null-date quirk, empty existing") {
    val out = IncidentIngest.ingest(spark, file, provinces, districts, emptyExisting)
      .orderBy(org.apache.spark.sql.functions.asc_nulls_last("disaster_date"), $"district_id")
      .collect()
      .map(r => (dateStr(r), r.getAs[Int]("province_id"), r.getAs[Int]("district_id"),
        r.getAs[Int]("count_of_disasters"))).toSeq
    assert(out == Seq(
      ("2024-05-03", 1, 11, 3),
      ("2024-05-04", 1, 11, 1),
      ("2024-05-05", 2, 21, 1),
      ("null", 1, 11, 1)))
  }

  test("idempotency: re-ingest inserts only the null-date quirk row (J6)") {
    val first = IncidentIngest.ingest(spark, file, provinces, districts, emptyExisting)
    val existing = first.withColumn("incident_id", org.apache.spark.sql.functions.lit(1L))
    val second = IncidentIngest.ingest(spark, file, provinces, districts, existing).collect()
    // valid keys all anti-joined away; the null-date row can never match
    // an existing key, so the reference re-inserts it every upload
    assert(second.map(dateStr).toSeq == Seq("null"))
  }

  test("partial overlap: only new keys inserted, date-range scoped") {
    val existing = Seq((1L, java.sql.Date.valueOf("2024-05-03"), 2024, 1, 11, 3))
      .toDF("incident_id", "disaster_date", "year", "province_id", "district_id", "count_of_disasters")
    val out = IncidentIngest.ingest(spark, file, provinces, districts, existing)
      .orderBy(org.apache.spark.sql.functions.asc_nulls_last("disaster_date")).collect()
      .map(dateStr).toSeq
    assert(out == Seq("2024-05-04", "2024-05-05", "null"))
  }
}
