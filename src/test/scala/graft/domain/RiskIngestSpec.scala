package graft.domain

import graft.SparkSpec

class RiskIngestSpec extends SparkSpec {
  import spark.implicits._

  private def provinces = Seq(
    (1, "เชียงใหม่", "Chiang Mai"),
    (2, "อุตรดิตถ์", "Uttaradit"),
  ).toDF("province_id", "province_name", "province_name_en")

  private def districts = Seq(
    (11, "เมือง", 1),
    (12, "ฝาง", 1),
    (21, "ลับแล", 2),
  ).toDF("district_id", "district_name", "province_id")

  // column names intentionally UPPERCASE (case-insensitive acceptance)
  // NB the "1" class: numeric values in [0,1] bucket by thirds, so a
  // literal 1 maps to class 3 (reference quirk, utils.py:263-266)
  private def dbf = Seq(
    ("เมือง", "จ.เชียงใหม่", "สูง"),    // normalizes to known key; class 3
    ("เมือง", "เชียงใหม่", "1"),        // same group; "1"→3 → avg 3
    ("ไม่มีจริง", "เชียงใหม่", "low"),  // unmatched district
    ("ลับแล", "นนทบุรี", "high"),       // unknown province
  ).toDF("AMPHOE_T", "PROV_NAM_T", "CLASS")

  test("matched avg→level, unmatched dropped, missing districts filled with 1") {
    val out = RiskIngest.ingest(spark, dbf, provinces, districts, uploadRiskId = 3L)
      .orderBy("district_id")
      .collect().map(r => (r.getAs[Long]("upload_risk_id"), r.getAs[Int]("province_id"),
        r.getAs[Int]("district_id"), r.getAs[Int]("risk_level"))).toSeq
    // เมือง: avg(3,3)=3 → level 3; ฝาง unmatched but province present → fill 1.
    // Uttaradit/นนทบุรี not present as *matched* provinces → no ลับแล row.
    assert(out == Seq((3L, 1, 11, 3), (3L, 1, 12, 1)))
  }

  test("special-fix rewrites RAW non-matching province values to Uttaradit") {
    val out = RiskIngest.ingest(spark, dbf, provinces, districts, uploadRiskId = 9L, specialFix = true)
      .orderBy("district_id")
      .collect().map(r => (r.getAs[Int]("province_id"),
        r.getAs[Int]("district_id"), r.getAs[Int]("risk_level"))).toSeq
    // quirk: "จ.เชียงใหม่" RAW ≠ normalized key "เชียงใหม่" → rewritten to
    // อุตรดิตถ์ even though normalization alone would have matched it.
    // Groups: (อุตรดิตถ์, เมือง) class 3 → no เมือง district under Uttaradit;
    //         (เชียงใหม่, เมือง) class "1"→3 → (1, 11, 3);
    //         (อุตรดิตถ์, ไม่มีจริง) → unmatched;
    //         (อุตรดิตถ์, ลับแล) high → (2, 21, 3).
    // Fill: provinces in file {เชียงใหม่, อุตรดิตถ์} → ฝาง(12) filled 1.
    assert(out == Seq((1, 11, 3), (1, 12, 1), (2, 21, 3)))
  }

  test("missing required columns rejected") {
    val bad = Seq(("x", "y")).toDF("amphoe_t", "prov_nam_t")
    val e = intercept[IllegalArgumentException] {
      RiskIngest.ingest(spark, bad, provinces, districts, 1L)
    }
    assert(e.getMessage.contains("class"))
  }

  test("re-bucketing: numeric classes average then re-level (0.2,0.9 → avg 2 → level 2)") {
    // 0.2 → 1 (first third), 0.9 → 3 (last third); avg = 2.0 → level 2
    val d = Seq(("เมือง", "เชียงใหม่", "0.2"), ("เมือง", "เชียงใหม่", "0.9"))
      .toDF("amphoe_t", "prov_nam_t", "class")
    val out = RiskIngest.ingest(spark, d, provinces, districts, 1L)
      .where($"district_id" === 11).head()
    assert(out.getAs[Int]("risk_level") == 2)
  }
}
