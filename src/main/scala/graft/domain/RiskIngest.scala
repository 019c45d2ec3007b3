package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DBF landslide-risk attribute table → per-district risk levels
  * (SURVEY.md §3; reference `backend/app/utils.py:286-434`).
  *
  * Semantics preserved exactly, including the quirks:
  *   - special-fix compares the file's RAW `prov_nam_t` values against
  *     the NORMALIZED DB keys (the reference runs the fix before its
  *     own normalization pass — utils.py:321-332 vs 344-345);
  *   - every district of any province seen in the file gets a row;
  *     unmatched districts are filled with risk_level=1; matched rows
  *     win on conflict; one row per district per upload;
  *   - keep-first dedup is made deterministic with a row_number over
  *     the normalized (province, district) key order (pandas iterates
  *     the groupby's sorted key order; Spark needs the explicit window).
  *
  * Scale notes: dims and the per-district aggregate are tiny and
  * broadcast; the only shuffle is the groupBy on the file's
  * (province, district) keys — safe at any file size.
  */
object RiskIngest {

  /** Columns the file must carry (lower-cased; utils.py:298-302). */
  val RequiredCols: Set[String] = Set("amphoe_t", "prov_nam_t", "class")

  /** @param fuzzyResolve max edit distance for name resolution: 0 (the
    *   default) is the reference's exact-match semantics — misspelled
    *   (province, district) keys fall into the risk_level=1 fill; d > 0
    *   first corrects non-matching key PAIRS jointly to the nearest
    *   real (province, district) combination within d total edits
    *   ([[FuzzyResolve.correctPair]]); exact matches never touched. */
  def ingest(
      spark: SparkSession,
      dbf: DataFrame,
      provinces: DataFrame,
      districts: DataFrame,
      uploadRiskId: Long,
      specialFix: Boolean = false,
      fuzzyResolve: Int = 0): DataFrame = {

    // case-insensitive column acceptance, then schema assertion
    val lowered = dbf.toDF(dbf.columns.toIndexedSeq.map(_.toLowerCase): _*)
    val missing = RequiredCols -- lowered.columns.toSet
    require(missing.isEmpty,
      s"DBF missing required columns ${missing.mkString(", ")} (have: ${lowered.columns.mkString(", ")})")

    val provKeyed = provinces.select(
      col("province_id"), col("province_name"), col("province_name_en"),
      TextNorm.normalizeTh(col("province_name")).as("prov_key"))
    val distKeyed = districts.select(
      col("district_id"), col("province_id"),
      TextNorm.normalizeTh(col("district_name")).as("dist_key"))

    // F12 special-fix: raw prov_nam_t not matching any normalized DB
    // key is overwritten with Uttaradit's normalized key (quirk kept)
    val fixed = if (specialFix) {
      val knownKeys = provKeyed.select("prov_key").collect().map(_.getString(0)).toSeq
      val uttKey = provKeyed.where(col("province_name_en") === "Uttaradit")
        .select("prov_key").head().getString(0)
      lowered.withColumn("prov_nam_t",
        when(!col("prov_nam_t").isin(knownKeys: _*), lit(uttKey))
          .otherwise(col("prov_nam_t")))
    } else lowered

    // F2 normalize file keys; F4 class → numeric; drop unmapped classes
    val classed0 = fixed
      .withColumn("prov_key", TextNorm.normalizeTh(col("prov_nam_t")))
      .withColumn("dist_key", TextNorm.normalizeTh(col("amphoe_t")))
      .withColumn("class_num", Buckets.classToNum(col("class")))
      .na.drop(Seq("class_num"))
    // opt-in J5 fuzzy fallback, BEFORE the per-district aggregate so a
    // corrected row merges into its correctly-spelled district's group
    val classed =
      if (fuzzyResolve <= 0) classed0
      else FuzzyResolve.correctPair(classed0, "prov_key", "dist_key",
        distKeyed.join(provKeyed.select(col("province_id"), col("prov_key")),
          Seq("province_id"))
          .select(col("prov_key").as("k1"), col("dist_key").as("k2")),
        fuzzyResolve)

    // A6 + F5: mean class per (province, district) key → level
    val riskByAmp = classed
      .groupBy("prov_key", "dist_key")
      .agg(avg(col("class_num")).as("risk_avg"))
      .withColumn("risk_level", Buckets.avgToLevel(col("risk_avg")))

    // J5: resolve against district-with-province (broadcast dims)
    val distWithProv = distKeyed.as("d")
      .join(broadcast(provKeyed.select(col("province_id"), col("prov_key").as("prov_key_db"))),
        Seq("province_id"), "left")

    val matched = riskByAmp
      .join(broadcast(distWithProv),
        riskByAmp("prov_key") === distWithProv("prov_key_db") &&
          riskByAmp("dist_key") === distWithProv("dist_key"), "left")

    // matched result: one row per district, keep-first by key order
    val keepFirst = Window.partitionBy(col("district_id"))
      .orderBy(col("prov_key"), riskByAmp("dist_key"))
    val resultMatched = matched
      .where(col("province_id").isNotNull && col("district_id").isNotNull)
      .withColumn("rn", row_number().over(keepFirst))
      .where(col("rn") === 1)
      .select(col("province_id").cast("int"), col("district_id").cast("int"),
        col("risk_level").cast("int"))

    // J7 + U1: fill every unmatched district of the provinces present
    // in the file with risk_level = 1
    val provKeysInFile = riskByAmp.select(col("prov_key")).distinct()
    val provIdsInFile = provKeyed.join(provKeysInFile, Seq("prov_key")).select("province_id").distinct()
    val allDistricts = distWithProv
      .join(broadcast(provIdsInFile), Seq("province_id"))
      .select(col("province_id"), col("district_id")).distinct()
    val fill = allDistricts
      .join(resultMatched.select("province_id", "district_id"),
        Seq("province_id", "district_id"), "left_anti")
      .withColumn("risk_level", lit(1))

    // matched wins over fill on district_id collision (priority window)
    val prio = Window.partitionBy(col("district_id")).orderBy(col("src"))
    resultMatched.withColumn("src", lit(0))
      .unionByName(fill.select(col("province_id").cast("int"),
        col("district_id").cast("int"), col("risk_level").cast("int"))
        .withColumn("src", lit(1)))
      .withColumn("rn", row_number().over(prio))
      .where(col("rn") === 1)
      .select(
        lit(uploadRiskId).as("upload_risk_id"),
        col("province_id"), col("district_id"), col("risk_level"))
  }
}
