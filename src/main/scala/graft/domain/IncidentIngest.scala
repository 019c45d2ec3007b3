package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Excel incident log → deduplicated, idempotent incident counts
  * (SURVEY.md §3; reference `backend/app/utils.py:470-616`).
  *
  * The sheet choice / dual-header reshaping (S5) happens before any
  * DataFrame exists — see [[normalizeColumns]] and
  * [[TextNorm.chooseSheet]]; this object owns everything after the
  * file is rows of (Disaster Date, Province, District).
  *
  * Idempotency is the reference's anti-join pattern (J6): incoming keys
  * are checked against rows already in the table, scoped to the file's
  * own [min, max] date range so the existing-side scan partition-prunes
  * (the fact table is year-partitioned). Re-ingesting a file inserts 0.
  *
  * Scale notes: dims broadcast; the per-key count and the in-file dedup
  * share one shuffle key (disaster_date, province_id, district_id); the
  * anti-join's build side is only the date-scoped slice of the table.
  */
object IncidentIngest {

  val RequiredCols: Seq[String] = Seq("Disaster Date", "Province", "District")

  /** Thai→English header rename for format-2 files (utils.py:501). */
  val ThaiHeaderRename: Map[String, String] = Map(
    "วันที่เกิดภัย" -> "Disaster Date",
    "จังหวัด" -> "Province",
    "อำเภอ" -> "District")

  /** S5 header handling: trim header names; if the English headers are
    * absent the caller re-reads with two rows skipped and this applies
    * the Thai rename. Returns None when required columns are still
    * missing (format detection, utils.py:487-501). */
  def normalizeColumns(df: DataFrame): Option[DataFrame] = {
    val trimmed = df.toDF(df.columns.toIndexedSeq.map(_.trim): _*)
    val renamed = trimmed.columns.foldLeft(trimmed) { (d, c) =>
      ThaiHeaderRename.get(c).map(d.withColumnRenamed(c, _)).getOrElse(d)
    }
    if (RequiredCols.forall(renamed.columns.contains)) Some(renamed) else None
  }

  /** Incident rows to APPEND (the caller writes them): dedup within the
    * file, anti-join against `existing`, re-attach per-key counts.
    *
    * @param file     rows with (Disaster Date, Province, District) — strings
    * @param existing current incident_statistics_points table (may be empty)
    * @param fuzzyResolve max edit distance for name resolution: 0 (the
    *   default) is the reference's exact dict lookup — misspelled
    *   province/district names silently drop (utils.py:505-519); d > 0
    *   first corrects non-matching names to their nearest dim name
    *   within d edits ([[FuzzyResolve.correct]] — exact matches are
    *   never touched, so well-spelled rows are byte-identical)
    */
  def ingest(
      spark: SparkSession,
      file: DataFrame,
      provinces: DataFrame,
      districts: DataFrame,
      existing: DataFrame,
      fuzzyResolve: Int = 0): DataFrame = {

    // J5 (dict-lookup ≡ broadcast left join on trimmed names; the
    // reference's dict keeps the LAST duplicate name — mirror that)
    import org.apache.spark.sql.expressions.Window
    val lastWins = Window.partitionBy(col("k")).orderBy(col("id").desc)
    val provMap = provinces
      .select(trim(col("province_name")).as("k"), col("province_id").as("id"))
      .withColumn("rn", row_number().over(lastWins)).where(col("rn") === 1)
      .select(col("k").as("prov_name_key"), col("id").as("province_id"))
    val distMap = districts
      .select(trim(col("district_name")).as("k"), col("district_id").as("id"))
      .withColumn("rn", row_number().over(lastWins)).where(col("rn") === 1)
      .select(col("k").as("dist_name_key"), col("id").as("district_id"))

    // F6: yyyy-MM-dd parse, null on failure (≡ errors="coerce"). The
    // extra branches accept what raw-XML xlsx reads surface for real
    // date cells: datetime strings and Excel day serials (epoch
    // 1899-12-30) — pandas sees those as datetimes before its strict
    // format check, so this matches the reference's accepted inputs.
    val ds = col("Disaster Date").cast("string")
    val serial = ds.try_cast("double")
    val keyed0 = file
      .withColumn("prov_name_key", trim(col("Province").cast("string")))
      .withColumn("dist_name_key", trim(col("District").cast("string")))
    // opt-in J5 fuzzy fallback: correct unresolvable name keys to the
    // nearest dim name, then let the unchanged exact joins resolve them
    val keyed =
      if (fuzzyResolve <= 0) keyed0
      else FuzzyResolve.correct(
        FuzzyResolve.correct(keyed0, "prov_name_key",
          provMap.select(col("prov_name_key").as("k")), fuzzyResolve),
        "dist_name_key",
        distMap.select(col("dist_name_key").as("k")), fuzzyResolve)
    val parsed = keyed
      .join(broadcast(provMap), Seq("prov_name_key"), "left")
      .join(broadcast(distMap), Seq("dist_name_key"), "left")
      .withColumn("disaster_date",
        coalesce(
          try_to_timestamp(ds, lit("yyyy-MM-dd")).cast("date"),
          try_to_timestamp(ds, lit("yyyy-MM-dd HH:mm:ss")).cast("date"),
          try_to_timestamp(ds, lit("yyyy-MM-dd'T'HH:mm:ss")).cast("date"),
          when(serial.between(20000, 80000),
            date_add(to_date(lit("1899-12-30")), serial.cast("int")))))
      .withColumn("year", year(col("disaster_date")))

    // P6: drop rows whose dimension match failed
    val matched = parsed
      .na.drop(Seq("province_id", "district_id"))
      .select(col("disaster_date"), col("year").cast("int"),
        col("province_id").cast("int"), col("district_id").cast("int"))

    // A7 + A8 fused: the per-key count aggregate's key set IS the
    // in-file dedup set (one shuffle instead of three — the reference's
    // separate dedup + count-merge recombine to the same rows). `year`
    // rides along via min (constant within a date group).
    //
    // Null-date quirk preserved: the reference's count join can never
    // match a null key, so null-date rows always insert with count 1
    // regardless of how many bad-date rows shared the key.
    // Materialized eagerly (one row per (date, district) — small):
    // the A9 range probe below and the anti-join both consume it, and
    // without the checkpoint each would re-run the whole file parse +
    // dim joins + shuffle.
    val perKey = matched
      .groupBy("disaster_date", "province_id", "district_id")
      .agg(count(lit(1)).cast("int").as("count_of_disasters"), min("year").as("year"))
      .withColumn("count_of_disasters",
        when(col("disaster_date").isNull, lit(1)).otherwise(col("count_of_disasters")))
      .localCheckpoint(true)

    // A9 + S7: date range of the incoming file scopes the existing scan
    val range = perKey.agg(min("disaster_date"), max("disaster_date")).first()
    val toInsert =
      if (range.isNullAt(0)) perKey // no parseable dates → nothing to scope
      else {
        val existingKeys = existing
          .where(col("disaster_date").between(range.getDate(0), range.getDate(1)))
          .select("disaster_date", "province_id", "district_id")
        // J6: keep only keys not already present
        perKey.join(existingKeys,
          Seq("disaster_date", "province_id", "district_id"), "left_anti")
      }

    toInsert.select(col("disaster_date"), col("year"), col("province_id"),
      col("district_id"), col("count_of_disasters"))
  }
}
