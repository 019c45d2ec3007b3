package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NetCDF rainfall grid → per-(day, district) rain aggregates
  * (SURVEY.md §3.2; reference `backend/app/utils.py:36-182`).
  *
  * The grid arrives as long-form rows `(time, latitude, longitude,
  * precip)` (the NetCDF flatten is staged-ingest I/O, not query
  * semantics — SURVEY §7.3). The point-in-polygon spatial join is
  * modeled as data: a broadcastable `(latitude, longitude) →
  * (province, district)` cell map, exact for fixed-resolution grids.
  *
  * Scale notes: one shuffle total (the groupBy on (time, province,
  * district)); the cell map and both dims broadcast; the weighted mean
  * and volume aggregate in a single pass (the reference's separate
  * wmean/sum frames + merge collapse into one `agg` — behavior
  * identical, J4 eliminated). At 100 TB the grid scan partitions by
  * file/rowgroup and the bbox + positivity predicates push to parquet.
  */
object RainIngest {

  /** Thailand bbox (utils.py:69-71). */
  val LatMin = 5.6; val LatMax = 20.5
  val LonMin = 97.3; val LonMax = 105.7

  /** Default northern-province scope (utils.py:84-85). */
  val NorthProvsEn: Seq[String] = Seq(
    "Chiang Mai", "Chiang Rai", "Lamphun", "Lampang", "Phayao",
    "Phrae", "Nan", "Mae Hong Son", "Uttaradit")

  val KmPerDeg = 111.32

  /** S2: wrap longitudes >180 into [-180, 180) — applied only when the
    * grid actually uses 0–360 coordinates, as the reference does. */
  def wrapLongitudes(grid: DataFrame): DataFrame = {
    val maxLon = grid.agg(max("longitude")).first().getDouble(0)
    if (maxLon > 180.0)
      grid.withColumn("longitude", ((col("longitude") + 180.0) % 360.0) - 180.0)
    else grid
  }

  /** Grid resolution = min abs diff of sorted distinct coordinate
    * values (utils.py:113-114). Both axes resolve in ONE distributed
    * job (`collect_set` aggregates partial per partition); the
    * distinct coordinate sets are grid-resolution-sized (~10²-10³
    * values even on a global 0.05° grid), so the driver-side sort is
    * trivial and the subtraction math is bit-identical to the
    * distributed lag formulation. */
  private def minSteps(df: DataFrame): (Double, Double) = {
    val r = df.agg(collect_set("latitude"), collect_set("longitude")).first()
    def step(vals: Seq[Double], name: String): Double = {
      val sorted = vals.sorted
      require(sorted.length >= 2,
        s"cannot infer grid resolution: fewer than two distinct '$name' values among matched cells")
      sorted.sliding(2).map(p => math.abs(p(1) - p(0))).min
    }
    (step(r.getSeq[Double](0), "latitude"), step(r.getSeq[Double](1), "longitude"))
  }

  /** Full ingest: grid rows → `rain_points`-shaped rows (unwritten).
    *
    * @param grid     long-form rainfall grid (Schemas.rainGrid)
    * @param cellMap  (latitude, longitude, province, district) —
    *                 ADM2 assignment of each grid cell, northern scope
    * @param provinces,districts dimension tables (Schemas.province/district)
    */
  def ingest(
      spark: SparkSession,
      grid: DataFrame,
      cellMap: DataFrame,
      provinces: DataFrame,
      districts: DataFrame,
      uploadId: Long,
      northProvsEn: Seq[String] = NorthProvsEn): DataFrame = {

    // §2.1 S2 + §2.3 P3/P4: wrap, bbox-clip, keep positive cells.
    // wrapLongitudes' max-lon probe is the only pass over the raw grid
    // besides the aggregation itself, and it is column-pruned to
    // `longitude` alone.
    val clipped = wrapLongitudes(grid)
      .where(col("latitude").between(LatMin, LatMax) &&
        col("longitude").between(LonMin, LonMax))
      .where(col("precip").isNotNull && col("precip") > 0)

    // §2.4 J3 as an equi-join against the broadcast cell map (inner,
    // like sjoin within), scoped to the northern provinces (P5).
    // Persisted: the resolution probe below and the aggregation both
    // consume it, and without the cache each action re-runs the whole
    // grid lineage (the round-1 bench's 3× recompute). The clipped
    // northern subset is a tiny fraction of a global grid, so the
    // cache is bounded even at full CHIRPS scale.
    val mapped = clipped.join(
      broadcast(cellMap.where(col("province").isin(northProvsEn: _*))),
      Seq("latitude", "longitude"), "inner")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val daily = try {
      // §2.5 A5: grid resolution, inferred from the MATCHED points (the
      // reference derives it from the post-sjoin frame, utils.py:113-114).
      // This action populates the cache.
      val (dlat, dlon) = minSteps(mapped)

      // §2.9 F8: cosine weight + cell area + volume (million m³)
      val withMeasures = mapped
        .withColumn("weight", cos(radians(col("latitude"))))
        .withColumn("cell_area_km2",
          lit(KmPerDeg * dlat * KmPerDeg * dlon) * cos(radians(col("latitude"))))
        .withColumn("rainfall_mm", col("precip") * col("cell_area_km2") * 1000.0 / 1e6)

      // §2.5 A3+A4 in ONE pass (precip>0 already enforced ⇒ identical to
      // the reference's two filtered groupbys + left merge). Materialized
      // eagerly (one row per district-day — KB-to-MB scale) so the grid
      // cache can be dropped before returning the lazy tail of the plan.
      withMeasures
        .groupBy(col("time"), col("province"), col("district"))
        .agg(
          (sum(col("precip") * col("weight")) / sum(col("weight"))).as("rain_mm_wmean"),
          sum(col("rainfall_mm")).as("rainfall_mm"))
        .localCheckpoint(true)
    } finally mapped.unpersist()

    // §2.4 J5: cleaned-English-key dim resolution, then P6 null-key drop
    val provKeyed = provinces
      .select(col("province_id"), TextNorm.cleanText(col("province_name_en")).as("prov_key"))
    val distKeyed = districts
      .select(col("district_id"), col("province_id"),
        TextNorm.cleanText(col("district_name_en")).as("dist_key"))

    val resolved = daily
      .withColumn("prov_key", TextNorm.cleanText(col("province")))
      .withColumn("dist_key", TextNorm.cleanText(col("district")))
      .join(broadcast(provKeyed), Seq("prov_key"), "left")
      .join(broadcast(distKeyed), Seq("province_id", "dist_key"), "left")
      .na.drop(Seq("province_id", "district_id"))

    // shape to the rain_points schema (F6/F10)
    resolved
      .withColumn("upload_id", lit(uploadId))
      .withColumn("date", to_date(col("time")))
      .withColumn("year", year(col("time")))
      .select(
        col("upload_id"),
        col("date"),
        col("year").cast("int"),
        col("province_id").cast("int"),
        col("district_id").cast("int"),
        col("rain_mm_wmean").cast("double"),
        coalesce(col("rainfall_mm"), lit(0.0)).cast("double").as("rainfall_mm"))
  }
}
