package graft.sources

import graft.SparkSpec
import graft.domain.RainIngest
import graft.testutil.FileBuilders
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Round-trip: synthetic classic `.nc` bytes → NetcdfReader.readGrid →
  * long-form grid → RainIngest — the repo's own flatten tool replacing
  * the "pre-flattened parquet arrives" assumption (SURVEY §7.3). */
class NetcdfReaderSpec extends SparkSpec {
  import spark.implicits._

  // 2 days × 2 lats × 3 lons, one fill value on day 2
  private val lats = Seq(18.75, 18.80)
  private val lons = Seq(98.95, 99.00, 99.05)
  private val day1 = Seq(Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))
  private val day2 = Seq(Seq(7.0f, -9999f, 9.0f), Seq(10.0f, 11.0f, 12.0f))

  private def writeNc(): String = {
    val path = Files.createTempFile("chirps", ".nc")
    Files.write(path, FileBuilders.nc(
      times = Seq(0.0, 1.0), timeUnits = "days since 2023-06-01",
      lats = lats, lons = lons, precip = Seq(day1, day2)))
    path.toString
  }

  test("readGrid: flattens records, decodes CF time, nulls fill values") {
    val grid = NetcdfReader.readGrid(spark, writeNc())
    assert(grid.count() == 12)
    assert(grid.where(col("precip").isNull).count() == 1)
    val r = grid.where(col("latitude") === 18.75 && col("longitude") === 99.05 &&
      col("time") === java.sql.Timestamp.valueOf("2023-06-02 00:00:00")).head()
    assert(math.abs(r.getAs[Double]("precip") - 9.0) < 1e-6)
    val days = grid.select(date_format(col("time"), "yyyy-MM-dd")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(days.toSeq == Seq("2023-06-01", "2023-06-02"))
  }

  test("nc → RainIngest end-to-end (the reference's upload path from raw bytes)") {
    val grid = NetcdfReader.readGrid(spark, writeNc())
    val cellMap = lats.flatMap(la => lons.map(lo =>
      (la, lo, "Chiang Mai", "Mueang Chiang Mai")))
      .toDF("latitude", "longitude", "province", "district")
    val provinces = Seq((1, "เชียงใหม่", "Chiang Mai")).toDF("province_id", "province_name", "province_name_en")
    val districts = Seq((101, "เมืองเชียงใหม่", "Mueang Chiang Mai", 1))
      .toDF("district_id", "district_name", "district_name_en", "province_id")
    val out = RainIngest.ingest(spark, grid, cellMap, provinces, districts, uploadId = 1L)
      .orderBy("date").collect()
    assert(out.length == 2) // one district-day row per day
    // day-1 weighted mean: all six cells positive, weights ≈ equal
    val w1 = out(0).getAs[Double]("rain_mm_wmean")
    assert(w1 > 1.0 && w1 < 6.0)
    // day-2 mean skips the fill-value cell (null → dropped by P4)
    val w2 = out(1).getAs[Double]("rain_mm_wmean")
    assert(w2 > 7.0 && w2 < 12.0)
  }

  test("HDF5-backed NetCDF-4 is detected by signature and rejected with the conversion recipe") {
    // decision record (round 4): HDF5 read path stays out of scope —
    // this environment has no independent HDF5 writer or reference
    // decoder, so a parser could only be tested against itself. The
    // contract is: specific detection + an actionable message.
    val hdf5Sig = Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val f = java.nio.file.Files.createTempFile("fake-nc4", ".nc")
    java.nio.file.Files.write(f, hdf5Sig ++ new Array[Byte](64))
    val e = intercept[IllegalArgumentException](NetcdfReader.open(f.toString))
    assert(e.getMessage.contains("NetCDF-4/HDF5"), e.getMessage)
    assert(e.getMessage.contains("nccopy -k classic"), e.getMessage)
    java.nio.file.Files.delete(f)
    // non-HDF5 garbage still gets the generic classic-format rejection
    val g = java.nio.file.Files.createTempFile("not-nc", ".nc")
    java.nio.file.Files.write(g, "garbage".getBytes ++ new Array[Byte](64))
    val e2 = intercept[IllegalArgumentException](NetcdfReader.open(g.toString))
    assert(e2.getMessage.contains("not a classic NetCDF file"), e2.getMessage)
    java.nio.file.Files.delete(g)
  }

  test("decodeTime handles hours-since with explicit clock time") {
    val ts = NetcdfReader.decodeTime(Array(0.0, 25.0), "hours since 2000-01-01 06:00")
    assert(ts(0).toString == "2000-01-01 06:00:00.0")
    assert(ts(1).toString == "2000-01-02 07:00:00.0")
  }

  test("decodeTime does not mistake milliseconds for seconds") {
    val ts = NetcdfReader.decodeTime(Array(86400000.0), "milliseconds since 2000-01-01")
    assert(ts(0).toString == "2000-01-02 00:00:00.0") // 1 day, not 1000 days
  }
}
