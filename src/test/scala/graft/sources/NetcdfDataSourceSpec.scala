package graft.sources

import graft.SparkSpec
import graft.testutil.FileBuilders
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The DataSource V2 path: spark.read.format("netcdf") must equal the
  * driver-side readGrid, parallelize per record, and prune cells and
  * records for pushed coordinate/time predicates. */
class NetcdfDataSourceSpec extends SparkSpec {

  private val lats = Seq(18.75, 18.80, 18.85)
  private val lons = Seq(98.95, 99.00, 99.05, 99.10)
  private def day(base: Float) =
    (0 until 3).map(i => (0 until 4).map(j => base + i * 4 + j))
  private def writeNc(): String = {
    val path = Files.createTempFile("grid", ".nc")
    Files.write(path, FileBuilders.nc(
      times = Seq(0.0, 1.0, 2.0), timeUnits = "days since 2023-06-01",
      lats = lats, lons = lons,
      precip = Seq(day(1.0f), day(20.0f), day(40.0f))))
    path.toString
  }

  test("format(netcdf) equals readGrid and yields one partition per record") {
    val path = writeNc()
    val dsv2 = spark.read.format("netcdf").load(path)
    val direct = NetcdfReader.readGrid(spark, path)
    assert(dsv2.count() == 36)
    assert(dsv2.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(dsv2).count() == 0)
    assert(dsv2.rdd.getNumPartitions == 3) // one per time record
  }

  test("coordinate and time predicates prune cells and whole records") {
    val path = writeNc()
    val filtered = spark.read.format("netcdf").load(path)
      .where(col("latitude") >= 18.78 && col("latitude") <= 18.82 &&
        col("longitude") >= 99.0 && col("longitude") < 99.1 &&
        col("time") >= lit("2023-06-02").cast("timestamp"))
    // plan shows the pushed filters at the scan
    val plan = filtered.queryExecution.sparkPlan.toString
    assert(plan.contains("latitude") && plan.contains("PushedFilters") ||
      plan.contains("RuntimeFilters") || plan.contains("BatchScan"), plan)
    // 1 lat × 2 lons × 2 records survive
    assert(filtered.count() == 4)
    // record pruning happened at planning: only 2 partitions scanned
    assert(filtered.rdd.getNumPartitions == 2)
    // values correct (lat row 1, lon cols 1..2 of days 2 and 3)
    val vals = filtered.orderBy("time", "longitude")
      .select("precip").collect().map(_.getDouble(0)).toSeq
    assert(vals == Seq(25.0, 26.0, 45.0, 46.0))
  }

  test("multi-path load (Spark's 'paths' JSON option) unions the files") {
    val p1 = writeNc()
    val p2 = writeNc()
    val df = spark.read.format("netcdf").load(p1, p2)
    assert(df.count() == 72)
    assert(df.rdd.getNumPartitions == 6) // 3 records × 2 files
  }

  test("empty result when the bbox misses the grid entirely") {
    val df = spark.read.format("netcdf").load(writeNc())
      .where(col("latitude") > 30.0)
    assert(df.count() == 0)
    assert(df.rdd.getNumPartitions == 0)
  }
}
