package graft.domain

import graft.SparkSpec
import java.sql.Timestamp
import scala.util.Random

/** Randomized equivalence: RainIngest vs a pure-Scala replication of
  * the reference math (weighted mean, cell area, volume, drops) on
  * seeded random grids — beyond the hand-computed cases in
  * RainIngestSpec. */
class RainPropertySpec extends SparkSpec {
  import spark.implicits._

  private val days = Seq("2023-06-01", "2023-06-02", "2023-06-03")
  private val lats = (0 until 6).map(i => 18.0 + i * 0.05)
  private val lons = (0 until 5).map(j => 98.0 + j * 0.05)

  test("random grids: Spark pipeline equals the reference math") {
    val rnd = new Random(4242)
    // cells striped across two districts of one province
    val cellMap = (for { la <- lats; lo <- lons } yield
      (la, lo, "Chiang Mai", if (lo < 98.1) "Mueang Chiang Mai" else "Fang"))
      .toDF("latitude", "longitude", "province", "district")
    val provinces = Seq((1, "เชียงใหม่", "Chiang Mai"))
      .toDF("province_id", "province_name", "province_name_en")
    val districts = Seq((11, "เมือง", "Mueang Chiang Mai", 1), (12, "ฝาง", "Fang", 1))
      .toDF("district_id", "district_name", "district_name_en", "province_id")

    val rows = for {
      d <- days; la <- lats; lo <- lons
      p = rnd.nextDouble() * 12 - 2 // some negatives/zeros to drop
    } yield (Timestamp.valueOf(s"$d 00:00:00"), la, lo, p)
    val grid = rows.toDF("time", "latitude", "longitude", "precip")

    val got = RainIngest.ingest(spark, grid, cellMap, provinces, districts, uploadId = 1L)
      .collect()
      .map(r => (r.getAs[java.sql.Date]("date").toString, r.getAs[Int]("district_id")) ->
        (r.getAs[Double]("rain_mm_wmean"), r.getAs[Double]("rainfall_mm"))).toMap

    // ---- reference math in plain Scala ----
    val kept = rows.filter(_._4 > 0)
    val dlat = lats.sorted.sliding(2).map(p => p(1) - p(0)).min
    val dlon = lons.sorted.sliding(2).map(p => p(1) - p(0)).min
    val expected = kept
      .groupBy { case (t, la, lo, _) =>
        (t.toString.take(10), if (lo < 98.1) 11 else 12)
      }
      .map { case (k, cells) =>
        val w = cells.map { case (_, la, _, _) => math.cos(math.toRadians(la)) }
        val p = cells.map(_._4)
        val wmean = p.zip(w).map { case (a, b) => a * b }.sum / w.sum
        val vol = cells.map { case (_, la, _, pr) =>
          pr * (111.32 * dlat * 111.32 * dlon * math.cos(math.toRadians(la))) * 1000.0 / 1e6
        }.sum
        k -> (wmean, vol)
      }

    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, (ew, ev)) =>
      val (gw, gv) = got(k)
      assert(math.abs(gw - ew) <= 1e-9 * math.max(1.0, math.abs(ew)), s"wmean at $k: $gw vs $ew")
      assert(math.abs(gv - ev) <= 1e-9 * math.max(1.0, math.abs(ev)), s"vol at $k: $gv vs $ev")
    }
  }
}
