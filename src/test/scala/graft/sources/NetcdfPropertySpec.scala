package graft.sources

import graft.SparkSpec
import graft.testutil.FileBuilders
import java.nio.file.Files
import scala.util.Random

/** Randomized round trip: any small grid written by the byte-level
  * builder reads back identically through NetcdfReader — pins the
  * offset arithmetic (record stride, slab layout, padding) across
  * shapes. Seeded for reproducibility (repo property-test style). */
class NetcdfPropertySpec extends SparkSpec {

  test("builder → reader round trip over random grid shapes") {
    val rnd = new Random(42)
    (1 to 25).foreach { trial =>
      val nT = 1 + rnd.nextInt(4)
      val nLat = 1 + rnd.nextInt(5)
      val nLon = 1 + rnd.nextInt(5)
      val vals = Array.fill(nT * nLat * nLon)(
        if (rnd.nextDouble() < 0.15) -9999f else rnd.nextFloat() * 50f)
      val lats = (0 until nLat).map(i => 10.0 + i * 0.25)
      val lons = (0 until nLon).map(j => 98.0 + j * 0.25)
      val precip = (0 until nT).map(t => (0 until nLat).map(i =>
        (0 until nLon).map(j => vals(t * nLat * nLon + i * nLon + j)).toSeq).toSeq)
      val path = Files.createTempFile(s"prop$trial", ".nc")
      Files.write(path, FileBuilders.nc(
        (0 until nT).map(_.toDouble), "days since 2024-01-01", lats, lons, precip))

      val nc = NetcdfReader.open(path.toString)
      assert(nc.numRecs == nT)
      val v = nc.variable("precip")
      (0 until nT).foreach { t =>
        val slab = NetcdfReader.readSlab(nc, v, t)
        (0 until nLat).foreach { i =>
          (0 until nLon).foreach { j =>
            val expect = vals(t * nLat * nLon + i * nLon + j)
            val got = slab(i * nLon + j)
            if (expect == -9999f) assert(got.isNaN, s"trial $trial ($t,$i,$j): expected fill")
            else assert(math.abs(got - expect) < 1e-6,
              s"trial $trial ($t,$i,$j): $got != $expect")
          }
        }
      }
      Files.delete(path)
    }
  }
}
