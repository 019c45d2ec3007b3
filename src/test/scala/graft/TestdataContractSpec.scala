package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the TESTDATA CONTRACT the engine promises its consumers: the
  * driver has regenerated `/root/testdata` between rounds with a
  * different parquet timestamp flavor (r4: TIMESTAMP(NANOS); r6:
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ), and
  * `Tables.events` must normalize EVERY flavor it has ever shipped to
  * one stable µs `TimestampType` with the same epoch values — the r6
  * breakage was exactly this promise silently narrowing to one flavor.
  * Fixtures are written per-flavor here, so the spec keeps passing (or
  * honestly failing) no matter which flavor the live testdata has.
  */
class TestdataContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // one event row-set rendered in all three storage flavors; epochs in
  // µs (UTC wall clock). Two users, clicks after purchases, so the
  // as-of round-trip has matches and a null.
  private val rows = Seq(
    (1L, 1704067200000000L, 10L, "purchase", 5.0, "{}"),
    (2L, 1704070800000000L, 10L, "click", 1.0, "{}"),
    (3L, 1704074400000123L, 10L, "click", 2.0, "{}"),
    (4L, 1704067100000000L, 20L, "click", 3.0, "{}"), // pre-purchase → null
    (5L, 1704067300000000L, 20L, "purchase", 7.5, "{}"),
    (6L, 1704153600000000L, 20L, "click", 4.0, "{}"))

  /** Writes `events.parquet` under a fresh dir in the given ts flavor
    * and returns the dir (a drop-in `sfDir` for events-only queries). */
  private def fixture(flavor: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-ev-$flavor").toString
    val base = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val ts = flavor match {
      case "nanos-as-long" => (col("ts_us") * 1000L).cast(LongType)
      case "micros-ntz"    => timestamp_micros(col("ts_us")).cast(TimestampNTZType)
      case "micros-ltz"    => timestamp_micros(col("ts_us"))
    }
    base.select(col("event_id"), ts.as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val flavors = Seq("nanos-as-long", "micros-ntz", "micros-ltz")

  test("Tables.events normalizes every storage flavor to µs TimestampType") {
    for (f <- flavors) {
      val ev = Tables.events(spark, fixture(f))
      assert(ev.schema("ts").dataType == TimestampType,
        s"$f: ts read back as ${ev.schema("ts").dataType}")
      val got = ev.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = rows.map(r => (r._1, r._2)).toMap
      assert(got == want, s"$f: epochs shifted under normalization")
    }
  }

  test("q_asof_join and q_window_tumbling round-trip every flavor identically") {
    for (q <- Seq("q_asof_join", "q_window_tumbling")) {
      val results = flavors.map { f =>
        f -> SparkEntry.queries(q)(spark, fixture(f)).collect().toSeq
      }
      val (refF, ref) = results.head
      for ((f, r) <- results.tail)
        assert(r == ref, s"$q: $f result differs from $refF")
      assert(ref.nonEmpty, s"$q returned no rows on the fixture")
    }
  }

  test("live testdata: every table readable, events normalized, core columns present") {
    for (n <- Tables.names)
      assert(Tables.t(spark, sfDir, n).schema.nonEmpty, s"$n unreadable")
    assert(Tables.events(spark, sfDir).schema("ts").dataType == TimestampType)
    val doc = Tables.documents(spark, sfDir).schema.fieldNames.toSet
    assert(Set("doc_id", "text").subsetOf(doc), s"documents columns drifted: $doc")
    val emb = Tables.embeddings(spark, sfDir).schema.fieldNames.toSet
    assert(emb.exists(_.contains("emb")) || emb.contains("vec"),
      s"embeddings columns drifted: $emb")
  }
}
