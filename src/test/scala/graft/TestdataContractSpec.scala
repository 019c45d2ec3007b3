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

  /** REAL TIMESTAMP(NANOS) storage — the r4-era generator flavor, which
    * Spark cannot write itself; pyarrow-written once and committed as a
    * test resource (see FIXTURES.md §events-nanos; same six rows). */
  private val nanosDir =
    new java.io.File("src/test/resources/events-nanos").getAbsolutePath

  test("Tables.events normalizes every storage flavor to µs TimestampType") {
    for ((f, dir) <- flavors.map(f => f -> fixture(f)) :+ ("nanos-real" -> nanosDir)) {
      val ev = Tables.events(spark, dir)
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

  test("nanos storage errors HELPFULLY without the conf; other flavors owe nothing") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      // real NANOS storage: the raw read fails, and the loader wraps it
      // with the fix instead of repairing the session silently
      val e = intercept[IllegalArgumentException] {
        Tables.events(spark, nanosDir).collect()
      }
      assert(e.getMessage.contains("nanosAsLong"),
        "the error must name the conf the caller has to set")
      assert(spark.conf.get(key) == "false",
        "the loader must not set the conf behind the caller's back")
      // NTZ/LTZ flavors never needed the conf — they must still load
      for (f <- Seq("micros-ntz", "micros-ltz"))
        assert(Tables.events(spark, fixture(f)).schema("ts").dataType == TimestampType,
          s"$f must load without the nanos conf")
    } finally spark.conf.set(key, prev)
  }

  test("events loads correct epochs on a NON-UTC session and mutates no session state") {
    // fixtures authored first, under the suite's UTC zone — NTZ fixture
    // *authoring* (LTZ→NTZ cast) is zone-sensitive by Spark semantics,
    // and the contract under test is the *loader*, not the generator
    val dirs = flavors.map(f => f -> fixture(f))
    val zoneKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(zoneKey)
    try {
      spark.conf.set(zoneKey, "Asia/Bangkok")
      // an unrelated timestamp literal whose epoch DEPENDS on the zone:
      // if Tables.events flipped the session to UTC (the old side
      // effect), this value would silently shift by the zone offset
      def probe(): Long = spark.sql(
        "SELECT unix_micros(timestamp'2024-01-01 00:00:00')").head().getLong(0)
      val before = probe()
      for ((f, dir) <- dirs) {
        val ev = Tables.events(spark, dir)
        assert(ev.schema("ts").dataType == TimestampType, s"$f on non-UTC session")
        val got = ev.select(col("event_id"), unix_micros(col("ts")))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == rows.map(r => (r._1, r._2)).toMap,
          s"$f: epochs shifted when loaded under a non-UTC session zone")
        assert(spark.conf.get(zoneKey) == "Asia/Bangkok",
          s"$f: Tables.events mutated the session time zone")
      }
      assert(probe() == before,
        "loading events changed the interpretation of other timestamps in the session")
    } finally spark.conf.set(zoneKey, prev)
  }

  // The full testdata contract, one entry per Tables.names row, so ANY
  // future regeneration drift (the r4→r6 flavor flip that caused a
  // two-round blind spot) fails ONE named assertion naming the table
  // and column. Types are `DataType.simpleString`s. Timestamp columns
  // are the generator's proven drift axis (r4 TIMESTAMP(NANOS) → r6
  // NTZ), and every loader/query handles both instant and naive-UTC
  // flavors, so those pin to the handled SET via the "ts-flavor"
  // sentinel; everything else pins exact. `events` pins its
  // POST-NORMALIZATION schema (Tables.events): `ts` must come back as
  // exactly `timestamp` whatever the storage flavor.
  private val schemaContract: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "ts-flavor", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "ts-flavor"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  private val tsFlavors = Set("timestamp", "timestamp_ntz")

  test("all 10 tables match the pinned schema contract (drift names table+column)") {
    assert(schemaContract.keySet == Tables.names.toSet,
      "schemaContract out of sync with Tables.names")
    for (n <- Tables.names) {
      val want = schemaContract(n)
      val df = if (n == "events") Tables.events(spark, sfDir)
               else Tables.t(spark, sfDir, n)
      val got = df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)
      assert(got.map(_._1) == want.map(_._1),
        s"table $n: columns drifted — got ${got.map(_._1).mkString(",")} " +
          s"want ${want.map(_._1).mkString(",")}")
      for (((gName, gType), (_, wType)) <- got.zip(want))
        if (wType == "ts-flavor")
          assert(tsFlavors(gType),
            s"table $n column $gName: unhandled timestamp flavor $gType " +
              s"(handled: ${tsFlavors.mkString("/")})")
        else
          assert(gType == wType,
            s"table $n column $gName: type drifted got=$gType want=$wType")
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
