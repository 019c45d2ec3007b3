package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("latest right row at or before each left ts, per key") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"), (3L, 9L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 18L, 200.0), (2L, 20L, 300.0))
      .toDF("k", "ts", "v")
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .orderBy("k", "ts")
      .select("k", "ts", "tag", "asof_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, 10L, "a", 100.0), // 5 ≤ 10 < 18
      (1L, 20L, "b", 200.0), // 18 is newer
      (2L, 15L, "c", null),  // right row is in the future
      (3L, 9L, "d", null)))  // no right rows for key 3
  }

  test("tie on ts matches (≤ semantics) and payload is all-or-nothing") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 7.0, "x")).toDF("k", "ts", "v", "s")
    val r = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v", "s")).head()
    assert(r.getDouble(2) == 7.0 && r.getString(3) == "x")
  }

  test("forward: earliest right row at or after each left ts, per key") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"), (3L, 9L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 18L, 200.0), (2L, 20L, 300.0))
      .toDF("k", "ts", "v")
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v"),
        forward = true)
      .orderBy("k", "ts")
      .select("k", "ts", "tag", "asof_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, 10L, "a", 200.0), // next is 18
      (1L, 20L, "b", null),  // nothing after 20
      (2L, 15L, "c", 300.0), // future row now matches
      (3L, 9L, "d", null)))
    // tie at equal ts matches inclusively (≥ semantics)
    val tie = AsofJoin.asofJoin(
      Seq((1L, 18L)).toDF("k", "ts"), right, Seq("k"), "ts", Seq("v"),
      forward = true).head()
    assert(tie.getDouble(2) == 200.0)
    // null-ts left rows stay unmatched in the FORWARD direction too
    // (desc_nulls_first — plain desc would hand them the min-ts payload)
    val nullTs = AsofJoin.asofJoin(
      Seq((Option(1L), Option.empty[Long])).toDF("k", "ts"), right,
      Seq("k"), "ts", Seq("v"), forward = true).head()
    assert(nullTs.isNullAt(2))
  }

  test("forward ≡ brute-force earliest-following-row, random data") {
    val rnd = new scala.util.Random(17)
    val right = (1L to 20L).flatMap(k =>
      rnd.shuffle((1L to 300L).toList).take(25).map(ts => (k, ts, rnd.nextDouble())))
    val left = Seq.fill(400)((rnd.nextInt(25).toLong + 1, rnd.nextInt(320).toLong, rnd.nextInt()))
    val ref = left.map { case (k, ts, tag) =>
      val m = right.filter(r => r._1 == k && r._2 >= ts)
      (k, ts, tag) -> (if (m.isEmpty) None else Some(m.minBy(_._2)._3))
    }.toMap
    val got = AsofJoin.asofJoin(
        left.toDF("k", "ts", "tag").repartition(7),
        right.toDF("k", "ts", "v").repartition(5),
        Seq("k"), "ts", Seq("v"), forward = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.length == left.length)
    got.foreach { case (key, v) => assert(v == ref(key), s"mismatch at $key") }
  }

  test("null keys/ts on the right never match; left rows survive") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((Option.empty[Long], Option(5L), 1.0),
      (Option(1L), Option.empty[Long], 2.0)).toDF("k", "ts", "v")
    val r = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v")).head()
    assert(r.isNullAt(2))
  }

  test("bucketed ≡ plain as-of, including a hot key and right-empty buckets") {
    val rnd = new scala.util.Random(3)
    // key 1 is hot: 2000 left rows, 500 right rows; keys 2..20 sparse;
    // long ts gaps guarantee many buckets with left rows but no right
    val left = (1 to 2000).map(_ => (1L, rnd.nextInt(100000).toLong, rnd.nextInt())) ++
      (1 to 200).map(_ => (rnd.nextInt(19).toLong + 2, rnd.nextInt(100000).toLong, rnd.nextInt()))
    val right = rnd.shuffle((0 until 500).map(i => (1L, i * 67L, rnd.nextDouble())) ++
      (0 until 50).map(i => ((i % 19).toLong + 2, i * 331L, rnd.nextDouble())))
    // unique (k, ts) on the right so the match is deterministic
    val l = left.toDF("k", "ts", "tag").repartition(9)
    val r = right.toDF("k", "ts", "v").repartition(4)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2),
        if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toSet
    val plain = rows(AsofJoin.asofJoin(l, r, Seq("k"), "ts", Seq("v")))
    val bucketed = rows(AsofJoin.asofJoinBucketed(l, r, Seq("k"), "ts", Seq("v"), buckets = 16))
    assert(bucketed == plain)
  }

  test("bucketed handles timestamp ts columns (unix-micros bucketing)") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, t("2024-01-01 10:00:00"), "a"), (1L, t("2024-03-01 10:00:00"), "b"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, t("2024-01-01 09:00:00"), 1.0), (1L, t("2024-02-15 00:00:00"), 2.0))
      .toDF("k", "ts", "v")
    val got = AsofJoin.asofJoinBucketed(left, right, Seq("k"), "ts", Seq("v"), buckets = 8)
      .orderBy("ts").select("tag", "asof_v")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("a", 1.0), ("b", 2.0)))
  }

  test("one shuffle: the plan has a single Exchange below the window") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "ts", "v")
    val plan = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    // union feeds one hashpartitioning exchange; no join operator at all
    assert(!plan.contains("Join"), "as-of should not plan a join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one key shuffle, got $exchanges:\n$plan")
  }

  test("portable SQL oracle formulation matches the operator bit-for-bit") {
    // the env-swappable DuckDB fallback (GRAFT_ASOF_ORACLE=portable) is
    // plain ANSI SQL; run it in Spark over the registered views (only
    // the epoch function name differs between dialects) and pin it
    // against qAsofJoin — if either formulation drifts, this fails
    val sfDir = "/root/testdata/sf0.001"
    graft.Tables.registerViews(spark, sfDir)
    val sql = graft.queries.PipelineQueries.asofOraclePortable
      .replace("epoch_us(", "unix_micros(")
    val oracle = spark.sql(sql).collect().toSeq
    val engine = graft.SparkEntry.queries("q_asof_join")(spark, sfDir)
      .collect().toSeq
    assert(engine.nonEmpty, "no as-of rows at sf0.001 — vacuous pin")
    assert(oracle == engine,
      s"portable oracle (${oracle.size} rows) != operator (${engine.size} rows)")
  }

  test("inputs carrying a reserved internal column name fail loudly") {
    val left = Seq((1L, 10L, "x")).toDF("k", "ts", "__p")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
    }
    assert(e.getMessage.contains("__p"))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.asofJoinBucketed(left.withColumnRenamed("__p", "__b"), right,
        Seq("k"), "ts", Seq("v"))
    }
    assert(e2.getMessage.contains("__b"))
  }
}
