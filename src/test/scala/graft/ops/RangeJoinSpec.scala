package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("every containing interval matches; inclusive bounds; inner semantics") {
    val pts = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"), (3L, 1L, "d"))
      .toDF("k", "pt", "tag")
    val ivs = Seq(
      (1L, 0L, 10L, "w1"),   // contains a (pt=10, end-inclusive)
      (1L, 10L, 30L, "w2"),  // contains a (start-inclusive) AND b
      (1L, 26L, 40L, "w3"),  // contains nothing
      (2L, 0L, 100L, "w4"))  // contains c; key 3 has no interval
      .toDF("k", "s", "e", "w")
    val got = RangeJoin.rangeJoin(pts, ivs, Seq("k"), "pt", "s", "e", Seq("w"))
      .select("k", "pt", "tag", "rj_w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      (1L, 10L, "a", "w1"), (1L, 10L, "a", "w2"),
      (1L, 25L, "b", "w2"),
      (2L, 5L, "c", "w4")))
  }

  test("null keys/points/bounds and inverted intervals never match") {
    val pts = Seq((Option(1L), Option(10L)), (Option.empty[Long], Option(10L)),
      (Option(1L), Option.empty[Long])).toDF("k", "pt")
    val ivs = Seq(
      (Option(1L), Option(0L), Option(20L), "ok"),
      (Option(1L), Option(20L), Option(0L), "inverted"),
      (Option(1L), Option.empty[Long], Option(20L), "null-start"),
      (Option.empty[Long], Option(0L), Option(20L), "null-key"))
      .toDF("k", "s", "e", "w")
    val got = RangeJoin.rangeJoin(pts, ivs, Seq("k"), "pt", "s", "e", Seq("w"))
      .select("rj_w").as[String].collect().toSeq
    assert(got == Seq("ok"))
  }

  test("bucketed plan ≡ naive theta join, any width, incl. negative axis") {
    val rnd = new scala.util.Random(7)
    // hot key 1 plus sparse keys; points and intervals straddle zero so
    // the floor-division bucketing is exercised on negatives
    val pts = (1 to 800).map(_ => (1L, rnd.nextInt(2000).toLong - 1000L)) ++
      (1 to 200).map(_ => (rnd.nextInt(9).toLong + 2, rnd.nextInt(2000).toLong - 1000L))
    val ivs = (1 to 300).map { i =>
      val s = rnd.nextInt(2000).toLong - 1000L
      (if (i % 4 == 0) (i % 9).toLong + 2 else 1L, s, s + rnd.nextInt(120).toLong, i)
    }
    val l = pts.toDF("k", "pt").repartition(7)
    val r = ivs.toDF("k", "s", "e", "id").repartition(5)
    val naive = l.join(r, l("k") === r("k") && l("pt") >= r("s") && l("pt") <= r("e"))
      .select(l("k"), col("pt"), col("id"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    for (w <- Seq(-1L, 7L, 1000L)) {
      val got = RangeJoin.rangeJoin(l, r, Seq("k"), "pt", "s", "e", Seq("id"),
          bucketWidth = w)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      assert(got == naive, s"width=$w")
    }
  }

  test("timestamp point/bounds compare on micros") {
    val pts = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00")))
      .toDF("k", "pt")
    val ivs = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "hit"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 11:00:01"),
        java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "miss"))
      .toDF("k", "s", "e", "w")
    val got = RangeJoin.rangeJoin(pts, ivs, Seq("k"), "pt", "s", "e", Seq("w"))
      .select("rj_w").as[String].collect().toSeq
    assert(got == Seq("hit"))
  }

  test("empty right side yields empty result with the output schema") {
    val pts = Seq((1L, 10L)).toDF("k", "pt")
    val ivs = Seq.empty[(Long, Long, Long, String)].toDF("k", "s", "e", "w")
    val out = RangeJoin.rangeJoin(pts, ivs, Seq("k"), "pt", "s", "e", Seq("w"))
    assert(out.columns.toSeq == Seq("k", "pt", "rj_w") && out.count() == 0)
  }

  test("too-fine caller width fails loudly instead of exploding") {
    // the guard is executor-side (a per-row check inside the expansion
    // projection — no driver pre-agg), so it surfaces at action time
    val pts = Seq((1L, 10L)).toDF("k", "pt")
    val ivs = Seq((1L, 0L, 10_000_000L, "wide")).toDF("k", "s", "e", "w")
    val e = intercept[Exception] {
      RangeJoin.rangeJoin(pts, ivs, Seq("k"), "pt", "s", "e", Seq("w"),
        bucketWidth = 2L).count()
    }
    assert(causeMessages(e).exists(_.contains("buckets")), causeMessages(e).mkString("; "))
  }

  private def causeMessages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .flatMap(x => Option(x.getMessage)).toSeq

  test("fractional point/bound columns rejected (silent truncation would mis-match)") {
    // 10.7 in [10.8, 11.2]? NO — but cast("long") truncation would say
    // 10 in [10, 11] = yes; the operator must refuse instead
    val pts = Seq((1L, 10.7)).toDF("k", "pt")
    val ivs = Seq((1L, 10.8, 11.2, "w")).toDF("k", "s", "e", "w")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(pts, ivs, Seq("k"), "pt", "s", "e", Seq("w"))
    }
    assert(e1.getMessage.contains("fractional"))
    val ivsDec = Seq((1L, BigDecimal("10.80"), BigDecimal("11.20"), "w"))
      .toDF("k", "s", "e", "w")
    val ptsOk = Seq((1L, 10L)).toDF("k", "pt")
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(ptsOk, ivsDec, Seq("k"), "pt", "s", "e", Seq("w"))
    }
    assert(e2.getMessage.contains("truncated"))
    // scale-0 decimal is integral — allowed
    val ivsDec0 = Seq((1L, 5L, 15L, "w")).toDF("k", "s", "e", "w")
      .select(col("k"), col("s").cast("decimal(20,0)").as("s"),
        col("e").cast("decimal(20,0)").as("e"), col("w"))
    assert(RangeJoin.rangeJoin(ptsOk, ivsDec0, Seq("k"), "pt", "s", "e", Seq("w"))
      .count() == 1L)
  }

  test("bucketing exact beyond 2^53: nanosecond-epoch magnitudes don't mis-bucket") {
    // double division is exact only below 2^53 ≈ 9.0e15; these are ~1.7e18
    val base = 1700000000000000000L
    val pts = Seq((1L, base + 123L), (1L, base + 999999L)).toDF("k", "pt")
    val ivs = Seq((1L, base, base + 500L, "w1"), (1L, base + 900000L, base + 1000000L, "w2"))
      .toDF("k", "s", "e", "w")
    // a fine caller width forces many high-magnitude bucket ids where
    // double rounding would land point and interval in different buckets
    val got = RangeJoin.rangeJoin(pts, ivs, Seq("k"), "pt", "s", "e", Seq("w"),
        bucketWidth = 1000L)
      .select("pt", "rj_w").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((base + 123L, "w1"), (base + 999999L, "w2")))
    // and the negative extreme: floor (not truncate-toward-zero) semantics
    val nPts = Seq((1L, -base)).toDF("k", "pt")
    val nIvs = Seq((1L, -base - 10L, -base + 10L, "n")).toDF("k", "s", "e", "w")
    assert(RangeJoin.rangeJoin(nPts, nIvs, Seq("k"), "pt", "s", "e", Seq("w"),
      bucketWidth = 7L).count() == 1L)
  }

  test("output-name clash with the left side fails loudly") {
    val pts = Seq((1L, 10L, "x")).toDF("k", "pt", "rj_w")
    val ivs = Seq((1L, 0L, 20L, "y")).toDF("k", "s", "e", "w")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(pts, ivs, Seq("k"), "pt", "s", "e", Seq("w"))
    }
    assert(e.getMessage.contains("prefix"))
  }

  test("intervals: overlap semantics, touching endpoints, exactly-once") {
    val l = Seq((1L, 0L, 10L, "a"), (1L, 20L, 30L, "b"), (2L, 0L, 5L, "c"))
      .toDF("k", "ls", "le", "tag")
    val r = Seq(
      (1L, 10L, 20L, "w1"),  // touches a at 10 AND b at 20 (inclusive)
      (1L, 5L, 40L, "w2"),   // spans both a and b entirely
      (1L, 31L, 50L, "w3"),  // overlaps nothing
      (2L, 6L, 9L, "w4"))    // just past c
      .toDF("k", "s", "e", "w")
    val rows = RangeJoin.rangeJoinIntervals(l, r, Seq("k"),
        "ls", "le", "s", "e", Seq("w"))
      .select("k", "tag", "rj_w")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSeq
    // exactly-once: Seq equality (not Set) catches duplicate emission
    assert(rows.sorted == Seq(
      (1L, "a", "w1"), (1L, "a", "w2"),
      (1L, "b", "w1"), (1L, "b", "w2")).sorted)
  }

  test("intervals: bucketed ≡ naive theta, any width, zero-length intervals") {
    val rnd = new scala.util.Random(11)
    val ls = (1 to 500).map { i =>
      val s = rnd.nextInt(2000).toLong - 1000L
      (if (i % 3 == 0) 2L else 1L, s, s + rnd.nextInt(80).toLong, i)
    }
    // quarter of right intervals are points (s == e)
    val rs = (1 to 300).map { i =>
      val s = rnd.nextInt(2000).toLong - 1000L
      (if (i % 4 == 0) 2L else 1L, s, if (i % 4 == 1) s else s + rnd.nextInt(200).toLong, i)
    }
    val l = ls.toDF("k", "ls", "le", "lid").repartition(6)
    val r = rs.toDF("k", "s", "e", "rid").repartition(4)
    val naive = l.join(r, l("k") === r("k") && l("ls") <= r("e") && r("s") <= l("le"))
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getInt(0), x.getInt(1))).toSeq.sorted
    for (w <- Seq(-1L, 13L, 5000L)) {
      val got = RangeJoin.rangeJoinIntervals(l, r, Seq("k"),
          "ls", "le", "s", "e", Seq("rid"), bucketWidth = w)
        .select(col("lid"), col("rj_rid"))
        .collect().map(x => (x.getInt(0), x.getInt(1))).toSeq.sorted
      assert(got == naive, s"width=$w")
    }
  }

  test("intervals: null/inverted rows never match; caller width guarded") {
    val l = Seq((Option(1L), Option(0L), Option(10L)),
      (Option(1L), Option(10L), Option(0L)),       // inverted left
      (Option.empty[Long], Option(0L), Option(10L)))
      .toDF("k", "ls", "le")
    val r = Seq((Option(1L), Option(5L), Option(15L), "ok"),
      (Option(1L), Option.empty[Long], Option(15L), "null-start"))
      .toDF("k", "s", "e", "w")
    val got = RangeJoin.rangeJoinIntervals(l, r, Seq("k"),
        "ls", "le", "s", "e", Seq("w"))
      .select("rj_w").as[String].collect().toSeq
    assert(got == Seq("ok"))
    val wide = Seq((1L, 0L, 10_000_000L, "wide")).toDF("k", "s", "e", "w")
    val err = intercept[Exception] {
      RangeJoin.rangeJoinIntervals(l, wide, Seq("k"),
        "ls", "le", "s", "e", Seq("w"), bucketWidth = 2L).count()
    }
    assert(causeMessages(err).exists(_.contains("buckets")))
  }

  test("plan equi-joins on (key, bucket) — no nested-loop fallback") {
    val pts = Seq((1L, 10L)).toDF("k", "pt")
    val ivs = Seq((1L, 0L, 20L, "y")).toDF("k", "s", "e", "w")
    val plan = RangeJoin.rangeJoin(pts, ivs, Seq("k"), "pt", "s", "e", Seq("w"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
  }
}
