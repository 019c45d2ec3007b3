package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized invariant tests for the corpus-prep operators, seeded for
  * reproducibility, each checked against a driver-side reference
  * implementation in one DataFrame pass.
  */
class PipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin ≡ brute-force latest-preceding-row, random data") {
    val rnd = new Random(11)
    // unique (k, ts) on the right so the match is well-defined
    val right = rnd.shuffle((1L to 40L).flatMap(k =>
      rnd.shuffle((1L to 200L).toList).take(30).map(ts => (k, ts, rnd.nextDouble()))))
    val left = Seq.fill(600)((rnd.nextInt(50).toLong + 1, rnd.nextInt(220).toLong, rnd.nextInt()))
    val ref: Map[(Long, Long, Int), Option[Double]] = left.map { case (k, ts, tag) =>
      val m = right.filter(r => r._1 == k && r._2 <= ts)
      (k, ts, tag) -> (if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
    }.toMap
    val got = AsofJoin.asofJoin(
        left.toDF("k", "ts", "tag").repartition(7),
        right.toDF("k", "ts", "v").repartition(5),
        Seq("k"), "ts", Seq("v"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.length == left.length)
    got.foreach { case (key, v) => assert(v == ref(key), s"mismatch at $key") }
  }

  test("assignWindows ≡ naive global window over random sizes and budgets") {
    val rnd = new Random(23)
    for (trial <- 1 to 3) {
      val n = 200 + rnd.nextInt(400)
      val budget = 50L + rnd.nextInt(500)
      val docs = (1 to n).map(i => (i.toLong, rnd.nextInt(120).toLong + 1))
      val df = docs.toDF("id", "n_tok").repartition(1 + rnd.nextInt(8))
      val fast = Packing.assignWindows(df, "id", "n_tok", budget, numPartitions = 1 + rnd.nextInt(6))
        .select("id", "tokens_before", "window_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      var acc = 0L
      val ref = docs.map { case (id, t) =>
        val before = acc; acc += t; (id, before, before / budget)
      }
      assert(fast.toSeq == ref, s"trial $trial (n=$n budget=$budget)")
    }
  }

  test("upsampleByWeight: output count = Σ per-row copies, computed independently") {
    val rnd = new Random(31)
    val rows = (1 to 800).map(i => (i.toLong, s"text $i ${rnd.nextInt()}", rnd.nextInt(7) * 0.5))
    val df = rows.toDF("id", "text", "w")
    def bucket(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).take(4)
      val hex = md.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 1000
    }
    val expected = rows.map { case (_, text, w) =>
      val frac = math.round((w - math.floor(w)) * 1000)
      math.floor(w).toLong + (if (bucket(text) < frac) 1L else 0L)
    }.sum
    val got = Sampling.upsampleByWeight(df, col("w"), col("text")).count()
    assert(got == expected)
  }

  test("stratifiedSample keep-set is independent of partitioning and plan shape") {
    val rnd = new Random(47)
    val rows = (1 to 1500).map(i => (i.toLong, s"doc ${rnd.nextLong()}", Seq("a", "b", "c")(i % 3)))
    val rates = Map("a" -> 300, "b" -> 800)
    def keys(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSample(df, col("s"), col("text"), rates, defaultPermille = 50)
        .select("id").as[Long].collect().toSet
    val base = keys(rows.toDF("id", "text", "s"))
    val shuffled = keys(rnd.shuffle(rows).toDF("id", "text", "s").repartition(13))
    assert(base == shuffled && base.nonEmpty)
  }

  test("rangeJoin / rangeJoinIntervals ≡ brute force over random trials") {
    val rnd = new Random(31)
    for (trial <- 1 to 3) {
      // random keys, spans straddling zero, random width incl. auto;
      // interval lengths mix zero-length points and long spans
      val nKeys = 1 + rnd.nextInt(6)
      val pts = Seq.fill(150 + rnd.nextInt(200))(
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(3000).toLong - 1500L))
      val ivs = Seq.fill(80 + rnd.nextInt(120)) {
        val s = rnd.nextInt(3000).toLong - 1500L
        (rnd.nextInt(nKeys).toLong, s,
          s + (if (rnd.nextBoolean()) 0L else rnd.nextInt(400).toLong), rnd.nextInt())
      }
      val width = Seq(-1L, 1L + rnd.nextInt(50), 10000L)(rnd.nextInt(3))
      val l = pts.toDF("k", "pt").repartition(1 + rnd.nextInt(8))
      val r = ivs.toDF("k", "s", "e", "id").repartition(1 + rnd.nextInt(5))

      val refContain = (for ((pk, pt) <- pts; (ik, s, e, id) <- ivs
        if pk == ik && s <= pt && pt <= e) yield (pk, pt, id))
        .groupBy(identity).view.mapValues(_.size).toMap
      val gotContain = RangeJoin.rangeJoin(l, r, Seq("k"), "pt", "s", "e",
          Seq("id"), bucketWidth = width)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      // multiplicity-exact (duplicate inputs must multiply, never dedup)
      assert(gotContain == refContain, s"trial $trial width $width (containment)")

      val lIv = pts.map { case (k, p) => (k, p, p + rnd.nextInt(200).toLong) }
      val refOverlap = (for ((lk, ls, le) <- lIv; (ik, s, e, id) <- ivs
        if lk == ik && ls <= e && s <= le) yield (lk, ls, id))
        .groupBy(identity).view.mapValues(_.size).toMap
      val gotOverlap = RangeJoin.rangeJoinIntervals(
          lIv.toDF("k", "ls", "le").repartition(1 + rnd.nextInt(8)), r,
          Seq("k"), "ls", "le", "s", "e", Seq("id"), bucketWidth = width)
        .select(col("k"), col("ls"), col("rj_id"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(gotOverlap == refOverlap, s"trial $trial width $width (overlap)")
    }
  }
}
