package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, exact ndv, typed min/max as strings, one row per column") {
    val d = Seq(
      (Option(3L), Option("b")),
      (Option(1L), Option("a")),
      (Option(10L), Option("a")),   // numeric min/max must be typed: 10 > 3
      (Option.empty[Long], Option.empty[String]))
      .toDF("id", "tag")
    val got = Profile.profile(d, Seq("id", "tag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(got == Seq(
      ("id", 4L, 1L, 3L, "1", "10"),   // lexicographic would say max "3"
      ("tag", 4L, 1L, 2L, "a", "b")))
  }

  test("profile: missing column fails loudly") {
    val d = Seq((1L, "a")).toDF("id", "tag")
    val e = intercept[IllegalArgumentException] {
      Profile.profile(d, Seq("id", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("appendStats: two increments merge to the one-shot profile exactly") {
    val a = Seq((Option(1L), Option("x")), (Option(5L), Option.empty[String]),
      (Option(2L), Option("y")))
    val b = Seq((Option(9L), Option("x")), (Option.empty[Long], Option("z")))
    val dir = java.nio.file.Files.createTempDirectory("graft-profinc").toString
    try {
      Profile.appendStats(a.toDF("id", "tag"), s"$dir/inc", Seq("id", "tag"))
      Profile.appendStats(b.toDF("id", "tag"), s"$dir/inc", Seq("id", "tag"))
      Profile.appendStats((a ++ b).toDF("id", "tag"), s"$dir/one", Seq("id", "tag"))
      def rows(p: String) = Profile.readProfile(spark, p)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4), r.getString(5))).toSeq
      val inc = rows(s"$dir/inc")
      // fold-in ≡ one-shot: counts/min/max exact AND the HLL estimate
      // IDENTICAL (union of sketches ≡ sketch of the union)
      assert(inc == rows(s"$dir/one"))
      // and the mergeable stats agree with the exact one-pass profile
      val exact = Profile.profile((a ++ b).toDF("id", "tag"), Seq("id", "tag"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4), r.getString(5))).toSeq
      assert(inc.map(r => (r._1, r._2, r._3, r._5, r._6)) ==
        exact.map(r => (r._1, r._2, r._3, r._5, r._6)))
      // tiny cardinalities: the HLL estimate is exact here
      assert(inc.map(r => (r._1, r._4)) == exact.map(r => (r._1, r._4)))
    } finally deleteDir(dir)
  }

  test("appendStats: replayed batchId-stamped append is idempotent; unstamped rows all count") {
    val a = Seq((Option(1L), Option("x")), (Option(5L), Option.empty[String]))
    val b = Seq((Option(9L), Option("x")), (Option(2L), Option("z")))
    val dir = java.nio.file.Files.createTempDirectory("graft-profreplay").toString
    try {
      def rows(p: String) = Profile.readProfile(spark, p)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4), r.getString(5))).toSeq
      // streaming path: batch 0 lands, crash before checkpoint commit,
      // foreachBatch replays batch 0 (at-least-once), then batch 1
      Profile.appendStats(a.toDF("id", "tag"), s"$dir/s", Seq("id", "tag"), Some(0L))
      Profile.appendStats(a.toDF("id", "tag"), s"$dir/s", Seq("id", "tag"), Some(0L))
      Profile.appendStats(b.toDF("id", "tag"), s"$dir/s", Seq("id", "tag"), Some(1L))
      // reference: each batch exactly once
      Profile.appendStats(a.toDF("id", "tag"), s"$dir/r", Seq("id", "tag"), Some(0L))
      Profile.appendStats(b.toDF("id", "tag"), s"$dir/r", Seq("id", "tag"), Some(1L))
      assert(rows(s"$dir/s") == rows(s"$dir/r"),
        "replayed stamped batch must merge to nothing")
      // batch API (no batchId): identical appends are DISTINCT increments
      Profile.appendStats(a.toDF("id", "tag"), s"$dir/u", Seq("id", "tag"))
      Profile.appendStats(a.toDF("id", "tag"), s"$dir/u", Seq("id", "tag"))
      val u = rows(s"$dir/u")
      assert(u.head._2 == 2L * a.size, "unstamped appends must all count")
      // mixed dir: unstamped legacy rows + stamped rows coexist
      Profile.appendStats(b.toDF("id", "tag"), s"$dir/u", Seq("id", "tag"), Some(7L))
      Profile.appendStats(b.toDF("id", "tag"), s"$dir/u", Seq("id", "tag"), Some(7L))
      assert(rows(s"$dir/u").head._2 == 2L * a.size + b.size)
    } finally deleteDir(dir)
  }

  test("profile plan: one scan feeds every metric (no per-column passes)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-profile").toString
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
        .write.mode("overwrite").parquet(s"$dir/t")
      val plan = Profile.profile(spark.read.parquet(s"$dir/t"), Seq("id", "tag"))
        .queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans == 1, s"profile reads the table $scans times, want 1")
    } finally deleteDir(dir)
  }

  private def deleteDir(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try walk.iterator().asScala.toSeq.reverse
      .foreach(f => java.nio.file.Files.deleteIfExists(f))
    finally walk.close()
  }
}
