package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntersectAtLeastSpec extends SparkSpec {
  import spark.implicits._

  private def run(): Unit = {
    // randomized ≡ the array_intersect formulation it replaces, over
    // sorted distinct int arrays and thresholds spanning the decision
    // boundary (including k ≤ 0 → always true, and k > min size →
    // always false)
    val rnd = new scala.util.Random(31)
    val rows = (0 until 300).map { i =>
      val a = Seq.fill(rnd.nextInt(25))(rnd.nextInt(40)).distinct.sorted
      val b = Seq.fill(rnd.nextInt(25))(rnd.nextInt(40)).distinct.sorted
      val k = rnd.nextInt(30) - 3
      (i, a, b, k)
    }
    val df = rows.toDF("i", "a", "b", "k")
      .withColumn("got", graft.expr.IntersectAtLeast.intersectAtLeast(
        col("a"), col("b"), col("k")))
      .withColumn("want", size(array_intersect(col("a"), col("b"))) >= col("k"))
    val bad = df.where(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, s"intersect_at_least diverged on ${bad.length} rows: " +
      bad.take(3).mkString("; "))
  }

  test("intersect_at_least ≡ size(array_intersect) >= k, randomized (codegen)") {
    run()
  }

  test("intersect_at_least ≡ size(array_intersect) >= k, interpreted eval path") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run()
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("intersect_count ≡ size(array_intersect) over sorted distinct long arrays, randomized") {
    val rnd = new scala.util.Random(37)
    val rows = (0 until 300).map { i =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(50).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(50).toLong).distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("i", "a", "b")
      .withColumn("got", graft.expr.IntersectCount.intersectCount(col("a"), col("b")))
      .withColumn("want", size(array_intersect(col("a"), col("b"))))
    val bad = df.where(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, s"intersect_count diverged on ${bad.length} rows")
  }

  test("nulls propagate; type mismatch rejected") {
    val df = Seq((Some(Seq(1, 2)), Some(Seq(1, 2)), Some(1)),
      (None, Some(Seq(1)), Some(0)), (Some(Seq(1)), Some(Seq(1)), None))
      .toDF("a", "b", "k")
      .withColumn("got", graft.expr.IntersectAtLeast.intersectAtLeast(
        col("a"), col("b"), col("k")))
    val got = df.select("got").collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(got(0) == true && got(1) == null && got(2) == null)
    intercept[Exception] {
      Seq((1L, 2)).toDF("a", "k")
        .select(graft.expr.IntersectAtLeast.intersectAtLeast(col("a"), col("a"), col("k")))
        .collect()
    }
  }
}
