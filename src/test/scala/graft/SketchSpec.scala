package graft

import org.apache.spark.sql.functions._

/** Sketch accuracy: the gate query emits the bounded-error contract
  * (exact counts + within_bound booleans, oracle-checkable in DuckDB);
  * this spec pins the underlying HLL estimates directly. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within its rsd bound of exact, at sf0.01") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val both = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("a"),
        countDistinct(col("user_id")).as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(both.nonEmpty)
    both.foreach { case (k, a, e) =>
      assert(math.abs(a - e).toDouble / e <= 0.10, s"$k: approx $a vs exact $e")
    }
  }

  test("gate query asserts the 5% bound in-frame: all groups within_bound") {
    val out = queries.RelationalQueries.qApproxDistinct(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)}: HLL estimate out of 5% bound")
    }
  }

  test("q_approx_quantile gate: every group's GK answer holds its rank bound") {
    for (sf <- Seq("0.001", "0.01")) {
      val out = queries.PipelineQueries.qApproxQuantile(spark, s"/root/testdata/sf$sf")
        .collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        assert(r.getBoolean(4) && r.getBoolean(5),
          s"sf$sf ${r.getString(0)}: approx_percentile answer outside its ±1% rank bound")
      }
    }
  }

  test("CmsEstimate: never undercounts, exact on a collision-free sketch") {
    import spark.implicits._
    val df = (1L to 100L).flatMap(i => Seq.fill(i.toInt % 7 + 1)(i)).toDF("k")
    val sk = df.stat.countMinSketch(col("k"), 0.001, 0.999, seed = 1)
    val got = df.groupBy("k").agg(count(lit(1)).as("n"))
      .withColumn("est", graft.expr.CmsEstimate.cmsEstimate(col("k"), sk.toByteArray))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 100)
    got.foreach { case (k, n, est) =>
      assert(est >= n, s"CMS undercounted key $k")
      // width 2000 ≫ 100 keys: expect zero collisions → exact
      assert(est == n, s"CMS collided on a 2000-cell sketch: key $k $est vs $n")
    }
  }

  test("q_cms_counts gate: every key lower-bounded and within eps*N at both SFs") {
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val out = queries.PipelineQueries.qCmsCounts(spark, s"/root/testdata/$sf").collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        assert(r.getBoolean(2), s"$sf user ${r.getLong(0)}: CMS undercounted")
        assert(r.getBoolean(3), s"$sf user ${r.getLong(0)}: CMS overshoot beyond eps*N")
      }
    }
  }
}
