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
}
