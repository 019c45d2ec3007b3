package graft

import org.apache.spark.sql.functions._

/** Sketch accuracy: the HLL approx-distinct gate query is rows-only
  * (estimates are engine-specific), so its accuracy contract is pinned
  * here instead. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within its rsd bound of exact, at sf0.01") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val exact = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = queries.RelationalQueries.qApproxDistinct(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e <= 0.10, s"$k: approx $a vs exact $e")
    }
  }
}
