package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavy skew: 90% of rows share one key
  private def skewed = spark.range(10000).select(
    when(col("id") % 10 =!= 0, "HOT").otherwise(concat(lit("k"), col("id") % 7)).as("key"),
    (col("id") % 100).cast("double").as("v"))

  test("saltedSumCount equals the plain aggregation") {
    val plain = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val salted = Skew.saltedSumCount(skewed, Seq("key"), "v", buckets = 8)
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedBroadcastJoin equals the plain join, splits the hot key across salts") {
    val dim = Seq(("HOT", "hot-dim"), ("k1", "d1"), ("k3", "d3")).toDF("key", "label")
    val plain = skewed.join(dim, Seq("key")).groupBy("key", "label")
      .agg(count(lit(1)).as("n")).orderBy("key")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val salted = Skew.saltedBroadcastJoin(skewed, dim, "key", buckets = 8)
      .groupBy("key", "label").agg(count(lit(1)).as("n")).orderBy("key")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)

    // the hot key's rows actually spread over multiple salt buckets
    val spread = skewed.withColumn("__salt", pmod(monotonically_increasing_id(), lit(8L)))
      .where(col("key") === "HOT").select("__salt").distinct().count()
    assert(spread > 1)
  }
}
