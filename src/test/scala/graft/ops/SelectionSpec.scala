package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("strict prefix: budget cuts at the first overflow, boundary-exact rows kept") {
    // priority order (p desc, id): c(8) → a(5) → d(4) → b(2)
    val docs = Seq((1L, 1.0, 5L), (2L, 0.5, 2L), (3L, 2.0, 8L), (4L, 0.75, 4L))
      .toDF("id", "p", "cost")
    def sel(b: Long): Seq[(Long, Long)] =
      Selection.selectByBudget(docs, Seq($"p".desc, $"id".asc), "cost", b)
        .orderBy($"p".desc, $"id")
        .select("id", "tokens_before").as[(Long, Long)].collect().toSeq
    assert(sel(13L) == Seq((3L, 0L), (1L, 8L)))       // 8+5=13 fits, +4 would not
    assert(sel(17L) == Seq((3L, 0L), (1L, 8L), (4L, 13L))) // boundary 17 == budget kept
    assert(sel(7L) == Seq.empty)                      // first doc alone overflows → nothing
    assert(sel(0L) == Seq.empty)
  }

  test("two-phase prefix sum ≡ single-partition global window at many partitions") {
    val docs = (1L to 500L).map(i => (i, (i * 37 % 11).toDouble, i % 13 + 1))
      .toDF("id", "p", "cost")
    val got = Selection.selectByBudget(docs, Seq($"p".desc, $"id".asc),
        "cost", budget = 800L, numPartitions = 16)
      .select("id", "tokens_before").as[(Long, Long)].collect().toMap
    // oracle: one-partition window (fine at spec scale, fatal at 100 TB)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"p".desc, $"id".asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expect = docs
      .withColumn("tb", coalesce(sum($"cost").over(w), lit(0L)))
      .where($"tb" + $"cost" <= 800L)
      .select("id", "tb").as[(Long, Long)].collect().toMap
    assert(got == expect)
    assert(got.nonEmpty && got.size < 500, "fixture too weak — cut not exercised")
  }
}
