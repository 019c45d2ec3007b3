package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("rrf: closed-form scores; absent ranks contribute 0 and stay NULL") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val got = Fusion.rrf(Seq("a" -> a, "b" -> b))
      .select($"id", $"rank_a", $"rank_b", $"rrf")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getDouble(3)))).toMap
    assert(got(20L)._3 == 1.0 / 62.0 + 1.0 / 61.0) // in both rankings
    assert(got(10L)._3 == 1.0 / 61.0 && got(10L)._2.isEmpty) // a-only
    assert(got(40L)._3 == 1.0 / 62.0 && got(40L)._1.isEmpty) // b-only
    assert(got(30L)._3 == 1.0 / 63.0)
    // the doc both arms agree on outranks every single-arm doc here
    assert(got(20L)._3 > got.removed(20L).values.map(_._3).max)
  }

  test("rrf: kRrf dampening and name uniqueness guard") {
    val a = Seq((1L, 1)).toDF("id", "rank")
    val s0 = Fusion.rrf(Seq("x" -> a), kRrf = 0)
      .select($"rrf").as[Double].head()
    assert(s0 == 1.0)
    val e = intercept[IllegalArgumentException] {
      Fusion.rrf(Seq("x" -> a, "x" -> a))
    }
    assert(e.getMessage.contains("unique"))
  }
}
