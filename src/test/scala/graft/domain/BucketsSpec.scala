package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class BucketsSpec extends SparkSpec {
  import spark.implicits._

  private def c2n(x: String): Option[Int] = {
    val r = Seq(x).toDF("x").select(Buckets.classToNum(col("x"))).head()
    if (r.isNullAt(0)) None else Some(r.getInt(0))
  }

  test("classToNum: [0,1] buckets by strict-< thirds") {
    assert(c2n("0") == Some(1))
    assert(c2n("0.333") == Some(1))
    assert(c2n(s"${1.0 / 3.0}") == Some(2)) // exactly 1/3 is NOT < 1/3
    assert(c2n("0.5") == Some(2))
    assert(c2n(s"${2.0 / 3.0}") == Some(3))
    assert(c2n("1") == Some(3))
  }

  test("classToNum: out-of-[0,1] uses banker's rounding then clamps to [1,3]") {
    assert(c2n("2.5") == Some(2)) // Python round(2.5) == 2 (half-even)
    assert(c2n("1.5") == Some(2))
    assert(c2n("2.4") == Some(2))
    assert(c2n("2.6") == Some(3))
    assert(c2n("7") == Some(3))
    assert(c2n("-4") == Some(1))
  }

  test("classToNum: Thai/English level words, unknown → null") {
    assert(c2n("ต่ำ") == Some(1))
    assert(c2n(" Very Low ") == Some(1))
    assert(c2n("ปานกลาง") == Some(2))
    assert(c2n("MEDIUM") == Some(2))
    assert(c2n("สูงมาก") == Some(3))
    assert(c2n("high") == Some(3))
    assert(c2n("whatever") == None)
    assert(c2n("") == None)
  }

  test("avgToLevel boundaries: ≤1.5→1, ≤2.1→2, else 3") {
    val out = Seq(1.5, 1.50001, 2.1, 2.10001, 3.0).toDF("x")
      .select(Buckets.avgToLevel(col("x"))).collect().map(_.getInt(0)).toSeq
    assert(out == Seq(1, 2, 2, 3, 3))
  }

  test("scoreColor buckets: ≥75 red, ≥50 yellow, else green (F14)") {
    val out = Seq(80.0, 75.0, 74.9, 50.0, 49.9).toDF("s")
      .select(Buckets.scoreColor(col("s"))).collect().map(_.getString(0)).toSeq
    assert(out == Seq("red", "red", "yellow", "yellow", "green"))
  }

  test("riskScore: base, boost-to-80 on any disaster, clamp at 100") {
    val rows = Seq(
      (20.0, 1, 0),  // base = 10 + 10 = 20
      (20.0, 1, 1),  // boosted: max(80, 20+5) = 80
      (150.0, 2, 0), // clamp: min(100, 75+20) = 95
      (180.0, 3, 2), // min(100, max(80, 120+10)) = 100
    ).toDF("rain", "risk", "cnt")
    val got = rows.select(Buckets.riskScore(col("rain"), col("risk"), col("cnt")))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(20.0, 80.0, 95.0, 100.0))
  }
}
