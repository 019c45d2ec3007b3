package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("latest right row at or before each left ts, per key") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"), (3L, 9L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 18L, 200.0), (2L, 20L, 300.0))
      .toDF("k", "ts", "v")
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .orderBy("k", "ts")
      .select("k", "ts", "tag", "asof_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, 10L, "a", 100.0), // 5 ≤ 10 < 18
      (1L, 20L, "b", 200.0), // 18 is newer
      (2L, 15L, "c", null),  // right row is in the future
      (3L, 9L, "d", null)))  // no right rows for key 3
  }

  test("tie on ts matches (≤ semantics) and payload is all-or-nothing") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 7.0, "x")).toDF("k", "ts", "v", "s")
    val r = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v", "s")).head()
    assert(r.getDouble(2) == 7.0 && r.getString(3) == "x")
  }

  test("null keys/ts on the right never match; left rows survive") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((Option.empty[Long], Option(5L), 1.0),
      (Option(1L), Option.empty[Long], 2.0)).toDF("k", "ts", "v")
    val r = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v")).head()
    assert(r.isNullAt(2))
  }

  test("one shuffle: the plan has a single Exchange below the window") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "ts", "v")
    val plan = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    // union feeds one hashpartitioning exchange; no join operator at all
    assert(!plan.contains("Join"), "as-of should not plan a join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one key shuffle, got $exchanges:\n$plan")
  }
}
