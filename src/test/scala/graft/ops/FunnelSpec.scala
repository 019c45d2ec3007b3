package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)
  private val MinUs = 60000000L

  private def run(rows: Seq[(Long, Timestamp, String)], windowMin: Long,
      steps: Seq[String] = Seq("view", "click", "purchase")) =
    Funnel.funnel(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", steps, windowMin * MinUs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), (2 until 2 + steps.length)
          .map(i => if (r.isNullAt(i)) -1L else r.getLong(i) / MinUs)))
      .toMap

  test("min-chain: earliest qualifying event per stage, strict ordering, window from t1") {
    val rows = Seq(
      // u1 converts fully: view@0, click@5, purchase@9
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
      // u2: click BEFORE its first view never counts; no click after → depth 1
      (2L, ts(10), "click"), (2L, ts(20), "view"),
      // u3: purchase outside the window → depth 2; the EARLIEST click
      // is chosen even though a later click would leave more room
      (3L, ts(0), "view"), (3L, ts(1), "click"), (3L, ts(8), "click"), (3L, ts(40), "purchase"),
      // u4: same-instant events don't satisfy two stages (strict >)
      (4L, ts(0), "view"), (4L, ts(0), "click"),
      // u5: no view at all → absent from the output
      (5L, ts(0), "purchase"))
    val got = run(rows, windowMin = 30)
    assert(got(1L) == ((3L, Seq(0L, 5L, 9L))))
    assert(got(2L) == ((1L, Seq(20L, -1L, -1L))))
    assert(got(3L) == ((2L, Seq(0L, 1L, -1L))))
    assert(got(4L) == ((1L, Seq(0L, -1L, -1L))))
    assert(!got.contains(5L))
  }

  test("window binds at t1, not per stage; reaching the boundary is inclusive") {
    val rows = Seq(
      (1L, ts(0), "view"), (1L, ts(29), "click"), (1L, ts(30), "purchase"),
      (2L, ts(0), "view"), (2L, ts(29), "click"), (2L, ts(31), "purchase"))
    val got = run(rows, windowMin = 30)
    assert(got(1L)._1 == 3L, "boundary event (t1 + window) must count")
    assert(got(2L)._1 == 2L, "event past t1 + window must not")
  }

  test("null users/ts drop; a 1-step funnel is first-occurrence per user") {
    val rows = Seq((1L, ts(3), "view"), (1L, ts(1), "view"),
      (2L, null.asInstanceOf[Timestamp], "view"))
    val got = run(rows, 10, steps = Seq("view"))
    assert(got(1L)._1 == 1L && got(1L)._2.head == 1L)
    assert(!got.contains(2L))
  }
}
