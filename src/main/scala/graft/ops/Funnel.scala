package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Conversion-funnel analysis over event streams — the ordered
  * sequence-match aggregate (view → click → purchase) product
  * analytics engines ship as a primitive and plain SQL lacks (ANSI
  * MATCH_RECOGNIZE, which Spark doesn't implement): per user, how deep
  * did the earliest strictly-ordered chain of step events get within a
  * conversion window of the chain's start?
  *
  * Semantics are MIN-CHAIN (deterministic and cross-engine-exact, the
  * oracle replays it verbatim): t1 = the user's earliest step-1 event;
  * tk = the earliest step-k event STRICTLY after t(k−1) and within
  * `windowUs` of t1. Greedy-earliest is conversion-optimal here: if
  * the earliest qualifying step-k event already exceeds the window,
  * every later one does too, so no other chain with the same t1
  * reaches deeper — and anchoring on the earliest t1 maximizes the
  * window's reach for a fixed event set. Strict `>` keeps same-instant
  * events from satisfying two stages at once (and keeps the SQL
  * replay total-order-free).
  *
  * Shape at scale: one user-keyed aggregate per step (n tiny — funnels
  * are 3-5 steps), each a filtered scan of the events shuffled on the
  * SAME user key, so AQE/exchange reuse keeps it one effective
  * partitioning; no windows, no per-user sorts, no event-list
  * materialization (the collect_list formulations die on power-law
  * users — a million-event user is one straggler task).
  *
  * @param steps    ordered event-type names, length ≥ 1
  * @param windowUs conversion window in micros, from t1
  * @return one row per user that reached step 1:
  *   (userCol, depth, t1_us … tn_us) — depth = furthest stage, the
  *   trailing times null past it */
object Funnel {

  private def asMicros(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case _ => col(c).cast("long")
    }

  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    require(windowUs > 0, "funnel: window must be positive")
    Reserved.requireAbsent("funnel",
      Seq("__e") ++ steps.indices.map(i => s"t${i + 1}_us"), events)
    val ev = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), asMicros(events, tsCol).as("__e"), col(typeCol))

    var chain = ev.where(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(col("__e")).as("t1_us"))
    for (k <- 2 to steps.length) {
      val nxt = ev.where(col(typeCol) === steps(k - 1))
        .join(chain.select(col(userCol), col(s"t${k - 1}_us"), col("t1_us").as("__t1")),
          Seq(userCol))
        .where(col("__e") > col(s"t${k - 1}_us") &&
          col("__e") <= col("__t1") + lit(windowUs))
        .groupBy(userCol).agg(min(col("__e")).as(s"t${k}_us"))
      chain = chain.join(nxt, Seq(userCol), "left")
    }
    val depth = steps.indices.drop(1)
      .map(i => when(col(s"t${i + 1}_us").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    chain.select(
      col(userCol) +: depth.cast("long").as("depth") +:
        steps.indices.map(i => col(s"t${i + 1}_us")): _*)
  }
}
