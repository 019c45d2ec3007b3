package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (the builder-prompt scale checklist:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join split (enabled in [[graft.GraftSession]]) covers
  * sort-merge joins at runtime; these helpers cover the two cases AQE
  * does not: a skewed AGGREGATION (one reducer owns the hot key) and a
  * skewed broadcast-side join fan-out. Both are pure plan rewrites —
  * deterministic results, no sampling.
  */
object Skew {

  /** Two-phase (salted) aggregation: rows spread over `buckets`
    * sub-keys, partially aggregated, then finally aggregated on the
    * real key. Works for any algebraic aggregate expressed as
    * (partial, merge) pairs; the common count/sum case is prebuilt. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as(s"sum_$valueCol"))
  }

  /** Salted equi-join against a small (broadcastable) right side: the
    * big side takes a random-ish salt in [0, buckets); the small side
    * is exploded ×buckets so every (key, salt) pair still matches.
    * Breaks one hot key across `buckets` tasks at the cost of
    * replicating the small side. */
  def saltedBroadcastJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val explodedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    saltedBig
      .join(broadcast(explodedSmall), Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
