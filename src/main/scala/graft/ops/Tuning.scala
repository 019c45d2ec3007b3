package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-tunable scale knobs, read at plan-build time. */
private[graft] object Tuning {

  /** Max bytes of the index side (vectors / shingles) that the
    * verify-attach joins will broadcast; past this they fall back to
    * `shuffle_hash` so the fat candidate stream at least stays
    * unsorted. 256 MB default suits a 4-8 GB executor; tune with
    * `spark.graft.attachBroadcastBytes` where executors are smaller
    * (or to 0 to force the shuffle fallback — how the fallback's
    * equivalence is pinned in SimilaritySpec without a >256 MB
    * fixture). */
  def attachBroadcastBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.attachBroadcastBytes")
      // byteStringAsBytes accepts both Spark-conventional size strings
      // ("256m", "1g") and plain byte counts — raw toLong would throw a
      // context-free NumberFormatException on the former
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(256L << 20)

  /** Spread the STREAMED side of a broadcast cross/theta join across
    * the session's shuffle parallelism — the bounded brute tiers
    * (bitext cross, n²-Jaccard, brute cosine top-k) read a small
    * bounded frame from one scan partition, so the |side|×|other| pair
    * EXPLOSION (the real cost) otherwise runs in a single task
    * (measured: q_keep_canonical's verify stage 0.69 s on one core
    * with 7 idle). Scale-adaptive, never a shrink: a frame already at
    * or above the session's parallelism — the production-scale scan —
    * passes through untouched, so no exchange is ever added to a big
    * side. The partition probe runs only on exchange-free plans
    * (Dataset.rdd on a plan with exchanges executes them — the
    * oneWriterPerCell AQE lesson); anything already shuffled passes
    * through too. */
  def spreadSmall(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val hasExchange = df.queryExecution.sparkPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _ => false
    }
    if (!hasExchange && df.rdd.getNumPartitions < n) df.repartition(n) else df
  }
}
