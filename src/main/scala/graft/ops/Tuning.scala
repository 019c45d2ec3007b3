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
}
