package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives; false-positive rate near the requested fpp") {
    val members = (1L to 1000L).toDF("h")
    val bytes = Bloom.buildLongFilter(members, "h", expectedItems = 1000, fpp = 0.01)
    val probed = (1L to 11000L).toDF("h")
      .withColumn("hit", Bloom.mightContain(bytes, col("h")))
    // every member answers true — the property that makes a Bloom
    // prefilter semantics-free in front of an exact join
    assert(probed.where(col("h") <= 1000 && !col("hit")).count() == 0)
    val fp = probed.where(col("h") > 1000 && col("hit")).count()
    assert(fp < 10000 * 0.05, s"$fp false positives out of 10000") // 1% nominal, 5% slack
  }

  test("contamination: bloom-prefiltered plan equals the plain one row-for-row") {
    val dir = "/root/testdata/sf0.001"
    def rows(threshold: Long) =
      graft.queries.ExtensionQueries.contamination(spark, dir, threshold)
        .collect().map(_.toSeq).toSeq
    assert(rows(0L) == rows(Long.MaxValue)) // bloom forced vs bloom off
  }

  test("prefiltered containment join equals the unfiltered one") {
    val big = Seq.tabulate(5000)(i => (i.toLong, s"tok${i % 700}")).toDF("id", "s")
    val small = Seq.tabulate(40)(i => (i.toLong, s"tok${i * 13}")).toDF("id", "s")
    val bytes = Bloom.buildLongFilter(
      small.select(xxhash64(col("s")).as("h")), "h", expectedItems = 40)
    val plain = big.join(small.select(col("s")).distinct(), Seq("s")).count()
    val filtered = big.where(Bloom.mightContain(bytes, xxhash64(col("s"))))
      .join(small.select(col("s")).distinct(), Seq("s")).count()
    assert(plain == filtered)
  }
}
