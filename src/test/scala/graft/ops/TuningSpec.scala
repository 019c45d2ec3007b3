package graft.ops

import graft.SparkSpec

class TuningSpec extends SparkSpec {

  test("attachBroadcastBytes: default, plain bytes, and size-string forms") {
    try {
      assert(Tuning.attachBroadcastBytes(spark) == (256L << 20))
      spark.conf.set("spark.graft.attachBroadcastBytes", "1048576")
      assert(Tuning.attachBroadcastBytes(spark) == (1L << 20))
      // Spark-conventional size strings must parse, not throw
      spark.conf.set("spark.graft.attachBroadcastBytes", "256m")
      assert(Tuning.attachBroadcastBytes(spark) == (256L << 20))
      spark.conf.set("spark.graft.attachBroadcastBytes", "1g")
      assert(Tuning.attachBroadcastBytes(spark) == (1L << 30))
    } finally spark.conf.unset("spark.graft.attachBroadcastBytes")
  }
}
