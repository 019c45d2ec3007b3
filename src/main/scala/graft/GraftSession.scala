package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Tuned for the driver's local[32] harness but chosen to hold on a real
  * cluster: AQE on (runtime coalescing + skew-join splitting), modest
  * shuffle parallelism sized to cores (at 100 TB you'd raise
  * `shuffle.partitions`, not rewrite queries), broadcast threshold left
  * at default so dimension joins auto-broadcast.
  */
object GraftSession {
  def create(
      appName: String = "graft",
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
  ): SparkSession = {
    val spark = SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      // runtime bloom-filter pushdown for selective join sides — free
      // row-group skipping on the 100 TB probe side
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // explicit split sizing: 128 MiB keeps one task's working set in
      // executor memory at any SF (raise shuffle.partitions, not this,
      // when scaling out)
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
