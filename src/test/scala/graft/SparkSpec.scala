package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (small parallelism for test speed). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-sql-wh").toString)
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  spark.sparkContext.setLogLevel("ERROR")

  /** Recursive temp-dir cleanup for specs exercising persisted
    * artifacts — ONE definition (the idiom was copied into three specs
    * before this was hoisted). */
  protected def deleteRecursively(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val w = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try w.sorted(java.util.Comparator.reverseOrder()).iterator().asScala
      .foreach(java.nio.file.Files.deleteIfExists(_))
    finally w.close()
  }
}
