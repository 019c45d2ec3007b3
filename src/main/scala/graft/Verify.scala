package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** One-column failure marker for a query whose body threw: the DuckDB
    * compare sees a schema that can never match an oracle and records a
    * red row, so the failure stays visible instead of the query
    * vanishing from the correctness file (the r5/r6 failure mode). A
    * zero-column `emptyDataFrame` does NOT work — Spark rejects
    * empty-schema parquet writes (EMPTY_SCHEMA_NOT_SUPPORTED) — so the
    * marker carries the query name in one real column. Unit-pinned by
    * VerifyMarkerSpec; compare.py prints `ENGINE QUERY FAILED` on it. */
  def writeFailureMarker(spark: SparkSession, outDir: String, name: String): Unit =
    spark.range(1)
      .select(org.apache.spark.sql.functions.lit(name).as("__graft_failed"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that throws must stay VISIBLE in the driver's correctness
    // file: write a ONE-COLUMN marker parquet under its name (the DuckDB
    // compare then records a red SCHEMA-mismatch row instead of the
    // query silently vanishing — r5/r6 lost q_asof_join for two rounds
    // to exactly that absence-reads-as-fine failure mode) and collect
    // the message for _failed.json + a stdout line the driver tails.
    // NOTE: a zero-column `emptyDataFrame` does NOT work here — Spark
    // rejects empty-schema parquet writes (EMPTY_SCHEMA_NOT_SUPPORTED),
    // so the marker must carry at least one real column.
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed(name) = ErrText.message(e)
        println(s"[verify] FAILED $name: ${ErrText.firstLine(e)}")
        try writeFailureMarker(spark, outDir, name)
        catch { case e2: Throwable =>
          println(s"[verify] marker write ALSO failed for $name: " +
            ErrText.firstLine(e2))
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val failedJson = failed
      .map { case (k, v) => s"${q(k)}: ${q(v.take(500))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failed.json"), failedJson)
    if (failed.nonEmpty)
      println(s"[verify] ${failed.size}/${SparkEntry.queries.size} queries FAILED: " +
        failed.keys.mkString(", "))
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
