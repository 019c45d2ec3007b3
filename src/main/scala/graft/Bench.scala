package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM/codegen/shuffle paths once so the first measured
    // query doesn't absorb session startup (~4s on a cold JVM); its
    // duration goes into the JSON preamble — a slow warmup flags a
    // cold/loaded machine, explaining uniform cross-round drift
    val warm0 = System.nanoTime()
    try SparkEntry.queries.get("q1_agg").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    val warmupS = (System.nanoTime() - warm0) / 1e9
    val load1m = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // SPARK_GRAFT_BENCH_ISOLATE=1: clear the catalog cache between
    // queries so each row is measured order-independent — confirms (or
    // refutes) cache-pressure stories when totals drift between runs
    val isolate = sys.env.get("SPARK_GRAFT_BENCH_ISOLATE").contains("1")
    // best-of-3 per query: reports steady-state cost, not codegen
    // compilation or page-cache luck of the first pass (3 reps keep
    // round-over-round totals within ~±10% under machine-load noise)
    val reps = 3
    val results = SparkEntry.queries.map { case (name, fn) =>
      if (isolate) spark.catalog.clearCache()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // ONE machine-parseable line. The harness that archives this keeps
    // only the TAIL of stdout (r4's 75-query line lost its head and the
    // total with it), so the preamble stays terse and the whole line
    // must clear a ~2 KB cap. Totals/preamble print at 3 decimals;
    // per-query values at 2 — with 78 queries the extra digit would
    // cost 78 bytes of that budget, and 2 decimals keeps worst-case
    // rounding error ≤ ~4% on even the cheapest (~0.13 s) row.
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f2(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // field order is truncation-aware: the archiver keeps the TAIL of
    // the line, so the per-query map (the bulky, reconstructable part)
    // goes first and the summary scalars — total above all — go LAST;
    // if the line ever outgrows the cap again, the head loss eats query
    // rows, not the headline number (r4 lost the total this way)
    println(s"""{"metric":"total","unit":"sec","queries":$qs,""" +
      s""""n_queries":${results.size},"reps":$reps,"warmup_s":${f(warmupS)},""" +
      s""""load1m":${f(load1m)},"cpus":$cpus,"sf":"$sfDir","value":${f(total)}}""")
    spark.stop()
  }
}
