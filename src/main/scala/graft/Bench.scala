package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    // …except the multi-job rows (eager index writes, checkpointed CC
    // rounds, many independent jobs): the r6 A/A run showed ±70 % swings
    // on byte-identical code, so min-of-3 can't separate a real 1.5×
    // regression from scheduling luck. Those get 5 reps, publish the
    // MEDIAN, and carry a min–max spread in the JSON line.
    val multiJob = Set("q_keep_canonical", "q_dedup_groups", "q_graph_day",
      "q_incremental_append", "q_incremental_dedup",
      "q_incremental_substring", "q_ann_ivf", "q_pq_topk")
    // a query whose body THROWS gets no timing row at all — timing the
    // exception published a fake 0.09 s for the broken q_asof_join in
    // r5/r6; it is recorded under "errors" instead and fails the eye
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val spreads = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    val results = SparkEntry.queries.flatMap { case (name, fn) =>
      if (isolate) spark.catalog.clearCache()
      val n = if (multiJob(name)) 5 else reps
      val times = scala.collection.mutable.ArrayBuffer[Double]()
      var i = 0
      while (i < n && !errors.contains(name)) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.next().take(120)
        }
        i += 1
      }
      if (errors.contains(name)) None
      else {
        val sorted = times.sorted
        if (multiJob(name)) {
          spreads(name) = (sorted.head, sorted.last)
          Some(name -> sorted(sorted.size / 2))
        } else Some(name -> sorted.head)
      }
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
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => " "; case c => c.toString }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f2(v) }
      .mkString("{", ",", "}")
    // min–max spread for the multi-job rows only (~8 entries) — full
    // per-query spread would blow the ~2 KB line cap
    val sp = spreads.map { case (k, (lo, hi)) =>
      s"\"" + k + "\":[" + f2(lo) + "," + f2(hi) + "]" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"${esc(k)}\":\"${esc(v)}\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // field order is truncation-aware: the archiver keeps the TAIL of
    // the line, so the per-query map (the bulky, reconstructable part)
    // goes first and the summary scalars — total above all — go LAST;
    // if the line ever outgrows the cap again, the head loss eats query
    // rows, not the headline number (r4 lost the total this way).
    // "errors"/"n_errors" sit in the tail so a broken query survives
    // truncation — an empty errors map is the expected green state.
    println(s"""{"metric":"total","unit":"sec","queries":$qs,"spread":$sp,""" +
      s""""n_queries":${results.size},"reps":$reps,"warmup_s":${f(warmupS)},""" +
      s""""load1m":${f(load1m)},"cpus":$cpus,"sf":"$sfDir",""" +
      s""""errors":$errs,"n_errors":${errors.size},"value":${f(total)}}""")
    spark.stop()
  }
}
