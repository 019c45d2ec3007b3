package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning; at
  * cluster scale these would be partitioned table paths — the query
  * code is agnostic to that.
  */
object Tables {

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Process-local memo of each base table's INFERRED schema, keyed by
    * path. Every `spark.read.parquet` runs a footer schema-inference
    * Spark job; the bench pays it once per table per query per rep —
    * hundreds of identical 1-task jobs over immutable testdata files.
    * The memo infers once per JVM and hands later reads the explicit
    * schema (bit-identical to what inference would return — the files
    * are the driver's read-only inputs, fixed for the process's
    * lifetime). This caches METADATA only, never rows or results:
    * every query still computes from the parquet files. Index/temp
    * dirs never come through here — they mutate mid-process.
    * `events` is EXEMPT: its schema inference is conf-dependent (the
    * nanos flavor reads as Long only under nanosAsLong, and the
    * loader's contract includes FAILING helpfully when the conf is
    * off) — a memoized schema would mask both behaviors. */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") return spark.read.parquet(path)
    val schema = schemaMemo.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Register every table as a temp view so `spark.sql` works over the
    * warehouse directly (events pre-converted to µs timestamps). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else t(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** `events.ts` normalized to a microsecond `TimestampType` regardless
    * of the parquet storage flavor. The generator has shipped it as
    * TIMESTAMP(NANOS) (read as Long under
    * `spark.sql.legacy.parquet.nanosAsLong`; `ts div 1000` — integer
    * division, a double division would lose precision on ~1.7e18 ns
    * epochs) and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
    * TIMESTAMP_NTZ; the naive values are UTC wall-clock, reinterpreted
    * via [[graft.expr.NtzAsUtc]] — a physical no-op that never consults
    * the session zone, so this loader is correct on ANY session and has
    * ZERO side effects on session state). Every downstream consumer
    * (`unix_micros`, watermarks, [[graft.ops.AsofJoin]]) sees one stable
    * type either way. Storage leniency mirrors the reference's
    * format-lenient date handling (reference backend/app/utils.py:520-528)
    * — leniency about STORAGE, not license to reconfigure the caller's
    * session: the nanos flavor needs a reader conf that must be set at
    * session build time, so it is required loudly, not set silently. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // The TIMESTAMP(NANOS) storage flavor needs a reader conf, and
    // schema inference throws a cryptic "Illegal Parquet type" without
    // it — wrap THAT failure with the fix. NTZ/LTZ/Long flavors read
    // fine without the conf, so callers who never see nanos files owe
    // nothing up front, and the loader never repairs the session
    // silently (the old side effect).
    val nanosConfOn =
      s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true")
    val raw =
      try t(s, d, "events")
      catch {
        // narrow sniff: ONLY the schema-inference failure shape
        // ("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,…))") — a bare
        // "NANOS" match would also catch e.g. a missing path that merely
        // CONTAINS the word nanos and mis-advise a conf fix
        case e: Throwable if !nanosConfOn &&
            Option(e.getMessage).map(_.toUpperCase).exists(m =>
              m.contains("ILLEGAL PARQUET TYPE") && m.contains("NANOS")) =>
          throw new IllegalArgumentException(
            "events.parquet stores ts as TIMESTAMP(NANOS): set " +
              "spark.sql.legacy.parquet.nanosAsLong=true on the SparkSession " +
              "builder (as every graft entry point does) so it reads as Long",
            e)
      }
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", graft.expr.NtzAsUtc.ntzAsUtc(raw("ts")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
