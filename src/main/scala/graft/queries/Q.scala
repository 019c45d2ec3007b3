package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-checked query inventory.
  *
  * Parity strategy with the DuckDB oracle (the driver hashes values, so
  * results must match bit-for-bit, not just approximately):
  *
  *   - Money/quantity sums go through exact decimal arithmetic: casting
  *     each addend to a decimal makes the sum associative, so Spark's
  *     partial/final aggregation tree and DuckDB's sequential scan sum
  *     produce the identical value regardless of row order or
  *     parallelism. The final value is cast back to double (a single,
  *     correctly-rounded conversion in both engines).
  *   - Irrational intermediates (cos, products of arbitrary doubles) are
  *     quantized via `cast(x as decimal(28,12))` before summing — same
  *     idea, with enough fractional digits that the quantization error is
  *     far below any meaningful tolerance.
  *   - Dates/timestamps are emitted as formatted strings so temporal
  *     encodings can never disagree.
  *   - Every query ends in a total ORDER BY (unique tie-break) so row
  *     order is deterministic on both sides.
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  /** Exact 2-dp decimal view of a parquet double (deterministic in both engines). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Associative (order-independent) sum of a double expression: quantize
    * each addend to 12 fractional digits, sum exactly, return double. */
  def sumq(c: Column): Column = sum(c.cast(DecimalType(28, 12))).cast("double")

  /** Exact sum of a 2-dp money column, returned as double. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast("double")

  /** yyyy-MM-dd string of a date/timestamp column. */
  def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Run `f` against a fresh temp directory for a persisted-index gate
    * and delete the directory afterwards. The body must MATERIALIZE its
    * result eagerly (the incremental operators localCheckpoint before
    * returning) — the files are gone when this returns. Shared by the
    * incremental-dedup and incremental-substring gate shells so their
    * lifecycle (and cleanup) cannot drift apart. */
  def withTempIndex(prefix: String)(f: String => DataFrame): DataFrame = {
    val idx = java.nio.file.Files.createTempDirectory(prefix)
    try f(idx.toString)
    finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(idx)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
