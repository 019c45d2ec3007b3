package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series operator Spark's join zoo lacks: for
  * each left row, attach the LATEST right row with `right.ts ≤ left.ts`
  * in the same key group (trades joined to the prevailing quote, an
  * event to the feature value current at event time).
  *
  * The naive formulations die at scale: a range theta-join explodes to
  * a per-row scan, and a "max(ts) per left row then join back" doubles
  * the shuffles. This is the union–sort–carry-forward plan instead:
  * tag both sides, union, ONE shuffle on the key, and within each key
  * partition a running `last(payload, ignoreNulls)` ordered by
  * `(ts, side)` carries the newest right payload forward into every
  * left row — right rows sort before left rows at equal ts, so a tie
  * matches (≤, not <), matching DuckDB/kdb ASOF semantics. Cost is one
  * shuffle + one sort of |L|+|R| rows regardless of time-range shape.
  *
  * Payloads ride in ONE struct so a match is all-or-nothing from the
  * same right row (column-wise carry could stitch different right rows
  * when a payload column is legitimately null). Rows with a null key
  * or null ts never match (dropped from the right, unmatched on the
  * left). Ties WITHIN the right side at the same (key, ts) resolve
  * arbitrarily — dedup the right side first if that matters (the same
  * caveat DuckDB's ASOF carries).
  */
object AsofJoin {

  /** @param rightPayload right columns to attach (prefixed `asof_`)
    * @param forward false (default): match the LATEST right row with
    *   `right.ts ≤ left.ts` — the classic backward as-of. true: match
    *   the EARLIEST right row with `right.ts ≥ left.ts` (the event's
    *   NEXT reading — label attribution, next-purchase lookups). Same
    *   one-shuffle union–sort–carry plan: the sort just runs ts
    *   descending, so the carry brings the nearest FUTURE payload; at
    *   equal ts the right row still sorts before the left (ties match
    *   inclusively in both directions).
    * @return all left columns + `asof_<payload>` columns (null where
    *   no right row precedes/follows the left row) */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightPayload: Seq[String], prefix: String = "asof_",
      forward: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    require(rightPayload.nonEmpty, "no right payload columns requested")
    Reserved.requireAbsent("asofJoin", Seq("__side", "__p", "__m"), left, right)
    val lCols = left.columns.toSeq

    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(
        org.apache.spark.sql.types.StructType(rightPayload.map(p =>
          org.apache.spark.sql.types.StructField(p, right.schema(p).dataType)))))
    val rTagged = right
      .where(keys.map(col(_).isNotNull).reduce(_ && _) && col(tsCol).isNotNull)
      .select(keys.map(col) :+ col(tsCol) :+
        struct(rightPayload.map(col): _*).as("__p"): _*)
      .withColumn("__side", lit(0))
    // right rows surface only key/ts/payload; left-only columns are null
    val rAligned = rTagged.select(
      lCols.map(c => if (keys.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__side"), col("__p")): _*)

    // desc defaults to NULLS LAST, which would park null-ts left rows
    // AFTER every right row and match them to the minimum-ts payload —
    // breaking the "null ts never matches" contract the backward path
    // gets for free from asc's NULLS FIRST
    val tsOrder = if (forward) col(tsCol).desc_nulls_first else col(tsCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.select(lCols.map(col) ++ Seq(col("__side"), col("__p")): _*)
      .unionByName(rAligned)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(lCols.map(col) ++
        rightPayload.map(p => col("__m").getField(p).as(s"$prefix$p")): _*)
  }

  /** Skew-proof as-of join: [[asofJoin]] windows one partition PER KEY,
    * so a hot key (one symbol carrying half the ticks) serializes into
    * a single task. This variant adds a time-bucket axis and runs the
    * same two-phase prefix trick as [[Packing.assignWindows]]:
    *
    *   1. carry-forward WITHIN each (key, time-bucket) — partitions are
    *      ~|key|/buckets rows, so the hot key spreads over `buckets`
    *      parallel tasks;
    *   2. per (key, bucket), keep only the LAST right payload (one row
    *      each — the scale-independent small side) and exclusive-scan
    *      it across buckets per key (window partitions of ≤ `buckets`
    *      rows);
    *   3. left rows unmatched within their own bucket take their
    *      bucket's prefix value.
    *
    * Bit-identical to [[asofJoin]] (pinned in AsofJoinSpec, including
    * a hot-key case). Time buckets are fixed-width over the observed
    * ts range — two scalars from one agg; a numeric or timestamp ts
    * works (internally compared as-is, bucketed on unix micros /
    * double). */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightPayload: Seq[String], prefix: String = "asof_",
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    Reserved.requireAbsent("asofJoinBucketed",
      Seq("__side", "__p", "__m", "__b", "__pb", "__prefix"), left, right)
    val lCols = left.columns.toSeq
    val tsNum: Column => Column = left.schema(tsCol).dataType match {
      // NTZ casts to TimestampType under the session zone first (a
      // direct cast-to-double on NTZ is not defined); the bucketing only
      // needs a monotone map of ts, so any fixed zone reading works
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        c => unix_micros(c.cast(org.apache.spark.sql.types.TimestampType)).cast("double")
      case _ => c => c.cast("double")
    }
    // observed ts range over BOTH sides (two scalars; one union agg)
    val range = left.select(col(tsCol).as("t")).unionByName(right.select(col(tsCol).as("t")))
      .agg(min(tsNum(col("t"))), max(tsNum(col("t")))).head()
    if (range.isNullAt(0))
      return asofJoin(left, right, keys, tsCol, rightPayload, prefix) // no rows anywhere
    val (lo, hi) = (range.getDouble(0), range.getDouble(1))
    val width = math.max((hi - lo) / buckets, java.lang.Double.MIN_NORMAL)
    def bucketOf(c: Column): Column =
      least(lit(buckets - 1L), greatest(lit(0L), floor((tsNum(c) - lo) / width)))

    val pType = org.apache.spark.sql.types.StructType(rightPayload.map(p =>
      org.apache.spark.sql.types.StructField(p, right.schema(p).dataType)))
    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pType))
    val rAligned = right
      .where(keys.map(col(_).isNotNull).reduce(_ && _) && col(tsCol).isNotNull)
      .select(keys.map(col) :+ col(tsCol) :+
        struct(rightPayload.map(col): _*).as("__p"): _*)
      .withColumn("__side", lit(0))
      .select(lCols.map(c => if (keys.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__side"), col("__p")): _*)
    val u = lTagged.select(lCols.map(col) ++ Seq(col("__side"), col("__p")): _*)
      .unionByName(rAligned)
      .withColumn("__b", bucketOf(col(tsCol)))

    // 1. within-(key, bucket) carry — the hot key parallelizes here
    val wIn = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = u.withColumn("__m", last(col("__p"), ignoreNulls = true).over(wIn))

    // 2. one row per (key, bucket): its last right payload; exclusive
    //    prefix across buckets (partition ≤ `buckets` rows per key).
    //    The scan runs over EVERY (key, bucket) that has any row —
    //    a bucket holding only left rows still needs the prefix from
    //    earlier buckets flowing through it.
    val bucketsPresent = u.select((keys :+ "__b").map(col): _*).distinct()
    val lastPerBucket = within.where(col("__side") === 0)
      .groupBy((keys :+ "__b").map(col): _*)
      .agg(max_by(col("__p"), col(tsCol)).as("__pb"))
    val wScan = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixPerBucket = bucketsPresent
      .join(lastPerBucket, keys :+ "__b", "left")
      .withColumn("__prefix", last(col("__pb"), ignoreNulls = true).over(wScan))
      .select((keys :+ "__b").map(col) :+ col("__prefix"): _*)

    // 3. unmatched-in-bucket left rows take the bucket prefix; the join
    //    key (key, bucket) is fine-grained, so no hot-key partition
    within.where(col("__side") === 1)
      .join(prefixPerBucket, keys :+ "__b", "left")
      .withColumn("__m", coalesce(col("__m"), col("__prefix")))
      .select(lCols.map(col) ++
        rightPayload.map(p => col("__m").getField(p).as(s"$prefix$p")): _*)
  }
}
