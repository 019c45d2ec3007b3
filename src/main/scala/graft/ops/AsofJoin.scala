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
    * @return all left columns + `asof_<payload>` columns (null where
    *   no right row precedes the left row) */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    require(rightPayload.nonEmpty, "no right payload columns requested")
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

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.select(lCols.map(col) ++ Seq(col("__side"), col("__p")): _*)
      .unionByName(rAligned)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(lCols.map(col) ++
        rightPayload.map(p => col("__m").getField(p).as(s"$prefix$p")): _*)
  }
}
