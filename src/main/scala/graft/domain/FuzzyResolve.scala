package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Opt-in fuzzy dimension-name resolution for the domain ingests (J5).
  *
  * The reference resolves file names against the province/district
  * dims with an exact dict lookup
  * (`/root/reference/backend/app/utils.py:505-519`), so a misspelled
  * district name silently drops its rows. The engine keeps that exact
  * behavior at the default `fuzzyResolve = 0`; at d > 0 the ingests
  * first run this KEY CORRECTION pass — rewrite each file key that has
  * NO exact catalog match to its nearest catalog key within d edits —
  * and then the unchanged exact pipeline (joins, keep-first windows,
  * fill quirks) resolves the corrected keys like any other row. The
  * correction never touches keys with an exact match, so well-spelled
  * data is byte-identical at every d, and d = 0 is the identity.
  *
  * Matching is [[graft.ops.FuzzyJoin.join]] (q-gram prefix filtering,
  * never all-pairs) over the DISTINCT unmatched keys × the catalog —
  * both sides are dim-scale here, but the same call holds at a
  * 100 TB fact file because only distinct names enter the join and
  * the correction re-attaches by broadcast. Ties (two catalog keys at
  * equal distance) break on the lexicographically smallest catalog
  * key — deterministic across runs and engines.
  */
object FuzzyResolve {

  /** Rewrite `df.keyCol` values that miss `catalogKeys` (single column
    * `k`) exactly to their nearest catalog key within `maxDist` edits.
    * Null keys, exact matches, and keys with nothing in range pass
    * through unchanged. `maxDist <= 0` returns `df` as-is. */
  def correct(df: DataFrame, keyCol: String, catalogKeys: DataFrame,
      maxDist: Int): DataFrame = {
    if (maxDist <= 0) return df
    val keys = catalogKeys.select(col("k")).where(col("k").isNotNull).distinct()
    // only the keys the exact path would drop enter the fuzzy join
    val dirty = df.select(col(keyCol).as("str"))
      .where(col("str").isNotNull).distinct()
      .join(keys.select(col("k").as("str")), Seq("str"), "left_anti")
    // the distinct string itself is the join id: unique by
    // construction and DETERMINISTIC across plan re-evaluations.
    // (monotonically_increasing_id over this shuffled frame is not —
    // FuzzyJoin.join evaluates its inputs in several plan branches,
    // and a task retry or different shuffle-fetch order could remap
    // id→string between them, silently mislabeling corrections.)
    // FuzzyJoin's id contract is uniqueness + equality, not a type.
    val left = dirty.select(col("str").as("id"), col("str"))
    val right = keys.select(col("k").as("id"), col("k").as("str"))
    val best = graft.ops.FuzzyJoin.join(left, right, maxDist)
      .withColumn("__rn", row_number().over(
        Window.partitionBy("id1").orderBy(col("dist"), col("id2"))))
      .where(col("__rn") === 1)
      .select(col("id1").as(keyCol), col("id2").as("__canon"))
    df.join(broadcast(best), Seq(keyCol), "left")
      .withColumn(keyCol, coalesce(col("__canon"), col(keyCol)))
      .drop("__canon")
  }

  /** Two-key variant for paired resolution ([[RiskIngest]]): province
    * and district correct JOINTLY against the catalog's real
    * (province, district) combinations — the pair shares one edit
    * budget and can only land on a combination that exists, never on
    * a cross of two independently-nearest names. Keys are paired with
    * U+0000 separator (outside any real name alphabet, and distinct
    * from FuzzyJoin's U+0001 gram padding; the catalog string carries
    * exactly one, so a match is always a real pair). Rows
    * where either key is null pass through unchanged (the exact path
    * drops them anyway). */
  def correctPair(df: DataFrame, keyCol1: String, keyCol2: String,
      catalogPairs: DataFrame, maxDist: Int): DataFrame = {
    if (maxDist <= 0) return df
    val sep = "\u0000"
    def paired(c1: Column, c2: Column): Column = concat(c1, lit(sep), c2)
    val cat = catalogPairs
      .where(col("k1").isNotNull && col("k2").isNotNull)
      .select(paired(col("k1"), col("k2")).as("k"))
    val keyed = df.withColumn("__pair", paired(col(keyCol1), col(keyCol2)))
    correct(keyed, "__pair", cat, maxDist)
      .withColumn(keyCol1, when(col("__pair").isNotNull,
        substring_index(col("__pair"), sep, 1)).otherwise(col(keyCol1)))
      .withColumn(keyCol2, when(col("__pair").isNotNull,
        substring_index(col("__pair"), sep, -1)).otherwise(col(keyCol2)))
      .drop("__pair")
  }
}
