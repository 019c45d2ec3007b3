package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Budget-bounded selection — "take the best documents until the token
  * budget is spent", the final cut of a curation pipeline: rank the
  * corpus by a priority (quality-classifier score, DSIR importance
  * weight, fluency), then keep the maximal prefix of that ranking
  * whose total cost fits the training budget.
  *
  * Scale design: the global ranked prefix sum is
  * [[Packing.runningTokens]] — the two-phase distributed prefix sum
  * (range-partition on the sort key → per-partition totals → driver
  * exclusive offsets → within-partition windows), never a
  * single-reducer global window. The budget cut is then one per-row
  * predicate; no extra shuffle.
  */
object Selection {

  /** Keep the maximal budget-fitting prefix of the ranking given by
    * `sortExprs`: a row survives iff its INCLUSIVE running `costCol`
    * total (in that global order) is ≤ `budget`. With non-negative
    * costs the running total is monotone, so this is exactly the
    * strict rank prefix — selection never "skips" an oversized doc to
    * admit a later one (that would make membership depend on
    * everything before it in a data-dependent way; the strict prefix
    * keeps the cut reproducible and explainable: "the top N_q docs by
    * quality, totalling ≤ budget tokens").
    *
    * `sortExprs` must be a TOTAL order (tie-break on the id column)
    * or the cut is nondeterministic at the boundary. Output keeps the
    * input columns plus `tokens_before` (the exclusive prefix — what
    * the budget had already spent when this doc was admitted).
    *
    * @param numPartitions contiguous slices for the prefix sum;
    *   defaults to the session's shuffle parallelism. */
  def selectByBudget(docs: DataFrame, sortExprs: Seq[Column],
      costCol: String, budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    Packing.runningTokens(docs, sortExprs, costCol, numPartitions, None)
      .where(col("tokens_before") + col(costCol) <= budget)
  }
}
