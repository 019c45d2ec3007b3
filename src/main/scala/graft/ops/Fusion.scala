package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranking
  * ([[Bm25]]) with a semantic one ([[Similarity]]/[[Ivf]]/[[IvfPq]])
  * is how a curation pipeline actually searches a corpus (pure BM25
  * misses paraphrases, pure ANN misses rare literals; the fused list
  * is what decontamination / eval-mining reads).
  *
  * Reciprocal Rank Fusion (Cormack, Clarke & Büttner 2009):
  * rrf(d) = Σ_r 1/(k + rank_r(d)) over the rankings that contain d.
  * Only RANKS cross the fusion boundary — the input scores (floats of
  * wildly different scales) never mix, which is what makes RRF robust
  * and, here, bit-deterministic: 1/(k + integer) is the same double on
  * every engine, and the fused sum is a fixed left-to-right chain of
  * coalesced terms, not a data-ordered aggregate.
  *
  * Scale: inputs are top-N lists (bounded by construction — the heavy
  * lifting already happened inside the retrieval operators), so the
  * fusion joins are tiny; at cluster scale they broadcast.
  */
object Fusion {

  /** Fuse named rankings by RRF. Each input frame carries `idCol` and
    * `rankCol` (1-based). Output: idCol, one nullable `rank_<name>`
    * per input (NULL = absent from that ranking), and `rrf`.
    * Callers order by (rrf desc, id) and cut to their k. */
  def rrf(rankings: Seq[(String, DataFrame)], idCol: String = "id",
      rankCol: String = "rank", kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "ranking names must be unique — they become rank_<name> columns")
    val prepared = rankings.map { case (name, df) =>
      df.select(col(idCol), col(rankCol).cast("long").as(s"rank_$name"))
    }
    val joined = prepared.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(kRrf.toDouble) + col(s"rank_$name")), lit(0.0))
    }.reduce(_ + _)
    joined.withColumn("rrf", score)
  }
}
