package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style language-model fluency scoring for training-data
  * pipelines: train a stupid-backoff bigram LM (Brants et al. 2007,
  * "Large Language Models in Machine Translation" — the count-only
  * backoff used at web scale precisely because it needs no
  * normalization pass) on a small trusted TARGET corpus, then score
  * every raw document's transitions under it. CCNet (Wenzek et al.
  * 2020) uses exactly this shape — score under a target-domain LM,
  * filter/bucket by the score — to separate fluent prose from boilerplate
  * and gibberish. The reference engine has no text-quality surface;
  * this extends the quality-scoring family (`ops.TextOps`) the
  * extension brief calls for.
  *
  * Two score forms, same architecture (the [[Dsir]] pattern):
  *  - fixed-point MEAN TRANSITION PROBABILITY — every step integer
  *    (10⁶-scaled floor divisions), so the gate's DuckDB oracle is
  *    bit-exact by construction;
  *  - [[perplexity]] — the paper form exp(−1/n Σ ln p), floating
  *    point, for in-engine ranking; DsirSpec-style ordering pins in
  *    LmScoreSpec.
  *
  * Scale design (100 TB raw corpus): the model tables are bounded by
  * the TARGET corpus — small by design in a CCNet setup (a trusted
  * wiki-scale reference, not the crawl) — and both score joins
  * broadcast by default. The broadcast is an explicit HINT, so the
  * model must fit Spark's broadcast limits; for a target too large for
  * that, pass `broadcastModel = false` and the joins fall back to
  * shuffle-hash on the token key (one extra shuffle each — the honest
  * trade, not a silent driver OOM). Scoring's only other shuffle is
  * the per-document partial-agg sum; the single driver-side action is
  * the target token-count scalar (the same bounded-scalar stance as
  * `qTfidf`'s N).
  */
object LmScore {

  /** Trained model: transition probabilities, backoff unigrams, and the
    * target token total. `trans`: (w1, w2, p) with p = 10⁶·c₂ div c₁;
    * `uni`: (w, cu) raw unigram counts. */
  final case class Model(trans: DataFrame, uni: DataFrame, nTokens: Long)

  private def toks(textCol: String): Column = TextOps.tokens(lower(col(textCol)))

  /** (id, w1, w2) bigram transitions of each doc, with multiplicity. */
  private def bigramPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), toks(textCol).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
      .select(col(idCol),
        element_at(col("toks"), col("i")).as("w1"),
        element_at(col("toks"), col("i") + 1).as("w2"))

  /** Train the stupid-backoff bigram model from the target corpus: one
    * shuffle for bigram counts, one for context totals, one for
    * unigrams — all bounded by target vocabulary, not raw-corpus
    * size. */
  def train(target: DataFrame, textCol: String): Model = {
    val pairs = bigramPairs(target.select(lit(0L).as("_id"), col(textCol)),
      "_id", textCol)
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val trans = c2.join(c1, Seq("w1"))
      .select(col("w1"), col("w2"), expr("1000000L * c2 div c1").as("p"))
    val uni = target.select(explode(toks(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val n = target.select(explode(toks(textCol)).as("w")).count()
    Model(trans, uni, math.max(1L, n))
  }

  /** Per-token fixed-point transition probability under stupid backoff:
    * seen bigram → 10⁶·c₂ div c₁; unseen → 0.4·10⁶·cu(w₂) div N
    * (400000·cu div N — the canonical 0.4 backoff weight in fixed
    * point); OOV → 0. */
  private def tokenScore(nTokens: Long): Column =
    coalesce(col("p"), expr(s"400000L * cu div ${nTokens}L"), lit(0L))

  /** Score every document: (id, score, n_trans, mean_p) where score is
    * the Σ of fixed-point transition probabilities, and mean_p = score
    * div n_trans (0 for docs with < 2 tokens, which still get a row —
    * a filter that silently drops unscorable docs would bias the
    * pipeline toward longer text). */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String, m: Model,
      broadcastModel: Boolean = true, carry: Seq[String] = Nil): DataFrame = {
    // a carry column named like an output would be silently replaced
    // (mean_p) or turn ambiguous downstream (score/n_trans) — fail fast
    Reserved.requireAbsent("scoreDocs", Seq("score", "n_trans", "mean_p"),
      docs.select(col(idCol) +: carry.map(col): _*))
    def hint(df: DataFrame) = if (broadcastModel) broadcast(df) else df
    val scored = bigramPairs(docs, idCol, textCol)
      .join(hint(m.trans), Seq("w1", "w2"), "left")
      .join(hint(m.uni.withColumnRenamed("w", "w2")), Seq("w2"), "left")
      .select(col(idCol), tokenScore(m.nTokens).as("tp"))
      .groupBy(idCol)
      .agg(sum(col("tp")).as("score"), count(lit(1)).as("n_trans"))
    // totality re-attach: plain id projection, NO distinct — call sites
    // have unique ids, a dedup here would both add a corpus-wide
    // shuffle and silently diverge from the oracle (which emits one row
    // per duplicate if duplicates ever appear). `carry` columns (lang,
    // source, …) ride THIS join for free — callers needing them
    // downstream must not pay a second corpus-sized join.
    docs.select(col(idCol) +: carry.map(col): _*)
      .join(scored, Seq(idCol), "left")
      .select(col(idCol) +: carry.map(col) :+
        coalesce(col("score"), lit(0L)).as("score") :+
        coalesce(col("n_trans"), lit(0L)).as("n_trans"): _*)
      .withColumn("mean_p",
        when(col("n_trans") > 0, expr("score div n_trans")).otherwise(lit(0L)))
  }

  /** CCNet's selection step (Wenzek et al. 2020 §4.4): split the corpus
    * into head / middle / tail by LM-score terciles — downstream
    * training samples head-heavy. Buckets are computed per language
    * when `byCol` is set (CCNet buckets within each language's own
    * score distribution — absolute scores are not comparable across
    * languages).
    *
    * Two-phase, scale-sane: ONE aggregation computes the two cutoffs
    * (per group), then assignment is a broadcast join + row-local CASE
    * — never a global sort or a single-partition window over the
    * corpus. With `exact = true` the cutoffs use Spark's exact
    * `percentile` (aggregation state is a value→count map, and the
    * fixed-point score domain is bounded by construction — mean_p ∈
    * [0, 10⁶] — so the state cannot grow with corpus size; this is the
    * gate form, and its linear interpolation matches DuckDB's
    * `quantile_cont` bit-for-bit). With `exact = false` the cutoffs use
    * `approx_percentile` (mergeable sketch) — the form for unbounded
    * score domains. Higher score = more target-like = `head`; ties on
    * a cutoff go to the better bucket (>= comparisons), matching
    * CCNet's closed-above convention. */
  def pplBuckets(scored: DataFrame, scoreCol: String, byCol: Option[String],
      loFrac: Double = 1.0 / 3, hiFrac: Double = 2.0 / 3,
      exact: Boolean = true): DataFrame = {
    require(loFrac > 0 && hiFrac < 1 && loFrac <= hiFrac, "0 < lo <= hi < 1")
    Reserved.requireAbsent("pplBuckets", Seq("__t", "__t_lo", "__t_hi", "bucket"), scored)
    val fn = if (exact) "percentile" else "approx_percentile"
    val cuts = expr(s"$fn($scoreCol, array(${loFrac}d, ${hiFrac}d))").as("__t")
    val th = byCol match {
      case Some(g) => scored.groupBy(col(g)).agg(cuts)
      case None    => scored.agg(cuts)
    }
    val thCols = th.select((byCol.map(col).toSeq :+
      element_at(col("__t"), 1).as("__t_lo") :+
      element_at(col("__t"), 2).as("__t_hi")): _*)
    // LEFT join: a row whose byCol is NULL has no group distribution to
    // bucket it in — it must keep its row with bucket NULL (visible),
    // not vanish through an inner join, and not fall through the CASE's
    // null-comparison cracks into "tail" (a silent mislabel). A NULL
    // SCORE value gets the same treatment: no score, no bucket.
    val joined = byCol match {
      case Some(g) => scored.join(broadcast(thCols), Seq(g), "left")
      case None    => scored.crossJoin(broadcast(thCols))
    }
    joined.withColumn("bucket",
        when(col("__t_hi").isNull || col(scoreCol).isNull,
          lit(null).cast("string"))
          .when(col(scoreCol).cast("double") >= col("__t_hi"), "head")
          .when(col(scoreCol).cast("double") >= col("__t_lo"), "middle")
          .otherwise(lit("tail")))
      .drop("__t_lo", "__t_hi")
  }

  // ---- n-gram generalization (Brants et al. 2007 use 5-grams;
  // CCNet's KenLM is 5-gram too; the bigram surface above is the
  // oracle-checked default and stays byte-identical) ----

  /** n-gram stupid-backoff model: `orders(m)` for m = 2..n holds
    * (ctx, w, cm, cctx) — the m-gram count and its (m−1)-gram context
    * count, ctx space-joined; `uni` and `nTokens` as in [[Model]].
    * Counts stay RAW (ratios + the 0.4^k backoff scale are applied at
    * score time as one floor division per level), because pre-dividing
    * per level and then scaling would round twice and break the exact
    * integer form the oracle replays. */
  final case class NModel(orders: Map[Int, DataFrame], uni: DataFrame,
    nTokens: Long, n: Int)

  /** Position stream: one row per scoring position i (1-based, i ≥ 2)
    * with the token at i and the space-joined m−1-gram contexts for
    * every order. Slices/joins are all codegen'd builtins; `toks` is a
    * materialized attribute (the [[Dsir]] projection-boundary rule). */
  private def positions(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val base = docs.select(col(idCol), toks(textCol).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(2), size(col("toks")))).as("i"))
      .select(col(idCol) +: col("toks") +: col("i") +:
        element_at(col("toks"), col("i")).as("w") +:
        (2 to n).map { m =>
          when(col("i") >= m,
            concat_ws(" ", slice(col("toks"), col("i") - (m - 1), lit(m - 1))))
            .as(s"ctx$m")
        }: _*)
    base.drop("toks")
  }

  /** Train the order-`n` model: for each m, ONE m-gram aggregation plus
    * a context re-aggregation — all bounded by target-corpus
    * vocabulary. `trainN(…, n = 2)` carries the same statistics as
    * [[train]] (LmScoreSpec pins score equality). */
  def trainN(target: DataFrame, textCol: String, n: Int): NModel = {
    require(n >= 2, "order must be >= 2")
    require(n <= 7, "0.4^k backoff scale stays integer-exact only to k = 6")
    val tagged = target.select(lit(0L).as("_id"), col(textCol))
    val pos = positions(tagged, "_id", textCol, n)
    val orders = (2 to n).map { m =>
      val cm = pos.where(col(s"ctx$m").isNotNull)
        .groupBy(col(s"ctx$m").as("ctx"), col("w"))
        .agg(count(lit(1)).as("cm"))
      val cctx = cm.groupBy("ctx").agg(sum("cm").as("cctx"))
      m -> cm.join(cctx, Seq("ctx"))
    }.toMap
    val uni = tagged.select(explode(toks(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    // the token total IS Σcu — deriving it from the unigram aggregation
    // avoids a second tokenize+explode pass over the target corpus
    // (the bigram train() predates this and keeps its oracle-checked
    // shape)
    val nTok = Option(uni.agg(sum("cu")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    NModel(orders, uni, math.max(1L, nTok), n)
  }

  /** 10⁶·0.4^k exactly (400000, 160000, 64000, …) — integer for k ≤ 6,
    * which `trainN`'s n ≤ 7 guard guarantees. */
  private def backoffScale(k: Int): Long =
    (0 until k).foldLeft(1000000L)((s, _) => s * 2 / 5)

  /** Score documents under an n-gram stupid-backoff model: each
    * position starts at its LONGEST AVAILABLE context (min(n−1, i−1)
    * words — doc starts score with what exists, unpenalized, the
    * standard treatment) and backs off 0.4 per unseen level down to
    * the unigram, OOV → 0. All fixed-point floor divisions, so
    * `scoreDocsN` under an n = 2 model is BYTE-IDENTICAL to
    * [[scoreDocs]] (LmScoreSpec pins it). One left join per order
    * (broadcast by default — `broadcastModel = false` is the honest
    * beyond-broadcast fallback) + the per-doc sum. */
  def scoreDocsN(docs: DataFrame, idCol: String, textCol: String,
      m: NModel, broadcastModel: Boolean = true,
      carry: Seq[String] = Nil): DataFrame = {
    Reserved.requireAbsent("scoreDocsN", Seq("score", "n_trans", "mean_p"),
      docs.select(col(idCol) +: carry.map(col): _*))
    def hint(df: DataFrame) = if (broadcastModel) broadcast(df) else df
    var stream = positions(docs, idCol, textCol, m.n)
    for (o <- 2 to m.n) {
      val tbl = m.orders(o)
        .select(col("ctx").as(s"ctx$o"), col("w"),
          col("cm").as(s"cm$o"), col("cctx").as(s"cctx$o"))
      stream = stream.join(hint(tbl), Seq(s"ctx$o", "w"), "left")
    }
    stream = stream.join(hint(m.uni), Seq("w"), "left")
    // One SQL CASE, longest level first: avail = min(i, n) is the
    // longest level whose context exists at this position; the used
    // level o pays 0.4^(avail − o), the unigram terminal pays
    // 0.4^(avail − 1), OOV scores 0. Every arithmetic step is an
    // integer `div` — double division would round differently and
    // break oracle exactness.
    val availSql = s"least(i, ${m.n})"
    def scaleSql(o: Int): String =
      s"(CASE $availSql " +
        (o to m.n).map(a => s"WHEN $a THEN ${backoffScale(a - o)}L").mkString(" ") +
        " END)"
    val uniScaleSql =
      s"(CASE $availSql " +
        (2 to m.n).map(a => s"WHEN $a THEN ${backoffScale(a - 1)}L").mkString(" ") +
        " END)"
    val tpSql = "CASE " +
      (m.n to 2 by -1).map(o =>
        s"WHEN $availSql >= $o AND cm$o IS NOT NULL " +
          s"THEN ${scaleSql(o)} * cm$o div cctx$o ").mkString +
      s"WHEN cu IS NOT NULL THEN $uniScaleSql * cu div ${m.nTokens}L " +
      "ELSE 0L END"
    val scored = stream
      .select(col(idCol), expr(tpSql).as("tp"))
      .groupBy(idCol)
      .agg(sum(col("tp")).as("score"), count(lit(1)).as("n_trans"))
    docs.select(col(idCol) +: carry.map(col): _*)
      .join(scored, Seq(idCol), "left")
      .select(col(idCol) +: carry.map(col) :+
        coalesce(col("score"), lit(0L)).as("score") :+
        coalesce(col("n_trans"), lit(0L)).as("n_trans"): _*)
      .withColumn("mean_p",
        when(col("n_trans") > 0, expr("score div n_trans")).otherwise(lit(0L)))
  }

  /** The paper form: perplexity exp(−1/n Σ ln p) with p the (unscaled)
    * stupid-backoff probability, floored at 10⁻⁹ so OOV transitions
    * penalize hard instead of producing ±∞. Floating point — for
    * in-engine ranking/filtering; the gate uses the integer form. */
  def perplexity(docs: DataFrame, idCol: String, textCol: String, m: Model,
      broadcastModel: Boolean = true): DataFrame = {
    def hint(df: DataFrame) = if (broadcastModel) broadcast(df) else df
    bigramPairs(docs, idCol, textCol)
      .join(hint(m.trans), Seq("w1", "w2"), "left")
      .join(hint(m.uni.withColumnRenamed("w", "w2")), Seq("w2"), "left")
      .select(col(idCol),
        greatest(tokenScore(m.nTokens).cast("double") / 1e6, lit(1e-9)).as("p"))
      .groupBy(idCol)
      .agg(exp(-avg(log(col("p")))).as("perplexity"),
        count(lit(1)).as("n_trans"))
  }
}
