package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.ops.{Bm25, Fusion, Quality, Similarity, TextOps}

/** Corpus search + rule-battery quality gates:
  *
  *   - [[qBm25]] — BM25 keyword retrieval over the documents table
  *     (inverted-index build + top-k scoring, [[graft.ops.Bm25]]);
  *   - [[qBm25Index]] — the PERSISTED index lifecycle: two disjoint
  *     appends fold into one index, then the query reads only its
  *     terms' postings; same oracle as [[qBm25]], which proves
  *     fold-in ≡ full rebuild (the incremental-dedup gate pattern);
  *   - [[qGopher]] — the Gopher doc-level rule battery as named
  *     boolean columns ([[graft.ops.Quality.gopherRules]]);
  *   - [[qC4Lines]] — C4 line-level cleaning as a pure per-row
  *     transform ([[graft.ops.Quality.c4CleanDoc]]); documents have no
  *     newlines, so the gate synthesizes a deterministic multi-line
  *     page around each doc's text (the qBoilerplate device) that both
  *     engines replay.
  *
  * Oracle-parity notes: the BM25 score is irrational (ln), so each
  * per-term contribution quantizes to decimal(28,12) before the
  * per-doc sum (order-independent — `Q.sumq` stance) and BOTH engines
  * spell the arithmetic with the same operation tree and the same
  * spelled-out constants (`1.2 + 1.0`, `1.0 - 0.75`) so the doubles
  * agree bit-for-bit; ranking orders by the ROUNDED score (+ doc_id)
  * so sub-round noise can never reorder the top-k. The rule gates
  * output only booleans/longs — integer counts with one final
  * comparison per rule.
  */
object SearchQueries {

  /** The shared query-term set (terms that really occur in the corpus
    * vocabulary) and the shared top-k. */
  private val Terms = Seq("spark", "hash", "join", "vector", "scan")
  private val K = 20

  private def ranked(scored: DataFrame): DataFrame =
    scored
      .withColumn("score", round(col("score"), 6))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(K)
      .select(col("doc_id"), col("n_terms"), col("score"))

  def qBm25(s: SparkSession, dir: String): DataFrame =
    // one-shot scoring (r18): totals from a doc-level aggregate,
    // postings term-filtered BEFORE their exchange — the full-corpus
    // postings shuffle + persist the old buildStats path paid per rep
    // is gone; Bm25Spec pins scoreTerms ≡ score(buildStats(docs))
    ranked(Bm25.scoreTerms(Tables.documents(s, dir), Terms))
      .localCheckpoint(true)

  def qBm25Index(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Q.withTempIndex("graft-bm25") { idx =>
      // two doc-disjoint appends (every third doc folds in second) —
      // the oracle scores the FULL corpus, so green means the summed
      // meta deltas + appended postings equal a single build
      Phases.phase("build") {
        Bm25.appendIndex(docs.where(col("doc_id") % 3 =!= 1), idx)
        Bm25.appendIndex(docs.where(col("doc_id") % 3 === 1), idx)
      }
      ranked(Bm25.topKIndexed(s, idx, Terms, K)).localCheckpoint(true)
    }
  }

  /** The DELETE/takedown lifecycle verb, oracle-gated: build the
    * persisted index over the FULL corpus, [[graft.ops.Bm25
    * .removeDocs]] every third doc, query — the oracle scores a
    * one-shot build over the SURVIVORS (the q_incremental_append
    * device inverted). Green proves the negative meta delta + postings
    * strip leave stats and scores bit-identical to never having
    * indexed the removed docs: N/avgdl from the summed meta, df from
    * the pruned postings. */
  def qIndexDelete(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Q.withTempIndex("graft-bm25del") { idx =>
      Phases.phase("build") {
        Bm25.appendIndex(docs, idx)
        Bm25.removeDocs(s, idx,
          docs.where(col("doc_id") % 3 === 1).select(col("doc_id")),
          removeId = Some(0L))
      }
      ranked(Bm25.topKIndexed(s, idx, Terms, K)).localCheckpoint(true)
    }
  }

  def qGopher(s: SparkSession, dir: String): DataFrame = {
    val rules = Quality.gopherRules(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id") +: rules.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
  }

  /** Deterministic multi-line page around each doc's text: a nav line
    * (no terminal punctuation → line-dropped), the doc text, a kept
    * closing line, and three doc_id-parameterized variants exercising
    * the javascript / curly-brace / lorem-ipsum rules. */
  private def synthPage = concat_ws("\n",
    concat(lit("NAV "), col("source"), lit(" home login")),
    col("text"),
    lit("Read the full story here."),
    when(col("doc_id") % 7 === 0, lit("Enable javascript to continue."))
      .otherwise(lit("Contact our editorial team today.")),
    when(col("doc_id") % 5 === 0, lit("function() { return 1; }"))
      .otherwise(lit("All rights reserved worldwide.")),
    when(col("doc_id") % 13 === 0, lit("Lorem ipsum dolor sit amet."))
      .otherwise(lit("Thanks for reading this article.")))

  def qC4Lines(s: SparkSession, dir: String): DataFrame = {
    val c = Quality.c4CleanDoc(synthPage)
    Tables.documents(s, dir)
      .select(col("doc_id"), c.as("c"))
      .select(col("doc_id"),
        col("c.n_lines").as("n_lines"),
        col("c.n_kept").as("n_kept"),
        col("c.keep").as("keep"),
        md5(col("c.clean_text")).as("clean_md5"))
      .orderBy("doc_id")
  }

  /** Hybrid retrieval: BM25 top-50 (lexical) ∪ brute-force cosine
    * top-50 around vector 0 (semantic; the verification baseline — the
    * production arm is `Similarity.lshTopK`/IVF), fused by RRF.
    * Determinism: only INTEGER ranks cross the fusion boundary. The
    * lexical arm cuts and ranks on (round(score, 6) desc, doc_id) — a
    * distributed TakeOrderedAndProject, then row_number over the
    * bounded 50-row list; the semantic arm reuses the q_ann_topk
    * ranking convention; membership in the final 20 is decided by the
    * unrounded rrf (bit-identical in both engines — rational
    * arithmetic on integers), final display order by the rounded
    * value. */
  /** The full quality chain composed end-to-end — Gopher doc-level
    * keep on the RAW text → C4 line-level cleaning of the synthesized
    * page → composite [[TextOps.qualityScore]] of the CLEANED text —
    * aggregated per language (the q_prep_pipeline composition
    * pattern for the rule-battery family). Every stage is a codegen'd
    * per-row expression, so the whole chain is one scan + one shuffle
    * (the final groupBy); quality scores are exact binary quarters
    * (k/4), so their sum is order-independent on both engines. */
  def qQualityPipeline(s: SparkSession, dir: String): DataFrame = {
    val gopherKeep = Quality.gopherRules(col("text")).toMap.apply("keep")
    val c = Quality.c4CleanDoc(synthPage)
    Tables.documents(s, dir)
      .where(gopherKeep)
      // ComputeOnce barriers (r18): the keep-filter, clean_text
      // extraction, quality score and the aggregate all re-reference
      // these two expensive per-row chains — pushdown/collapse inlined
      // the C4 line battery and the quality score into every consumer
      // (25 split-tokenizations per row in the before-plan). Each now
      // evaluates once per row.
      .withColumn("c", graft.expr.ComputeOnce.once(c))
      .where(col("c.keep"))
      .withColumn("clean", col("c.clean_text"))
      .withColumn("q", graft.expr.ComputeOnce.once(TextOps.qualityScore(col("clean"))))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("q") >= 0.75, 1L).otherwise(0L)).as("n_hq"),
        sum(col("q")).as("sum_q"),
        sum(TextOps.tokenCount(col("clean")).cast("long")).as("n_tok"))
      .orderBy("lang")
  }

  /** The lexical arm: BM25 top-50 cut + ranked on (round(score,6)
    * desc, doc_id) — a distributed TakeOrderedAndProject, then
    * row_number over the bounded 50-row list. */
  private[graft] def lexicalArm(stats: Bm25.Stats): DataFrame =
    lexicalArmFrom(Bm25.score(stats, Terms))

  /** The same arm over ANY (doc_id, n_terms, score) frame — the gate
    * feeds it [[Bm25.scoreTerms]] (one-shot, no index materialized);
    * HybridRetrievalSpec feeds it the Stats path and pins both equal. */
  private[graft] def lexicalArmFrom(scored: DataFrame): DataFrame =
    scored
      .withColumn("score_r", round(col("score"), 6))
      .orderBy(col("score_r").desc, col("doc_id")).limit(50)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score_r").desc, col("doc_id"))))
      .select(col("doc_id").as("id"), col("rank"))

  /** RRF fusion of the two (already rank-only, already ≤50-row) arms —
    * shared by the gate and the production-ANN equivalence spec, so
    * the fusion semantics cannot drift between them. */
  private[graft] def fuseArms(lex: DataFrame, sem: DataFrame): DataFrame =
    Fusion.rrf(Seq("bm25" -> lex, "cos" -> sem))
      .orderBy(col("rrf").desc, col("id")).limit(20)
      .select(col("id"), col("rank_bm25"), col("rank_cos"),
        round(col("rrf"), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("id"))

  /** The un-checkpointed hybrid frame (gate = this + checkpoint). */
  private def hybridFused(s: SparkSession, dir: String,
      lexScored: DataFrame): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val sem = Similarity.bruteForceTopK(emb,
        emb.where(col("id") === 0).select(col("id").as("qid"), col("embedding")),
        k = 50)
      .select(col("id"), col("rank"))
    fuseArms(lexicalArmFrom(lexScored), sem)
  }

  def qHybridRrf(s: SparkSession, dir: String): DataFrame =
    // lexical arm on the one-shot scoreTerms path (the qBm25 r18 move)
    hybridFused(s, dir, Bm25.scoreTerms(Tables.documents(s, dir), Terms))
      .localCheckpoint(true)

  /** Plan-audit views (PLANS.md + PlanAuditSpec): the search gates
    * checkpoint their results, which truncates the plans PlanDump and
    * the audit would read to a LogicalRDD stub — so expose the SAME
    * frames un-checkpointed, as formatted explain strings. The indexed
    * view needs real files for partition pruning to show, so it builds
    * a temp index and explains inside its lifetime. */
  def planViews(s: SparkSession, dir: String): Seq[(String, String)] = {
    import org.apache.spark.sql.execution.ExplainMode
    def fmt(df: DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val docs = Tables.documents(s, dir)
    // ONE scoreTerms frame serves both views: its construction runs an
    // eager totals action (a corpus tokenize pass), so building it
    // twice paid two full scans just to format explain output (ADVICE
    // r18)
    val scored = Bm25.scoreTerms(docs, Terms)
    val bm25View = fmt(ranked(scored))
    val hybridView = fmt(hybridFused(s, dir, scored))
    var indexedView: String = ""
    Q.withTempIndex("graft-bm25plan") { idx =>
      Bm25.appendIndex(Tables.documents(s, dir), idx)
      indexedView = fmt(Bm25.topKIndexed(s, idx, Terms, K))
      s.emptyDataFrame
    }
    Seq("q_bm25" -> bm25View, "q_bm25_index" -> indexedView,
      "q_hybrid_rrf" -> hybridView)
  }

  val all: Map[String, Q.QueryFn] = Map(
    "q_bm25" -> (qBm25 _),
    "q_bm25_index" -> (qBm25Index _),
    "q_index_delete" -> (qIndexDelete _),
    "q_gopher" -> (qGopher _),
    "q_c4_lines" -> (qC4Lines _),
    "q_hybrid_rrf" -> (qHybridRrf _),
    "q_quality_pipeline" -> (qQualityPipeline _),
  )

  /** Index-LIFECYCLE gates of this family: builders that construct or
    * mutate a persisted index eagerly (wrapped in
    * [[Phases.phase]]("build")) before probing it. Declared HERE, next
    * to the registration and the wiring, and enumerated by PhasesSpec
    * via [[graft.SparkEntry.lifecycleQueries]] — a gate added to this
    * set without build wiring (or vice versa, or with a typo'd name)
    * fails that spec loudly. */
  val lifecycle: Set[String] = Set("q_bm25_index", "q_index_delete")

  /** Shared BM25 oracle body: the full-corpus score, written once —
    * both gates must equal it. Constants are spelled as arithmetic
    * (`1.2 + 1.0`) so DuckDB performs the same IEEE ops the Spark plan
    * compiled from `lit(k1 + 1.0)`. */
  private val bm25Sql =
    """WITH tok AS (SELECT doc_id, t.term AS term
      |  FROM documents, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t(term)),
      |p AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM p GROUP BY doc_id),
      |tot AS (SELECT cast(count(*) AS bigint) AS n, cast(sum(dl) AS bigint) AS s FROM dl),
      |st AS (SELECT n, cast(s AS double) / cast(n AS double) AS avgdl FROM tot),
      |q AS (SELECT * FROM p WHERE term IN ('spark','hash','join','vector','scan')),
      |qdf AS (SELECT term, count(*) AS df FROM q GROUP BY term),
      |sc AS (SELECT q.doc_id,
      |    cast(ln(1.0 + (cast((SELECT n FROM st) AS double) - df + 0.5) / (df + 0.5))
      |         * (tf * (1.2 + 1.0))
      |         / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / (SELECT avgdl FROM st)))
      |      AS decimal(28,12)) AS c
      |  FROM q JOIN qdf USING (term) JOIN dl USING (doc_id))
      |SELECT doc_id, cast(count(*) AS bigint) AS n_terms,
      |  round(cast(sum(c) AS double), 6) AS score
      |FROM sc GROUP BY doc_id
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_bm25" -> bm25Sql,
    "q_bm25_index" -> bm25Sql,
    // the survivors' corpus: identical scoring SQL over the post-
    // takedown document set — green means removeDocs ≡ never indexed.
    // The require pins that the splice actually happened: a future
    // rewording of bm25Sql (alias, line break before the comma) would
    // otherwise silently yield an oracle over the FULL corpus and the
    // takedown gate would stop testing what it claims.
    "q_index_delete" -> {
      val spliced = bm25Sql.replace("FROM documents,",
        "FROM (SELECT * FROM documents WHERE doc_id % 3 <> 1) AS documents,")
      require(spliced != bm25Sql,
        "q_index_delete oracle: survivors splice did not match bm25Sql — " +
          "its FROM clause was reworded; update the replace target")
      spliced
    },
    "q_hybrid_rrf" ->
      """WITH tok AS (SELECT doc_id, t.term AS term
        |  FROM documents, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t(term)),
        |p AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM p GROUP BY doc_id),
        |tot AS (SELECT cast(count(*) AS bigint) AS n, cast(sum(dl) AS bigint) AS s FROM dl),
        |st AS (SELECT n, cast(s AS double) / cast(n AS double) AS avgdl FROM tot),
        |q AS (SELECT * FROM p WHERE term IN ('spark','hash','join','vector','scan')),
        |qdf AS (SELECT term, count(*) AS df FROM q GROUP BY term),
        |sc AS (SELECT q.doc_id,
        |    cast(ln(1.0 + (cast((SELECT n FROM st) AS double) - df + 0.5) / (df + 0.5))
        |         * (tf * (1.2 + 1.0))
        |         / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / (SELECT avgdl FROM st)))
        |      AS decimal(28,12)) AS c
        |  FROM q JOIN qdf USING (term) JOIN dl USING (doc_id)),
        |bscore AS (SELECT doc_id, round(cast(sum(c) AS double), 6) AS score_r
        |  FROM sc GROUP BY doc_id),
        |lex AS (SELECT doc_id AS id,
        |    row_number() OVER (ORDER BY score_r DESC, doc_id) AS rank_bm25
        |  FROM bscore QUALIFY rank_bm25 <= 50),
        |e AS (SELECT vec_id, list_transform(embedding, x -> cast(x as double)) AS v FROM embeddings),
        |cp AS (SELECT c.vec_id AS id,
        |  list_sum(list_transform(list_zip(c.v, q.v), t -> t[1] * t[2])) AS dotp,
        |  sqrt(list_sum(list_transform(c.v, x -> x * x))) *
        |  sqrt(list_sum(list_transform(q.v, x -> x * x))) AS den
        | FROM e q JOIN e c ON q.vec_id = 0 AND c.vec_id <> q.vec_id),
        |cs AS (SELECT id, CASE WHEN den > 0 THEN dotp / den ELSE 0.0 END AS cosine FROM cp),
        |sem AS (SELECT id, row_number() OVER (ORDER BY cosine DESC, id) AS rank_cos
        |  FROM cs QUALIFY rank_cos <= 50),
        |fused AS (SELECT coalesce(lex.id, sem.id) AS id,
        |    cast(rank_bm25 AS bigint) AS rank_bm25, cast(rank_cos AS bigint) AS rank_cos,
        |    coalesce(1.0 / (60.0 + rank_bm25), 0.0) + coalesce(1.0 / (60.0 + rank_cos), 0.0) AS rrf
        |  FROM lex FULL OUTER JOIN sem ON lex.id = sem.id),
        |top AS (SELECT id, rank_bm25, rank_cos, rrf,
        |    row_number() OVER (ORDER BY rrf DESC, id) AS rn FROM fused)
        |SELECT id, rank_bm25, rank_cos, round(rrf, 6) AS rrf
        |FROM top WHERE rn <= 20 ORDER BY round(rrf, 6) DESC, id""".stripMargin,
    "q_gopher" ->
      """WITH w AS (SELECT doc_id, coalesce(text, '') AS t,
        |  regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS ws FROM documents),
        |r AS (SELECT doc_id, t, ws, len(ws) AS n FROM w)
        |SELECT doc_id,
        |  n BETWEEN 50 AND 100000 AS wc_ok,
        |  (cast(list_sum(list_transform(ws, x -> length(x))) AS double) / cast(n AS double))
        |    BETWEEN 3.0 AND 10.0 AS mwl_ok,
        |  cast(len(regexp_extract_all(t, '#|\.\.\.|…')) AS double) / cast(n AS double) <= 0.1 AS sym_ok,
        |  cast(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS double) / cast(n AS double) >= 0.8 AS alpha_ok,
        |  len(list_intersect(list_transform(ws, x -> lower(x)),
        |    ['the','a','an','of','to','and','in','is','it','that',
        |     'for','on','with','as','at','by','this','was','are','be'])) >= 2 AS stop_ok,
        |  (n BETWEEN 50 AND 100000)
        |    AND ((cast(list_sum(list_transform(ws, x -> length(x))) AS double) / cast(n AS double)) BETWEEN 3.0 AND 10.0)
        |    AND (cast(len(regexp_extract_all(t, '#|\.\.\.|…')) AS double) / cast(n AS double) <= 0.1)
        |    AND (cast(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS double) / cast(n AS double) >= 0.8)
        |    AND (len(list_intersect(list_transform(ws, x -> lower(x)),
        |      ['the','a','an','of','to','and','in','is','it','that',
        |       'for','on','with','as','at','by','this','was','are','be'])) >= 2) AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_c4_lines" ->
      """WITH d AS (SELECT doc_id, concat_ws(chr(10),
        |    'NAV ' || source || ' home login',
        |    text,
        |    'Read the full story here.',
        |    CASE WHEN doc_id % 7 = 0 THEN 'Enable javascript to continue.'
        |         ELSE 'Contact our editorial team today.' END,
        |    CASE WHEN doc_id % 5 = 0 THEN 'function() { return 1; }'
        |         ELSE 'All rights reserved worldwide.' END,
        |    CASE WHEN doc_id % 13 = 0 THEN 'Lorem ipsum dolor sit amet.'
        |         ELSE 'Thanks for reading this article.' END) AS t FROM documents),
        |l AS (SELECT doc_id, t, string_split(t, chr(10)) AS lines FROM d),
        |k AS (SELECT doc_id, t, lines,
        |  list_filter(lines, x -> regexp_matches(x, '[.!?"'']$')
        |    AND len(regexp_split_to_array(trim(x), '\s+')) >= 3
        |    AND NOT contains(lower(x), 'javascript')
        |    AND NOT contains(x, '{')) AS kept FROM l)
        |SELECT doc_id,
        |  cast(len(lines) AS bigint) AS n_lines,
        |  cast(len(kept) AS bigint) AS n_kept,
        |  (len(kept) >= 3 AND NOT contains(lower(t), 'lorem ipsum')) AS keep,
        |  md5(array_to_string(kept, chr(10))) AS clean_md5
        |FROM k ORDER BY doc_id""".stripMargin,
    "q_quality_pipeline" ->
      s"""WITH w AS (SELECT doc_id, lang, source, coalesce(text, '') AS t,
        |  regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS ws FROM documents),
        |r AS (SELECT doc_id, lang, source, t, ws, len(ws) AS n FROM w),
        |g AS (SELECT doc_id, lang, source, t FROM r WHERE
        |  (n BETWEEN 50 AND 100000)
        |  AND ((cast(list_sum(list_transform(ws, x -> length(x))) AS double) / cast(n AS double)) BETWEEN 3.0 AND 10.0)
        |  AND (cast(len(regexp_extract_all(t, '#|\\.\\.\\.|…')) AS double) / cast(n AS double) <= 0.1)
        |  AND (cast(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS double) / cast(n AS double) >= 0.8)
        |  AND (len(list_intersect(list_transform(ws, x -> lower(x)),
        |    ['the','a','an','of','to','and','in','is','it','that',
        |     'for','on','with','as','at','by','this','was','are','be'])) >= 2)),
        |d AS (SELECT doc_id, lang, concat_ws(chr(10),
        |    'NAV ' || source || ' home login',
        |    t,
        |    'Read the full story here.',
        |    CASE WHEN doc_id % 7 = 0 THEN 'Enable javascript to continue.'
        |         ELSE 'Contact our editorial team today.' END,
        |    CASE WHEN doc_id % 5 = 0 THEN 'function() { return 1; }'
        |         ELSE 'All rights reserved worldwide.' END,
        |    CASE WHEN doc_id % 13 = 0 THEN 'Lorem ipsum dolor sit amet.'
        |         ELSE 'Thanks for reading this article.' END) AS page FROM g),
        |l AS (SELECT doc_id, lang, page, string_split(page, chr(10)) AS lines FROM d),
        |k AS (SELECT doc_id, lang, page,
        |  list_filter(lines, x -> regexp_matches(x, '[.!?"'']$$')
        |    AND len(regexp_split_to_array(trim(x), '\\s+')) >= 3
        |    AND NOT contains(lower(x), 'javascript')
        |    AND NOT contains(x, '{')) AS kept FROM l),
        |c4 AS (SELECT doc_id, lang, array_to_string(kept, chr(10)) AS clean
        |  FROM k WHERE len(kept) >= 3 AND NOT contains(lower(page), 'lorem ipsum')),
        |tq AS (SELECT doc_id, lang, clean, length(clean) AS n_chars,
        |  regexp_split_to_array(trim(clean), '\\s+') AS toks,
        |  regexp_split_to_array(lower(trim(clean)), '\\s+') AS ltoks FROM c4),
        |m AS (SELECT *,
        |  CASE WHEN n_chars > 0 THEN
        |    cast(length(regexp_replace(clean, '[^.,;:!?''"()\\[\\]-]', '', 'g')) as double) / cast(n_chars as double)
        |  ELSE 0.0 END AS punct_ratio,
        |  CASE WHEN len(toks) > 0 THEN
        |    cast(list_sum(list_transform(toks, x -> length(x))) as double) / cast(len(toks) as double)
        |  ELSE 0.0 END AS mean_tok_len,
        |  CASE WHEN len(ltoks) > 0 THEN
        |    cast(len(list_filter(ltoks, x -> x IN ($qualityStopList))) as double) / cast(len(ltoks) as double)
        |  ELSE 0.0 END AS stop_ratio
        | FROM tq),
        |q AS (SELECT *,
        |  ((CASE WHEN n_chars BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END) +
        |   (CASE WHEN stop_ratio >= 0.05 THEN 1.0 ELSE 0.0 END) +
        |   (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END) +
        |   (CASE WHEN mean_tok_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
        | FROM m)
        |SELECT lang, count(*) AS n_docs,
        |  cast(sum(CASE WHEN quality >= 0.75 THEN 1 ELSE 0 END) AS bigint) AS n_hq,
        |  sum(quality) AS sum_q,
        |  cast(sum(len(toks)) AS bigint) AS n_tok
        |FROM q GROUP BY lang ORDER BY lang""".stripMargin,
  )

  /** The FULL English stopword list qualityScore's stopwordRatio uses
    * (the 20-word list inside the gopher keep rule is that rule's own,
    * hardcoded in both engines above). */
  private def qualityStopList: String =
    TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")
}
