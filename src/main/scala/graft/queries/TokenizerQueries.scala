package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Bpe, Packing}

/** Tokenizer-stage gates — the BPE surface's oracle-checked slice plus
  * the tokenize→pack trainer hand-off:
  *
  *   - [[qBpeVocab]] — the trainer's input: word-frequency table with
  *     the production pruning rule ([[Bpe.prunedVocab]] — frequency
  *     floor + deterministic top-N), exactly what
  *     [[Bpe.collectWordFreqs]] materializes driver-side;
  *   - [[qBpeTokenize]] — [[Bpe.tokenize]] under a FIXED literal merge
  *     table, so the iterative apply rule itself is oracle-replayable
  *     (the merge LOOP of `train` stays spec-pinned in BpeSpec — greedy
  *     selection over mutating counts has no SQL form);
  *   - [[qTokPack]] — tokenize → per-doc subword counts →
  *     [[Packing.assignWindows]]: the full tokenizer→trainer hand-off
  *     with real subwords, replayed by ONE oracle end-to-end (the
  *     `q_train_mix` composition-oracle pattern).
  *
  * Oracle equivalence argument for [[FixedMerges]]: the engine applies
  * the GPT-2 rule (lowest-rank applicable merge, ALL occurrences
  * left-to-right, repeat); the DuckDB oracle applies one-at-a-time
  * (lowest rank, then leftmost single occurrence, repeat — a recursive
  * CTE step). The two differ only if applying a merge can create a pair
  * of LOWER rank, i.e. some merge's output symbol appears as a
  * component of an earlier merge. [[FixedMerges]] is chosen so no
  * output ("ta", "tab", "ro", "le</w>") equals any earlier merge's
  * component — so rank r exhausts before rank r+1 starts in both rules;
  * and within one rank, occurrences of a pair (a,b) with a ≠ b never
  * overlap, while for a = b one-at-a-time leftmost pairing equals the
  * engine's single-pass greedy pairing — identical results either way.
  * The prototype cross-check (oracle vs an exact replica of the engine
  * rule, all ~118 k rows at sf0.01) matched row-for-row before this
  * gate shipped.
  */
object TokenizerQueries {

  /** The gate's literal merge table: chained (t,a → ta,b), an
    * end-of-word merge (l + e</w>), and a mid-word pair (r,o) that hits
    * several vocabulary words — exercising chaining, sentinel gluing,
    * and the no-merge fallback. See the object doc for why this table
    * makes the one-at-a-time oracle exact. */
  private[graft] val FixedMerges: Seq[(String, String)] =
    Seq(("t", "a"), ("ta", "b"), ("r", "o"), ("l", "e</w>"))

  /** Pruned word-frequency vocabulary ([[Bpe.wordFreqs]] →
    * [[Bpe.prunedVocab]]): frequency floor 2, top 20 — both the floor
    * and the deterministic top-N tie-break are live at sf0.01 (the
    * documents vocabulary is ~31 words, so the cap actually cuts). */
  def qBpeVocab(s: SparkSession, dir: String): DataFrame =
    Bpe.prunedVocab(
      Bpe.wordFreqs(Tables.documents(s, dir), "text"), minFreq = 2L, topN = 20)

  /** Corpus tokenization under [[FixedMerges]]: one row per (doc, word
    * position, subword). The distinct-word table + join topology is the
    * production path; only the merge table is pinned to a literal so
    * DuckDB can replay the apply rule. */
  def qBpeTokenize(s: SparkSession, dir: String): DataFrame =
    Bpe.tokenize(Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", FixedMerges)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("sub_pos").cast("long").as("sub_pos"), col("subword"))
      .orderBy("doc_id", "pos", "sub_pos")

  /** Tokenize → pack: per-doc REAL subword counts feed the distributed
    * prefix-sum packer ([[Packing.assignWindows]] — bit-identical to
    * the naive global window, PackingSpec-pinned, so the oracle's
    * running sum replays it exactly). Budget 4096 ≈ a training window a
    * few documents wide at this corpus's ~700 subwords/doc. */
  def qTokPack(s: SparkSession, dir: String): DataFrame = {
    val tok = Bpe.tokenize(Tables.documents(s, dir).select("doc_id", "text"),
      "doc_id", "text", FixedMerges)
    val counts = tok.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    Packing.assignWindows(counts, "doc_id", "n_tok", budget = 4096L)
      .select(col("doc_id"), col("n_tok"), col("tokens_before"),
        col("window_id"))
      .orderBy("doc_id")
  }

  /** Tokenizer FERTILITY — subwords emitted per input word, the
    * standard tokenizer-quality diagnostic (a fertility creeping above
    * ~1.5–2 on a language means the vocabulary underserves it and the
    * model pays the context-length tax): per-language totals under
    * [[FixedMerges]], fertility = Σ subwords / Σ words as one
    * correctly-rounded divide on both engines. Word counts come from
    * the tokenize output itself (distinct word positions), so the
    * numerator and denominator can never disagree about what counts
    * as a word. */
  def qBpeFertility(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val per = Bpe.tokenize(docs.select("doc_id", "text"),
        "doc_id", "text", FixedMerges)
      .groupBy("doc_id")
      .agg(countDistinct(col("pos")).as("n_words"), count(lit(1)).as("n_sub"))
    docs.select("doc_id", "lang")
      .join(per, Seq("doc_id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"),
        sum("n_sub").as("n_subwords"))
      .withColumn("fertility",
        round(col("n_subwords").cast("double") / col("n_words").cast("double"), 6))
      .orderBy("lang")
  }

  /** Token IDS — the artifact a model consumes: the corpus-derived id
    * vocabulary ([[Bpe.vocabulary]]: sorted base symbols, then merge
    * outputs in rank order — the GPT-2 construction, ASCII corpus so
    * JVM and DuckDB sort identically) attached to every subword via
    * [[Bpe.tokenizeToIds]]. The vocab covers the corpus by
    * construction, so the unk path stays out of the gate (BpeSpec pins
    * it on a fixture). */
  def qBpeIds(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val wf = Bpe.collectWordFreqs(Bpe.wordFreqs(docs, "text"))
    val vocab = Bpe.vocabulary(wf.keys, FixedMerges)
    Bpe.tokenizeToIds(docs, "doc_id", "text", FixedMerges, vocab)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("sub_pos").cast("long").as("sub_pos"), col("subword"),
        col("tid").cast("int").as("tid"))
      .orderBy("doc_id", "pos", "sub_pos")
  }

  /** Incremental tokenization vs a persisted subword table
    * ([[Bpe.buildSubwordTable]] → [[Bpe.tokenizeIncrement]]): the table
    * holds the a–m HALF of the vocabulary (a word-initial predicate —
    * a doc-id slice of this small-vocabulary corpus would cover every
    * word and leave the miss path vacuous), the n–z half arrives as
    * the increment and tokenizes on the fly. Output must equal plain
    * [[Bpe.tokenize]] row-for-row, so this gate SHARES
    * `q_bpe_tokenize`'s oracle — the two construction paths must agree
    * (the `q_incremental_append` pattern). Whole lifecycle (build →
    * load → tokenize → delete) runs inside the gate. */
  def qIncrementalTokenize(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    Q.withTempIndex("graft-bpetable") { idx =>
      val half = docs
        .select(explode(graft.ops.TextOps.tokens(lower(col("text"))))
          .as("text"))
        .where(length(col("text")) > 0 && substring(col("text"), 1, 1) < "n")
      Phases.phase("build") {
        Bpe.buildSubwordTable(half, "text", FixedMerges, idx,
          org.apache.spark.sql.SaveMode.Overwrite)
      }
      Bpe.tokenizeIncrement(docs, "doc_id", "text", FixedMerges, idx,
          materializeTable = true)
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("sub_pos").cast("long").as("sub_pos"), col("subword"))
        .orderBy("doc_id", "pos", "sub_pos")
    }
  }

  val all: Map[String, Q.QueryFn] = Map(
    "q_bpe_vocab" -> (qBpeVocab _),
    "q_bpe_tokenize" -> (qBpeTokenize _),
    "q_bpe_fertility" -> (qBpeFertility _),
    "q_bpe_ids" -> (qBpeIds _),
    "q_incremental_tokenize" -> (qIncrementalTokenize _),
    "q_tok_pack" -> (qTokPack _),
  )

  /** Index-LIFECYCLE gates of this family (see
    * [[SearchQueries.lifecycle]] for the contract). */
  val lifecycle: Set[String] = Set("q_incremental_tokenize")

  /** The tokenize replay shared by the q_bpe_tokenize and q_tok_pack
    * oracles — built once here so the two cannot drift. Produces CTEs
    * `wp` (doc_id, pos, word) and `tok` (word, syms). */
  private val TokenizeCtes: String =
    """t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |  FROM documents),
      |wi AS (SELECT doc_id, unnest(range(1, len(toks)+1)) AS i, toks FROM t),
      |wp AS (SELECT doc_id, i-1 AS pos, toks[i] AS word FROM wi WHERE toks[i] <> ''),
      |vocab AS (SELECT DISTINCT word FROM wp),
      |ini AS (SELECT word, regexp_split_to_array(word,'') AS chars FROM vocab),
      |init AS (SELECT word,
      |  list_slice(chars, 1, len(chars)-1) || [chars[len(chars)] || '</w>'] AS syms,
      |  FALSE AS done FROM ini),
      |rec AS (
      |  SELECT word, syms, done FROM init
      |  UNION ALL
      |  SELECT word,
      |    CASE WHEN best IS NULL THEN syms
      |         ELSE list_slice(syms, 1, best[2]-1)
      |              || [syms[best[2]] || syms[best[2]+1]]
      |              || list_slice(syms, best[2]+2, len(syms)) END,
      |    best IS NULL
      |  FROM (
      |    SELECT word, syms,
      |      list_sort(list_filter(list_transform(range(1, len(syms)),
      |        i -> [CASE WHEN syms[i]='t'  AND syms[i+1]='a'     THEN 0
      |                   WHEN syms[i]='ta' AND syms[i+1]='b'     THEN 1
      |                   WHEN syms[i]='r'  AND syms[i+1]='o'     THEN 2
      |                   WHEN syms[i]='l'  AND syms[i+1]='e</w>' THEN 3 END, i]),
      |        p -> p[1] IS NOT NULL))[1] AS best
      |    FROM rec WHERE NOT done) s
      |),
      |tok AS (SELECT word, syms FROM rec WHERE done)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_bpe_vocab" ->
      """WITH wf AS (SELECT w AS word, count(*) AS n
        |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |        FROM documents)
        |  WHERE w <> '' GROUP BY w)
        |SELECT word, n FROM wf WHERE n >= 2
        |ORDER BY n DESC, word LIMIT 20""".stripMargin,
    // NOTE: plain concatenation, not an interpolated stripMargin — a
    // second stripMargin over the already-stripped CTE block would eat
    // one '|' of every line-leading '||' list concat
    "q_bpe_tokenize" ->
      ("WITH RECURSIVE\n" + TokenizeCtes + ",\n" +
        """sub AS (SELECT word, unnest(range(1, len(syms)+1)) AS si, syms FROM tok)
          |SELECT wp.doc_id, cast(wp.pos AS bigint) AS pos,
          |  cast(sub.si - 1 AS bigint) AS sub_pos, sub.syms[sub.si] AS subword
          |FROM wp JOIN sub ON wp.word = sub.word
          |ORDER BY doc_id, pos, sub_pos""".stripMargin),
    // fertility = Σ subwords / Σ words per language; word counts from
    // the tokenize replay (one wp row per word), so the two sides
    // cannot disagree about what counts as a word
    "q_bpe_fertility" ->
      ("WITH RECURSIVE\n" + TokenizeCtes + ",\n" +
        """ns AS (SELECT word, len(syms) AS n_sub FROM tok),
          |pd AS (SELECT wp.doc_id, count(*) AS n_words, sum(ns.n_sub) AS n_sub
          |  FROM wp JOIN ns ON wp.word = ns.word GROUP BY wp.doc_id)
          |SELECT d.lang, count(*) AS n_docs,
          |  cast(sum(pd.n_words) AS bigint) AS n_words,
          |  cast(sum(pd.n_sub) AS bigint) AS n_subwords,
          |  round(cast(sum(pd.n_sub) AS double) / cast(sum(pd.n_words) AS double), 6) AS fertility
          |FROM pd JOIN documents d ON pd.doc_id = d.doc_id
          |GROUP BY d.lang ORDER BY d.lang""".stripMargin),
    // the id vocabulary: distinct initial symbols sorted (row_number,
    // ASCII ⇒ same order as the engine's JVM sort), then merge outputs
    // at base-count + rank — joined back onto the tokenize replay
    "q_bpe_ids" ->
      ("WITH RECURSIVE\n" + TokenizeCtes + ",\n" +
        """base AS (SELECT DISTINCT s FROM (SELECT unnest(syms) AS s FROM init)),
          |nb AS (SELECT count(*) AS n FROM base),
          |vid AS (
          |  SELECT s AS subword,
          |    cast(row_number() OVER (ORDER BY s) - 1 AS int) AS tid
          |  FROM base
          |  UNION ALL
          |  SELECT m.s, cast((SELECT n FROM nb) + m.r AS int)
          |  FROM (VALUES ('ta', 0), ('tab', 1), ('ro', 2), ('le</w>', 3)) m(s, r)),
          |sub AS (SELECT word, unnest(range(1, len(syms)+1)) AS si, syms FROM tok)
          |SELECT wp.doc_id, cast(wp.pos AS bigint) AS pos,
          |  cast(sub.si - 1 AS bigint) AS sub_pos, sub.syms[sub.si] AS subword,
          |  coalesce(vid.tid, -1) AS tid
          |FROM wp JOIN sub ON wp.word = sub.word
          |LEFT JOIN vid ON sub.syms[sub.si] = vid.subword
          |ORDER BY doc_id, pos, sub_pos""".stripMargin),
    // SAME oracle as q_bpe_tokenize BY DESIGN: the incremental
    // (persisted-table + on-the-fly misses) and one-shot construction
    // paths must produce identical tokenization
    "q_incremental_tokenize" ->
      ("WITH RECURSIVE\n" + TokenizeCtes + ",\n" +
        """sub AS (SELECT word, unnest(range(1, len(syms)+1)) AS si, syms FROM tok)
          |SELECT wp.doc_id, cast(wp.pos AS bigint) AS pos,
          |  cast(sub.si - 1 AS bigint) AS sub_pos, sub.syms[sub.si] AS subword
          |FROM wp JOIN sub ON wp.word = sub.word
          |ORDER BY doc_id, pos, sub_pos""".stripMargin),
    // tokenize → per-doc subword counts → global-order exclusive prefix
    // sum (≡ assignWindows by PackingSpec's bit-identity pin)
    "q_tok_pack" ->
      ("WITH RECURSIVE\n" + TokenizeCtes + ",\n" +
        // cast the windowed sum: DuckDB's sum(BIGINT) widens to HUGEINT
        // (arrow decimal128), which can never hash-match the engine's
        // int64 even when values agree — the same cast every other
        // windowed-sum oracle (q_seq_pack, q_running_total) applies
        """cnt AS (SELECT wp.doc_id, cast(sum(len(tok.syms)) AS bigint) AS n_tok
          |  FROM wp JOIN tok ON wp.word = tok.word GROUP BY wp.doc_id)
          |SELECT doc_id, n_tok,
          |  cast(coalesce(sum(n_tok) OVER (ORDER BY doc_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
          |    AS tokens_before,
          |  cast(floor(cast(coalesce(sum(n_tok) OVER (ORDER BY doc_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
          |    / 4096.0) AS bigint) AS window_id
          |FROM cnt ORDER BY doc_id""".stripMargin),
  )
}
