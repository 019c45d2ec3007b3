package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — the
  * GPT-2-lineage within-word variant): learn a merge table from corpus
  * statistics, then tokenize text into subwords. The brief's token
  * counting (`TextOps`) approximates BPE with a regex; this is the real
  * trainer + applier.
  *
  * Scale design — the production shape used by real tokenizer trainers:
  *   - the corpus is scanned ONCE, into a (word, n) frequency table
  *     whose size is bounded by VOCABULARY, not corpus size
  *     ([[wordFreqs]] — one shuffle with map-side partial agg);
  *   - the merge loop ([[train]]) runs over that bounded table only —
  *     pure driver-side Scala, the same bounded-collect stance as IVF
  *     centroids / PQ codebooks (collect is legal because the input is
  *     vocabulary-bounded by construction);
  *   - tokenization ([[tokenize]]) applies merges once per DISTINCT
  *     word — never per occurrence — and attaches the result to the
  *     corpus through a broadcast word→subwords table. A 100 TB corpus
  *     with a 10⁶-word vocabulary does 10⁶ merge applications, not
  *     10¹¹.
  *
  * No oracle SQL exists for the iterative merge loop (recursive
  * greedy-merge is not expressible in the gate's replayable-SQL
  * subset), so this operator is spec-pinned (BpeSpec: the classic
  * hand-computable corpus, merge order, determinism, tokenize ≡
  * per-word reference, round-trip concatenation identity) — the same
  * stance as the IVF-PQ routing and streaming operators. */
object Bpe {

  /** End-of-word sentinel appended to each word's final symbol (the
    * Sennrich convention: "est" mid-word and "est</w>" word-final are
    * different statistics). Chosen outside the tokenizer's own
    * alphabet. */
  val EndOfWord = "</w>"

  /** One corpus scan → (word, n) frequency table. Lowercased,
    * whitespace-split — the inventory's portable token convention. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(lower(col(textCol)))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** A word as its initial symbol sequence: one symbol per character,
    * end-of-word sentinel glued to the last. */
  private def initSymbols(word: String): Vector[String] = {
    val chars = word.map(_.toString).toVector
    if (chars.isEmpty) Vector.empty
    else chars.init :+ (chars.last + EndOfWord)
  }

  /** Learn `numMerges` merges from a word-frequency table. Each round
    * merges the globally most frequent adjacent symbol pair (ties
    * broken lexicographically, so training is DETERMINISTIC — real
    * trainers do the same for reproducible vocabularies). Stops early
    * when no pair occurs twice. Pure Scala over the bounded vocab. */
  def train(wordFreq: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    var words: Vector[(Vector[String], Long)] =
      wordFreq.iterator.map { case (w, n) => (initSymbols(w), n) }.toVector
    val merges = mutable.ArrayBuffer[(String, String)]()
    var continue = numMerges > 0
    while (continue && merges.size < numMerges) {
      val counts = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += n
      val best = counts.filter(_._2 >= 2L)
      if (best.isEmpty) continue = false
      else {
        // highest count; ties → lexicographically smallest pair —
        // fully deterministic
        val pair = best.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += pair
        words = words.map { case (syms, n) => (mergePair(syms, pair), n) }
      }
    }
    merges.toSeq
  }

  /** Replace every adjacent occurrence of `pair` in `syms` (left to
    * right, non-overlapping). */
  private def mergePair(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (syms(i) + syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Tokenize ONE word with a learned merge table: start from
    * characters, apply the lowest-rank applicable merge until none
    * applies (the GPT-2 apply rule — rank order, not training order
    * per word, though for BPE the two coincide). */
  def applyMerges(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = initSymbols(word)
    var done = syms.length < 2
    while (!done) {
      val cands = (0 until syms.length - 1)
        .flatMap(i => rank.get((syms(i), syms(i + 1))))
      if (cands.isEmpty) done = true
      else {
        syms = mergePair(syms, merges(cands.min))
        done = syms.length < 2
      }
    }
    syms
  }

  /** Tokenize a corpus: distinct words (vocabulary-bounded) → per-word
    * merge application ONCE each → broadcast word→subwords table →
    * equi-join + explode. Output: one row per (doc, position, subword),
    * `pos` 0-based over the doc's word stream, `sub_pos` within the
    * word. The merge table rides the closure (KB-scale). */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    Reserved.requireAbsent("tokenize", Seq("word", "pos", "subword", "sub_pos"), docs)
    val spark = docs.sparkSession
    val words = docs
      .select(col(idCol), posexplode(TextOps.tokens(lower(col(textCol))))
        .as(Seq("pos", "word")))
      .where(length(col("word")) > 0)
    val vocab = words.select("word").distinct()
    import spark.implicits._
    val table = vocab.as[String].mapPartitions { it =>
      it.map(w => (w, applyMerges(w, merges)))
    }.toDF("word", "subwords")
    words.join(broadcast(table), Seq("word"))
      .select(col(idCol), col("pos"),
        posexplode(col("subwords")).as(Seq("sub_pos", "subword")))
  }
}
