package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rule-battery document quality filtering — the explicit per-rule
  * form of the classic pretraining-corpus filters, complementing the
  * composite [[TextOps.qualityScore]]:
  *
  *   - [[gopherRules]]: the doc-level heuristics of Gopher (Rae et
  *     al. 2021 §A1.1) as named boolean columns, so a pipeline can
  *     log WHICH rule rejected a doc (the auditability a 100 TB
  *     curation run needs — a single fused boolean can't explain a
  *     30 % drop rate).
  *   - [[c4KeepLine]] / [[c4CleanDoc]]: the line-level C4 cleaning
  *     rules (Raffel et al. 2020 §2.2) — terminal punctuation, minimum
  *     words, no code/boilerplate markers — as a PURE PER-ROW
  *     transform: a doc's lines live in its own row (split → filter →
  *     rejoin), so unlike the corpus-frequency pass in
  *     [[Boilerplate]], this stage needs NO shuffle at any scale.
  *
  * All pure `Column` expressions over codegen'd builtins; the
  * higher-order-function lambdas here guard short per-doc arrays
  * (lines, words), not hot arithmetic loops — the interpreted-lambda
  * caveat that moved the vector math to native expressions doesn't
  * bite a boolean per line.
  */
object Quality {

  /** Tokens for rule purposes: whitespace split of the trimmed text,
    * NULL-total (NULL → "" → one empty token, which the word-count
    * band then rejects — never a NULL flag). */
  private def words(text: Column): Column = split(trim(coalesce(text, lit(""))), "\\s+")

  /** Gopher doc-level rule battery. Returns the named rules as a
    * Seq of (name, boolean Column) so callers can select all of them,
    * AND the rejecting subset, without a struct unpack:
    *
    *   - `wc_ok`: word count in [minWords, maxWords] (paper: 50–100k)
    *   - `mwl_ok`: mean word length in [3, 10] chars
    *   - `sym_ok`: symbol-to-word ratio ('#', '…', '...') ≤ 0.1
    *   - `alpha_ok`: ≥ 80 % of words contain ≥ 1 [A-Za-z] letter (an
    *     English-corpus rule by construction — run it downstream of
    *     language ID, as the paper does)
    *   - `stop_ok`: ≥ 2 distinct common stopwords present
    *   - `keep`: conjunction of all of the above
    *
    * Integer counts + one final division per ratio, so both engines'
    * doubles agree bit-for-bit (the oracle-parity stance). */
  def gopherRules(text: Column, minWords: Int = 50,
      maxWords: Int = 100000): Seq[(String, Column)] = {
    val ws = words(text)
    val n = size(ws)
    val wcOk = n.between(minWords, maxWords)
    val meanLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
      n.cast("double")
    val mwlOk = meanLen.between(3.0, 10.0)
    val nSym = size(regexp_extract_all(coalesce(text, lit("")),
      lit("#|\\.\\.\\.|…"), lit(0)))
    val symOk = nSym.cast("double") / n.cast("double") <= 0.1
    val nAlpha = size(filter(ws, w => w.rlike("[A-Za-z]")))
    val alphaOk = nAlpha.cast("double") / n.cast("double") >= 0.8
    val nStop = size(array_intersect(transform(ws, w => lower(w)),
      array(TextOps.EnStopwords.map(w => lit(w)): _*)))
    val stopOk = nStop >= 2
    val rules = Seq("wc_ok" -> wcOk, "mwl_ok" -> mwlOk, "sym_ok" -> symOk,
      "alpha_ok" -> alphaOk, "stop_ok" -> stopOk)
    rules :+ ("keep" -> rules.map(_._2).reduce(_ && _))
  }

  /** C4 line-keep predicate: ends in terminal punctuation, ≥ minWords
    * words, no "javascript" mention, no curly brace (the code/markup
    * tell). Case-insensitivity is spelled `lower(...) contains` — not a
    * regex flag — so the DuckDB replay is trivially identical. */
  def c4KeepLine(line: Column, minWords: Int = 3): Column =
    line.rlike("[.!?\"']$") &&
      size(split(trim(line), "\\s+")) >= minWords &&
      !lower(line).contains("javascript") &&
      !line.contains("{")

  /** C4 doc-level cleaning: filter the doc's lines by [[c4KeepLine]],
    * rejoin with newlines; the doc itself is kept only if ≥ minLines
    * lines survive and the page never says "lorem ipsum" (the paper's
    * page-level rules). Returns (clean_text, n_lines, n_kept, keep) as
    * a 4-field struct — callers `.select(c.getField(...))`; everything
    * is one codegen'd projection, no shuffle, no corpus statistics. */
  def c4CleanDoc(text: Column, minWords: Int = 3, minLines: Int = 3): Column = {
    val t = coalesce(text, lit(""))
    val lines = split(t, "\n")
    val kept = filter(lines, l => c4KeepLine(l, minWords))
    val keep = (size(kept) >= minLines) && !lower(t).contains("lorem ipsum")
    struct(
      array_join(kept, "\n").as("clean_text"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      keep.as("keep"))
  }
}
