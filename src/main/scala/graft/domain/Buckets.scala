package graft.domain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Risk-class bucketing and the headline scoring expression
  * (SURVEY.md §2.9 F4/F5/F13) as pure `when`-chains — fully
  * codegen-able, no UDFs.
  */
object Buckets {

  /** F4 `class_to_num` (reference utils.py:255-274).
    *
    * Numeric input first (string→double cast yields null on failure,
    * matching the reference's try/except): values in [0,1] bucket by
    * strict-< thirds; otherwise banker's-rounded (Python `round` is
    * half-even ⇒ Spark `bround`, not `round`) and clamped to [1,3].
    * Non-numeric input: trimmed lowercase Thai/English level words;
    * unknown → null.
    */
  def classToNum(c: Column): Column = {
    // try_cast ≡ the reference's try/except float(x) — null on failure,
    // under ANSI mode too
    val v = c.try_cast("double")
    val numeric =
      when(v >= 0.0 && v <= 1.0,
        when(v < 1.0 / 3.0, 1).when(v < 2.0 / 3.0, 2).otherwise(3))
        .otherwise(greatest(lit(1), least(lit(3), bround(v).cast("int"))))
    val s = lower(trim(c.cast("string")))
    val textual =
      when(s.isin("ต่ำ", "ต่ำมาก", "low", "very low"), 1)
        .when(s.isin("ปานกลาง", "กลาง", "medium"), 2)
        .when(s.isin("สูง", "สูงมาก", "high", "very high"), 3)
        .otherwise(lit(null).cast("int"))
    when(v.isNotNull && !isnan(v), numeric).otherwise(textual)
  }

  /** F5 `avg_to_level` (utils.py:360-364): ≤1.5→1, ≤2.1→2, else 3. */
  def avgToLevel(c: Column): Column =
    when(c <= 1.5, 1).when(c <= 2.1, 2).otherwise(3)

  /** F13 `estimateProbability` (frontend page.tsx:66-83), promoted
    * server-side as the engine's headline analytic: base = rain/2 +
    * risk·10; any disaster that day boosts to ≥80 (+5/incident);
    * clamped to 100. */
  def riskScore(rainMmWmean: Column, riskLevel: Column, countOfDisasters: Column): Column = {
    val base = rainMmWmean / 2.0 + riskLevel * 10.0
    when(countOfDisasters > 0,
      least(lit(100.0), greatest(lit(80.0), base + countOfDisasters * 5.0)))
      .otherwise(least(lit(100.0), base))
  }

  /** F14 color bucketing (page.tsx:168-173): presentation-layer. */
  def scoreColor(score: Column): Column =
    when(score >= 75, "red").when(score >= 50, "yellow").otherwise(lit("green"))
}
