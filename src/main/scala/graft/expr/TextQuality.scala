package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native forms of the [[graft.ops.TextOps]] per-row quality
  * heuristics (stopword ratio, composite quality score, duplicate-token
  * ratio).
  *
  * Why: the Column composites tokenize the SAME text 4–6 times per row
  * and run interpreted higher-order-function lambdas per token
  * (`filter(toks, _.isin(...))`, `aggregate(toks, 0L, _ + length(_))`)
  * — the exact pathology the r9 dsir lesson documented ("HOF lambdas
  * are interpreted; hot per-row loops want native expressions"). The
  * r18 stage bisection measured the composite qualityScore at ~0.7 s
  * over 5 000 tiny docs on 32 cores where one scan is 0.1 s. Each
  * expression here is one compiled pass: tokenize at most twice (raw +
  * lowercased — both via the same `Pattern.split(trimmed, -1)` the
  * builtin `split(trim(text), "\\s+")` delegates to), then integer
  * counting loops.
  *
  * Oracle parity is BY CONSTRUCTION, not re-derivation: the helpers
  * call the identical underlying primitives the builtin expressions
  * call — `UTF8String.trim()` (space-only trim), `UTF8String
  * .toLowerCase()` (the collation-default lowercase), `Pattern
  * .compile("\\s+").split(s, -1)` (what `StringSplit` delegates to,
  * trailing empties kept), `UTF8String.numChars()` (what `length`
  * returns) — and the final doubles are the same IEEE operations on
  * the same integers. Null semantics replicate the composites' CASE
  * WHEN chains exactly (null text → stopword 0.0, dup 0.0, quality
  * 0.25 — the punct rule passes vacuously); all three are therefore
  * never-null. TextQualityParitySpec pins expression-vs-composite
  * equality over the corpus and an adversarial edge battery.
  */
object TextQualityCore {

  /** Canonical stopword list ([[graft.ops.TextOps.EnStopwords]] reads
    * this — single source of truth). */
  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "this", "was", "are", "be")

  private val Ws = java.util.regex.Pattern.compile("\\s+")
  private val Stop: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    EnStopwords.foreach(s.add)
    s
  }

  /** `split(trim(text), "\\s+")` — same trim (space-only), same
    * Pattern.split(-1) (trailing empties kept, empty input → [""]). */
  private def tokensRaw(s: UTF8String): Array[String] =
    Ws.split(s.trim().toString, -1)

  /** `split(trim(lower(text)), "\\s+")` — lower FIRST (the composite's
    * order), via UTF8String.toLowerCase so non-ASCII case mapping is
    * identical to the builtin `lower`. */
  private def tokensLower(s: UTF8String): Array[String] =
    Ws.split(s.toLowerCase().trim().toString, -1)

  /** Chars kept by `regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", "")`
    * — all ASCII single-byte, so a byte scan counts them exactly
    * (UTF-8 continuation bytes are ≥ 0x80 and can never match). */
  private def punctCount(s: UTF8String): Int = {
    var n = 0
    var i = 0
    val bytes = s.numBytes()
    while (i < bytes) {
      val b = s.getByte(i)
      b match {
        case '.' | ',' | ';' | ':' | '!' | '?' | '\'' | '"' | '(' | ')' |
             '[' | ']' | '-' => n += 1
        case _ => ()
      }
      i += 1
    }
    n
  }

  /** [[graft.ops.TextOps.stopwordRatio]]: hits/|tokens| over lowered
    * tokens; 0.0 for empty token arrays and null text. */
  def stopwordRatio(s: UTF8String): Double = {
    if (s == null) return 0.0
    val toks = tokensLower(s)
    if (toks.length == 0) return 0.0
    var hits = 0
    var i = 0
    while (i < toks.length) {
      if (Stop.contains(toks(i))) hits += 1
      i += 1
    }
    hits.toDouble / toks.length.toDouble
  }

  /** [[graft.ops.TextOps.dupTokenRatio]]: 1 − |distinct|/|all| over
    * lowered tokens; 0.0 for empty/null. */
  def dupTokenRatio(s: UTF8String): Double = {
    if (s == null) return 0.0
    val toks = tokensLower(s)
    if (toks.length == 0) return 0.0
    val set = new java.util.HashSet[String](toks.length * 2)
    var i = 0
    while (i < toks.length) { set.add(toks(i)); i += 1 }
    1.0 - set.size.toDouble / toks.length.toDouble
  }

  /** [[graft.ops.TextOps.qualityScore]]: (lengthOk + stopOk + punctOk
    * + tokOk) / 4.0 with the composite's exact band and null
    * semantics. Null text → 0.25: length/stopword/token-length bands
    * fail their CASE-WHEN null checks, the punctuation band passes
    * vacuously (punctRatio's `otherwise(0.0)` ≤ 0.2) — identical to
    * the Column chain. */
  def qualityScore(s: UTF8String): Double = {
    if (s == null) return 0.25
    val nChars = s.numChars()
    val lengthOk = if (nChars >= 50 && nChars <= 100000) 1.0 else 0.0

    val raw = tokensRaw(s)
    var sumLen = 0L
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      sumLen += t.codePointCount(0, t.length)
      i += 1
    }
    val mean =
      if (raw.length > 0) sumLen.toDouble / raw.length.toDouble else 0.0
    val tokOk = if (mean >= 2.0 && mean <= 12.0) 1.0 else 0.0

    val stopOk = if (stopwordRatio(s) >= 0.05) 1.0 else 0.0

    val punctRatio =
      if (nChars > 0) punctCount(s).toDouble / nChars.toDouble else 0.0
    val punctOk = if (punctRatio <= 0.2) 1.0 else 0.0

    (lengthOk + stopOk + punctOk + tokOk) / 4.0
  }
}

/** Shared shape of the three never-null double text-quality
  * expressions: null input is MEANINGFUL (the composites' CASE chains
  * produce a non-null default), so these bypass null-safe eval. */
abstract class TextQualityExpr extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  /** The static core method's unqualified name on [[TextQualityCore]]. */
  protected def coreMethod: String

  protected def compute(s: UTF8String): Double

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    compute(if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        ${c.code}
        final double ${ev.value} = graft.expr.TextQualityCore.$coreMethod(
          ${c.isNull} ? null : ${c.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }
}

case class QualityScore(child: Expression) extends TextQualityExpr {
  override def prettyName: String = "quality_score"
  override protected def coreMethod: String = "qualityScore"
  override protected def compute(s: UTF8String): Double =
    TextQualityCore.qualityScore(s)
  override protected def withNewChildInternal(newChild: Expression): QualityScore =
    copy(child = newChild)
}

case class StopwordRatio(child: Expression) extends TextQualityExpr {
  override def prettyName: String = "stopword_ratio"
  override protected def coreMethod: String = "stopwordRatio"
  override protected def compute(s: UTF8String): Double =
    TextQualityCore.stopwordRatio(s)
  override protected def withNewChildInternal(newChild: Expression): StopwordRatio =
    copy(child = newChild)
}

case class DupTokenRatio(child: Expression) extends TextQualityExpr {
  override def prettyName: String = "dup_token_ratio"
  override protected def coreMethod: String = "dupTokenRatio"
  override protected def compute(s: UTF8String): Double =
    TextQualityCore.dupTokenRatio(s)
  override protected def withNewChildInternal(newChild: Expression): DupTokenRatio =
    copy(child = newChild)
}

object TextQuality {
  def qualityScore(c: Column): Column =
    ColumnBridge.column(QualityScore(ColumnBridge.expression(c)))
  def stopwordRatio(c: Column): Column =
    ColumnBridge.column(StopwordRatio(ColumnBridge.expression(c)))
  def dupTokenRatio(c: Column): Column =
    ColumnBridge.column(DupTokenRatio(ColumnBridge.expression(c)))
}
