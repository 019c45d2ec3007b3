package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term frequencies of a token array, in one pass:
  * `array<struct<term, tf>>` with one entry per DISTINCT token, counted
  * with multiplicity, in first-occurrence order (deterministic — a
  * retried task reproduces the same rows).
  *
  * This is the map-side half of an inverted-index build: the classic
  * `explode(tokens) → groupBy(term, doc_id) → count` form shuffles one
  * row per token OCCURRENCE just to count duplicates that all live in
  * the same source row ([[graft.ops.Bm25.postingsOf]] paid that
  * exchange on every index build/append). Counting inside the
  * projection removes the exchange outright (guide §2.4) and shrinks
  * the exploded row volume from |tokens| to |distinct terms per doc|.
  *
  * Semantics mirror the groupBy form exactly: every array element is
  * counted (empty strings included — a whitespace-split of "" yields
  * [""], which the old form indexed too); a null ELEMENT counts under
  * the null term key like groupBy's null grouping; a null ARRAY is
  * null-in-null-out (the old explode dropped the row the same way).
  * Term bytes are copied out of the (possibly buffer-backed) input so
  * the returned array owns its strings.
  */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = true),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "token_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_counts requires array<string>, got $t")
  }

  /** Shared by eval and codegen (the generated code calls this via a
    * reference object — the [[HashedShingles]] device). */
  def compute(toks: ArrayData): ArrayData = {
    val len = toks.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var nullCount = 0L
    var nullFirst = -1
    var i = 0
    while (i < len) {
      if (toks.isNullAt(i)) {
        if (nullCount == 0L) nullFirst = counts.size()
        nullCount += 1L
      } else {
        val s = toks.getUTF8String(i)
        val c = counts.get(s)
        if (c == null) counts.put(s.clone(), Array(1L)) else c(0) += 1L
      }
      i += 1
    }
    val n = counts.size() + (if (nullCount > 0) 1 else 0)
    val out = new Array[Any](n)
    val it = counts.entrySet().iterator()
    var w = 0
    while (it.hasNext) {
      if (nullCount > 0 && w == nullFirst) {
        out(w) = new GenericInternalRow(Array[Any](null, nullCount)); w += 1
      }
      val e = it.next()
      out(w) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      w += 1
    }
    if (nullCount > 0 && w < n)
      out(w) = new GenericInternalRow(Array[Any](null, nullCount))
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenCounts", this, classOf[TokenCounts].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

object TokenCounts {
  def tokenCounts(tokens: Column): Column =
    ColumnBridge.column(TokenCounts(ColumnBridge.expression(tokens)))
}
