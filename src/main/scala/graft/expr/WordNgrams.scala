package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All consecutive `n`-token windows of a token array, each joined
  * with a single space — the word-n-gram generator behind shingling
  * ([[graft.ops.Dedup.shingles]]) and DSIR's 1..n-gram terms, in one
  * codegen pass.
  *
  * Semantically identical to
  * `transform(sequence(...), i -> concat_ws(" ", slice(toks, i, n)))`
  * (null tokens are SKIPPED by the join, concat_ws semantics;
  * `size < n` yields an empty array — totality built in), but
  * higher-order-function lambdas run INTERPRETED per element per row
  * (an Invoke + boxed closure per gram), which makes the HOF form the
  * hot line of every shingle-fed operator. This loop builds each gram
  * with one `UTF8String.concatWs` over array slots.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "word n-grams need n ≥ 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    val m = math.max(0, sz - n + 1)
    val out = new Array[Any](m)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(WordNgrams.Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sep = ctx.addReferenceObj("sep", WordNgrams.Sep,
        "org.apache.spark.unsafe.types.UTF8String")
      val sz = ctx.freshName("sz"); val m = ctx.freshName("m")
      val out = ctx.freshName("out"); val parts = ctx.freshName("parts")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
         |int $sz = $a.numElements();
         |int $m = $sz - ${n - 1}; if ($m < 0) $m = 0;
         |org.apache.spark.unsafe.types.UTF8String[] $out =
         |  new org.apache.spark.unsafe.types.UTF8String[$m];
         |org.apache.spark.unsafe.types.UTF8String[] $parts =
         |  new org.apache.spark.unsafe.types.UTF8String[$n];
         |for (int $i = 0; $i < $m; $i++) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $a.isNullAt($i + $j) ? null : $a.getUTF8String($i + $j);
         |  }
         |  $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($sep, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private[expr] val Sep: UTF8String = UTF8String.fromString(" ")

  def wordNgrams(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(tokens), n))
}
