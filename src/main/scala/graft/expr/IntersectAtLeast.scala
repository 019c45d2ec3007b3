package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType}

/** `|A ∩ B| ≥ k` over two SORTED, DISTINCT int arrays via a merge walk
  * with EARLY ABORT — the decision form of a set intersection.
  *
  * `size(array_intersect(a,b)) >= k` is semantically identical but
  * builds a boxed hash set AND materializes the intersection array per
  * row — on a fuzzy-join candidate explosion (hundreds of millions of
  * pairs × ~20-element gram sets) that allocation is the single
  * hottest line of the whole job. The merge walk is allocation-free
  * over primitives and aborts the moment the remaining elements can no
  * longer reach `k` (matches + min(remaining_a, remaining_b) < k): on
  * near-miss pairs — the common case the count filter exists to kill —
  * it exits after ~(|A| − k) misses instead of walking both arrays.
  *
  * Inputs must be sorted ascending with no duplicates
  * (sort_array ∘ array_distinct); element nulls are not expected (the
  * caller hashes with `hash()`, which never yields null).
  */
case class IntersectAtLeast(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "intersect_at_least"

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (arraysOk && third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"intersect_at_least requires (array<int>, array<int>, int), got " +
        s"${first.dataType} / ${second.dataType} / ${third.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any, kv: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val k = kv.asInstanceOf[Int]
    if (k <= 0) return true
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val xv = x.getInt(i); val yv = y.getInt(j)
      if (xv == yv) {
        inter += 1
        if (inter >= k) return true
        i += 1; j += 1
      } else {
        if (xv < yv) i += 1 else j += 1
        if (inter + math.min(n - i, m - j) < k) return false
      }
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, kv) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val inter = ctx.freshName("inter"); val rem = ctx.freshName("rem")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |if ($kv <= 0) { ${ev.value} = true; } else {
         |  int $n = $a.numElements(); int $m = $b.numElements();
         |  int $i = 0; int $j = 0; int $inter = 0;
         |  ${ev.value} = false;
         |  while ($i < $n && $j < $m) {
         |    int $xv = $a.getInt($i); int $yv = $b.getInt($j);
         |    if ($xv == $yv) {
         |      $inter++;
         |      if ($inter >= $kv) { ${ev.value} = true; break; }
         |      $i++; $j++;
         |    } else {
         |      if ($xv < $yv) { $i++; } else { $j++; }
         |      int $rem = ($n - $i < $m - $j) ? ($n - $i) : ($m - $j);
         |      if ($inter + $rem < $kv) { break; }
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): IntersectAtLeast =
    copy(first = f, second = s, third = t)
}

object IntersectAtLeast {
  def intersectAtLeast(a: Column, b: Column, k: Column): Column =
    ColumnBridge.column(IntersectAtLeast(ColumnBridge.expression(a),
      ColumnBridge.expression(b), ColumnBridge.expression(k)))
}
