package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Bucket index by binary search over sorted quantile boundaries — the
  * skew-robust companion to linear min/max bucketing: boundary b_i is
  * the i-th corpus quantile, so every bucket holds ~the same row count
  * no matter how skewed the distribution. The boundaries array
  * (≤ a few thousand doubles) rides as ONE reference object; per-row
  * cost is log₂(buckets) compares. Returns values in [0, bounds.length]
  * (n boundaries → n+1 buckets).
  */
case class QuantileBucket(child: Expression, bounds: Array[Double])
    extends UnaryExpression {
  require(bounds.nonEmpty, "empty boundary array")

  override def dataType: DataType = LongType
  override def prettyName: String = "quantile_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"quantile_bucket requires double, got $t")
  }

  def compute(v: Double): Long = {
    // first boundary strictly greater than v = the bucket index
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantileBucket", this, classOf[QuantileBucket].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileBucket =
    copy(child = newChild)
}

object QuantileBucket {
  def quantileBucket(value: Column, bounds: Array[Double]): Column =
    ColumnBridge.column(QuantileBucket(ColumnBridge.expression(value), bounds))
}
