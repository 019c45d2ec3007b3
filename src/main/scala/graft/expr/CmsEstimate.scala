package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-estimate lookups against a count-min sketch, as a column.
  *
  * Spark builds CMS over a column (`df.stat.countMinSketch` /
  * `count_min_sketch(...)`) but offers no way to QUERY one from an
  * expression — estimates normally happen driver-side, item by item.
  * This carries the serialized sketch (KB–MB scale, ∝ eps/confidence,
  * independent of data size) as a reference object and evaluates
  * `estimateCount` per row, so "estimate every key's frequency" is one
  * codegen'd projection over any frame — the broadcast-lookup shape a
  * 100 TB frequency join wants when the exact counts table would
  * itself be huge.
  *
  * Deserialization is per-executor lazy (the byte array ships with the
  * plan; the sketch object is transient).
  */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {
  require(sketchBytes.nonEmpty, "empty sketch")

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cms_estimate requires bigint, got $t")
  }

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(sketchBytes)

  def compute(v: Long): Long = sketch.estimateCount(java.lang.Long.valueOf(v))

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimate", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

object CmsEstimate {
  def cmsEstimate(value: Column, sketchBytes: Array[Byte]): Column =
    ColumnBridge.column(CmsEstimate(ColumnBridge.expression(value), sketchBytes))
}
