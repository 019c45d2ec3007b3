package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Asymmetric-distance (ADC) scores of one PQ code row against every
  * query's precomputed lookup table, in one pass.
  *
  * `luts(q)(sub)(code)` holds the squared L2 distance between query
  * q's sub-vector and the `code`-th centroid of subspace `sub`; the
  * score of a database vector against q is the sum over subspaces of
  * the entry its code selects. The LUT block (nQueries × m × k
  * doubles — KB-scale) rides as ONE reference object, so scoring the
  * whole corpus against all queries is a single projection: per row,
  * nQueries × m array lookups, no per-query plans, no join.
  */
case class AdcScores(child: Expression, luts: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(luts.nonEmpty, "no query LUTs")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "adc_scores"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"adc_scores requires array<int> codes, got $t")
  }

  def compute(codes: ArrayData): ArrayData = {
    val nq = luts.length
    val m = math.min(codes.numElements(), luts(0).length)
    val out = new Array[Double](nq)
    var q = 0
    while (q < nq) {
      val lut = luts(q)
      var s = 0.0
      var j = 0
      while (j < m) { s += lut(j)(codes.getInt(j)); j += 1 }
      out(q) = s
      q += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcScores", this, classOf[AdcScores].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): AdcScores =
    copy(child = newChild)
}

object AdcScores {
  def adcScores(codes: Column, luts: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(AdcScores(ColumnBridge.expression(codes), luts))

  def adcScore(codes: Column, queryIndex: Column, luts: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(AdcScoreOne(ColumnBridge.expression(codes),
      ColumnBridge.expression(queryIndex), luts))
}

/** One query's ADC score for a code row — the shape joins want: when a
  * probe join already pinned WHICH query a row is scored against,
  * computing all queries' scores ([[AdcScores]]) would be nQueries×
  * wasted lookups. */
case class AdcScoreOne(codes: Expression, queryIndex: Expression,
    luts: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(luts.nonEmpty, "no query LUTs")

  override def left: Expression = codes
  override def right: Expression = queryIndex
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  override def checkInputDataTypes(): TypeCheckResult = (codes.dataType, queryIndex.dataType) match {
    case (ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (c, q) => TypeCheckResult.TypeCheckFailure(
      s"adc_score requires (array<int>, int), got ($c, $q)")
  }

  def compute(codesArr: ArrayData, qi: Int): Double = {
    val lut = luts(qi)
    val m = math.min(codesArr.numElements(), lut.length)
    var s = 0.0
    var j = 0
    while (j < m) { s += lut(j)(codesArr.getInt(j)); j += 1 }
    s
  }

  override protected def nullSafeEval(c: Any, q: Any): Any =
    compute(c.asInstanceOf[ArrayData], q.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcScoreOne", this, classOf[AdcScoreOne].getName)
    nullSafeCodeGen(ctx, ev, (c, q) => s"${ev.value} = $ref.compute($c, $q);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcScoreOne = copy(codes = newLeft, queryIndex = newRight)
}
