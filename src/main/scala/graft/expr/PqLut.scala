package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Distributed PQ lookup-table construction: the ADC LUT of one query
  * against one probed cell, AS A COLUMN of the (query × probe) frame —
  * the piece that lets an IVF-PQ batch of any size run with no
  * driver-side LUT loop at all. Classic IVF-PQ builds LUTs on the
  * client per query; at a million-query batch that serializes the whole
  * batch through one machine. Here executors build each LUT where the
  * probe row already lives, so LUT cost scales out with the batch.
  *
  * Output: flattened `array<double>` of m × k entries;
  * `lut[j·k + code]` = ‖q′[sub j] − codebook_j[code]‖², where q′ is the
  * query (raw encoding) or query − centroid(cell) (residual encoding).
  * Codebooks and coarse centroids ride as ONE reference object — plan
  * size O(1) in nlist, m and k.
  */
case class PqLutExpr(qvec: Expression, cell: Expression,
    codebooks: Array[Array[Array[Double]]],
    centroids: Array[Array[Double]], residual: Boolean)
    extends BinaryExpression {
  require(codebooks.nonEmpty && codebooks(0).nonEmpty, "empty codebooks")

  override def left: Expression = qvec
  override def right: Expression = cell
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = (qvec.dataType, cell.dataType) match {
    case (ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (q, c) => TypeCheckResult.TypeCheckFailure(
      s"pq_lut requires (array<double>, int), got ($q, $c)")
  }

  private val m = codebooks.length
  private val k = codebooks(0).length
  private val dsub = codebooks(0)(0).length

  def compute(q: ArrayData, cellId: Int): ArrayData = {
    // fail loudly on a wrong-dimension query — silently truncating the
    // distance sum would return confidently wrong neighbors (the
    // driver-LUT path throws for the same input)
    if (q.numElements() < m * dsub)
      throw new IllegalArgumentException(
        s"pq_lut: query vector has ${q.numElements()} dims, model needs ${m * dsub}")
    val cent = if (residual) centroids(cellId) else null
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      val off = j * dsub
      val cb = codebooks(j)
      var code = 0
      while (code < k) {
        val c = cb(code)
        var s = 0.0
        var i = 0
        while (i < dsub) {
          val qi = if (cent == null) q.getDouble(off + i)
            else q.getDouble(off + i) - cent(off + i)
          val d = qi - c(i)
          s += d * d
          i += 1
        }
        out(j * k + code) = s
        code += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(q: Any, c: Any): Any =
    compute(q.asInstanceOf[ArrayData], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLutExpr].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => s"${ev.value} = $ref.compute($q, $c);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqLutExpr = copy(qvec = newLeft, cell = newRight)
}

/** ADC score from a LUT CARRIED IN THE ROW (the distributed-join shape;
  * [[AdcScoreOne]] is the reference-object twin for driver-built LUTs):
  * Σ_j lut[j·k + codes[j]] with k inferred from the array lengths. */
case class AdcScoreLut(codes: Expression, lut: Expression) extends BinaryExpression {
  override def left: Expression = codes
  override def right: Expression = lut
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score_lut"

  override def checkInputDataTypes(): TypeCheckResult = (codes.dataType, lut.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (c, l) => TypeCheckResult.TypeCheckFailure(
      s"adc_score_lut requires (array<int>, array<double>), got ($c, $l)")
  }

  def compute(codesArr: ArrayData, lutArr: ArrayData): Double = {
    val m = codesArr.numElements()
    if (m == 0) return 0.0
    val len = lutArr.numElements()
    // shape-check loudly: this is a PUBLIC SQL function (adc_score_lut)
    // and an unchecked index into UnsafeArrayData reads arbitrary
    // executor memory instead of throwing
    if (len == 0 || len % m != 0)
      throw new IllegalArgumentException(
        s"adc_score_lut: LUT length $len is not a positive multiple of the code length $m")
    val k = len / m
    var s = 0.0
    var j = 0
    while (j < m) {
      val code = codesArr.getInt(j)
      if (code < 0 || code >= k)
        throw new IllegalArgumentException(
          s"adc_score_lut: code $code at position $j outside [0, $k)")
      s += lutArr.getDouble(j * k + code)
      j += 1
    }
    s
  }

  override protected def nullSafeEval(c: Any, l: Any): Any =
    compute(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcScoreLut", this, classOf[AdcScoreLut].getName)
    nullSafeCodeGen(ctx, ev, (c, l) => s"${ev.value} = $ref.compute($c, $l);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcScoreLut = copy(codes = newLeft, lut = newRight)
}

object PqLut {
  def pqLut(qvec: Column, cell: Column, codebooks: Array[Array[Array[Double]]],
      centroids: Array[Array[Double]], residual: Boolean): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(qvec),
      ColumnBridge.expression(cell), codebooks, centroids, residual))

  def adcScoreLut(codes: Column, lut: Column): Column =
    ColumnBridge.column(AdcScoreLut(ColumnBridge.expression(codes),
      ColumnBridge.expression(lut)))
}
