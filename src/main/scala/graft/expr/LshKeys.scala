package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** All hyperplane-LSH bucket keys of a vector — every table, every
  * bit — from ONE compiled pass over a literal plane tensor.
  *
  * The column-composition form (`array(struct(t, or-reduce(when(dot ≥
  * 0, 1<<b))))`) is semantically identical but builds nTables × nBits
  * separate dot-product nodes, each carrying its own dim-length literal
  * array: at the production 8 × 11 × 64 shape that is 88 inlined loops
  * per generated method — plan bloat and cache-hostile code, measured
  * at ~40 s per 100 k-vector keying pass in the r5 soak, and the cost
  * is paid once per self-join branch. Same cure as
  * [[CentroidExprs]]/[[PqLut]]: the tensor rides in the expression's
  * references array (plan size O(1)), and the hot loop is
  * `planes(t)(b) · vec` fused multiply-adds in compiled Scala.
  *
  * Output shape matches the composition it replaces: array of
  * `struct(tbl int, bucket long)` — one element per table, ready for a
  * single `explode`. A zero-bit table yields bucket 0 (the
  * full-coverage configuration the oracle gates run).
  */
object LshKeys {

  /** planes(t)(b)(d) — hyperplane d-component of bit b of table t. */
  case class LshKeysExpr(child: Expression, planes: Array[Array[Array[Double]]])
      extends UnaryExpression {
    require(planes.nonEmpty, "at least one table required")
    require(planes.forall(_.length <= 63), "at most 63 bits per table key")

    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("tbl", IntegerType, nullable = false),
        StructField("bucket", LongType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "lsh_keys"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expected array<double>, got $t")
    }

    def compute(arr: ArrayData): ArrayData = {
      val nT = planes.length
      val out = new Array[Any](nT)
      var t = 0
      while (t < nT) {
        val tp = planes(t)
        var key = 0L
        var b = 0
        while (b < tp.length) {
          val p = tp(b)
          val n = math.min(arr.numElements(), p.length)
          var s = 0.0
          var i = 0
          while (i < n) { s += arr.getDouble(i) * p(i); i += 1 }
          if (s >= 0) key |= 1L << b
          b += 1
        }
        out(t) = InternalRow(t, key)
        t += 1
      }
      new GenericArrayData(out)
    }

    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("lshKeys", this, classOf[LshKeysExpr].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }

    override protected def withNewChildInternal(newChild: Expression): LshKeysExpr =
      copy(child = newChild)
  }

  def lshKeys(vec: Column, planes: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(LshKeysExpr(ColumnBridge.expression(vec), planes))
}
