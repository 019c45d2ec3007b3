package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Centroid argmin/ranking over a literal centroid matrix, carried as
  * ONE reference object instead of nlist sub-expressions.
  *
  * The `least(struct(dist, id)…)` / `array_sort(array(struct…))`
  * formulations are correct but build O(nlist) expression nodes: at
  * nlist = 4096 the plan bloats, analysis slows, and codegen methods
  * overflow. Here the matrix rides in the expression's references
  * array — plan size O(1) in nlist, per-row cost nlist × dim fused
  * multiply-adds in compiled Scala.
  */
object CentroidExprs {

  private def check(dt: DataType): TypeCheckResult = dt match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected array<double>, got $t")
  }

  private def dist2(arr: ArrayData, c: Array[Double]): Double = {
    val n = math.min(arr.numElements(), c.length)
    var s = 0.0
    var i = 0
    while (i < n) { val d = arr.getDouble(i) - c(i); s += d * d; i += 1 }
    s
  }

  /** Index (into `centroids`) of the nearest centroid by L2. */
  case class NearestCell(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    require(centroids.nonEmpty, "empty centroid matrix")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "nearest_cell"
    override def checkInputDataTypes(): TypeCheckResult = check(child.dataType)

    def compute(arr: ArrayData): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val d = dist2(arr, centroids(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("nearestCell", this, classOf[NearestCell].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }

    override protected def withNewChildInternal(newChild: Expression): NearestCell =
      copy(child = newChild)
  }

  /** The `nprobe` nearest centroid indexes, ascending by distance
    * (deterministic tie-break: lower index wins) — the probe list for
    * IVF queries. Partial selection, not a full sort: cost
    * nlist × dim + nlist × nprobe. */
  case class NearestCells(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
      extends UnaryExpression {
    require(centroids.nonEmpty, "empty centroid matrix")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "nearest_cells"
    override def checkInputDataTypes(): TypeCheckResult = check(child.dataType)

    def compute(arr: ArrayData): ArrayData = {
      val n = centroids.length
      val take = math.min(nprobe, n)
      val d = new Array[Double](n)
      var c = 0
      while (c < n) { d(c) = dist2(arr, centroids(c)); c += 1 }
      val out = new Array[Int](take)
      val used = new Array[Boolean](n)
      var s = 0
      while (s < take) {
        var best = -1
        var bestD = Double.MaxValue
        var i = 0
        while (i < n) {
          if (!used(i) && d(i) < bestD) { bestD = d(i); best = i }
          i += 1
        }
        used(best) = true
        out(s) = best
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }

    override protected def withNewChildInternal(newChild: Expression): NearestCells =
      copy(child = newChild)
  }

  /** (cluster id, cosine) of the max-cosine centroid. Ties break to the
    * LOWEST cid: rows arrive sorted ascending by cid and only a STRICT
    * improvement displaces the incumbent. Per-centroid cosine matches
    * [[CosineSim]] bit-for-bit (min-length prefix, norms over the
    * prefix, 0 when either prefix norm is 0); `Double.compare` gives
    * NaN-greatest ordering like Spark's struct max. */
  case class BestCosineCell(child: Expression, cids: Array[Long],
      centroids: Array[Array[Double]]) extends UnaryExpression {
    require(centroids.nonEmpty, "empty centroid matrix")
    require(cids.length == centroids.length, "cid/centroid length mismatch")
    // the lowest-cid tie-break below relies on this ordering — enforce
    // it rather than trusting callers three files away
    require(cids.length <= 1 || cids.iterator.zip(cids.iterator.drop(1)).forall(p => p._1 <= p._2),
      "cids must be sorted ascending (lowest-cid tie-break precondition)")
    override def dataType: DataType = StructType(Seq(
      StructField("cluster", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false)))
    override def prettyName: String = "best_cosine_cell"
    override def checkInputDataTypes(): TypeCheckResult = check(child.dataType)

    def compute(arr: ArrayData): Any = {
      var bestCid = cids(0)
      var bestC = cosinePrefix(arr, centroids(0))
      var c = 1
      while (c < centroids.length) {
        val cos = cosinePrefix(arr, centroids(c))
        if (java.lang.Double.compare(cos, bestC) > 0) { bestC = cos; bestCid = cids(c) }
        c += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(bestCid, bestC)
    }

    // LOCKSTEP: this is the third copy of the cosine kernel — the other
    // two are CosineSim.nullSafeEval and CosineSim.doGenCode
    // (expr/VectorExprs.scala); they cannot share code (ArrayData vs
    // Array[Double] operand, and codegen is a string template), so any
    // change to the prefix rule or the den > 0 guard must land in all
    // three. SemDedupSpec's bit-for-bit equivalence pin catches drift.
    private def cosinePrefix(arr: ArrayData, cv: Array[Double]): Double = {
      val n = math.min(arr.numElements(), cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = arr.getDouble(i); val yv = cv(i)
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den > 0) dot / den else 0.0
    }

    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bestCosineCell", this, classOf[BestCosineCell].getName)
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($a);")
    }

    override protected def withNewChildInternal(newChild: Expression): BestCosineCell =
      copy(child = newChild)
  }

  def nearestCell(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(vec), centroids))

  def bestCosineCell(vec: Column, cids: Array[Long],
      centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(BestCosineCell(ColumnBridge.expression(vec), cids, centroids))

  def nearestCells(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(vec), centroids, nprobe))
}
