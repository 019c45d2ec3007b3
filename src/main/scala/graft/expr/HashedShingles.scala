package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Sorted distinct 64-bit hashes of a token array's word n-grams, in
  * one pass: hash each token once (xxhash64, seed 42), then chain the
  * n per-token hashes per window — no shingle-string construction at
  * all. Replaces the `transform(sequence…, slice+concat_ws)` →
  * `xxhash64` → `array_sort` composition, whose higher-order lambdas
  * are interpreted per element (measured ~6× slower at sf0.1) and
  * whose intermediate shingle strings are pure allocation. The hash
  * VALUES are engine-internal (only distinctness matters — Jaccard
  * counts are what downstream consumes; a collision inside one pair's
  * union is ~2⁻⁶⁵), so chained token hashes are a drop-in for hashes
  * of the joined strings, with the bonus that token boundaries can
  * never alias ("ab c" vs "a bc").
  *
  * Output is sorted ascending — the contract [[JaccardSorted]] needs.
  * Fewer than n tokens → empty array (same as the reference shingle
  * semantics for short docs).
  */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hashed_shingles requires array<string>, got $t")
  }

  /** Shared by eval and codegen (the generated code calls this via a
    * reference object: the hot loop is compiled Scala either way, and
    * the projection stays inside the whole-stage span). */
  def compute(toks: ArrayData): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      th(i) = if (toks.isNullAt(i)) 42L else {
        val s = toks.getUTF8String(i)
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      }
      i += 1
    }
    val out = new Array[Long](len - n + 1)
    var w = 0
    while (w <= len - n) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(w + j), h); j += 1 }
      out(w) = h
      w += 1
    }
    java.util.Arrays.sort(out)
    var m = 0
    var p = 0
    while (p < out.length) {
      if (m == 0 || out(p) != out(m - 1)) { out(m) = out(p); m += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedShingles", this, classOf[HashedShingles].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {
  def hashedShingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(HashedShingles(ColumnBridge.expression(tokens), n))
}
