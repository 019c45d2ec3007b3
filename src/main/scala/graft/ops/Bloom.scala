package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Broadcast Bloom-filter prefilters for containment joins.
  *
  * The decontamination shape at 100 TB: the benchmark (test) shingle
  * set is tiny, the training corpus is the 100 TB side. Building a
  * Bloom filter over the SMALL side (one distributed pass via
  * `df.stat.bloomFilter`) and filtering the big side's stream before
  * its distinct/join collapses the corpus-sized shuffle to
  * ~matched-size. No false negatives ⇒ composing the prefilter with
  * the exact join is semantics-free; false positives only cost a few
  * extra rows that the exact join then rejects.
  *
  * The sketch rides into executors as a binary literal
  * ([[BloomFilterMightContain]] requires a constant or scalar
  * subquery, not an arbitrary column) — KB-to-MB scale for millions of
  * expected items at 1 % fpp.
  */
object Bloom {

  /** One distributed pass over `df[colName]` (long-typed values) →
    * serialized sketch bytes. */
  def buildLongFilter(df: DataFrame, colName: String,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val bf = df.stat.bloomFilter(colName, math.max(expectedItems, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen membership test of a long column against the serialized
    * sketch (Spark's own [[BloomFilterMightContain]] — the expression
    * behind runtime-filter pushdown). */
  def mightContain(filterBytes: Array[Byte], hash: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType), ColumnBridge.expression(hash)))
}
