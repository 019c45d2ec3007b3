package graft

import graft.expr._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the engine's native expressions, so
  * `spark.sql(...)` users call them like built-ins:
  *
  *   - `nfc_normalize(str)`         — Unicode NFC
  *   - `vec_dot(a, b)`              — array<double> dot product
  *   - `vec_cosine(a, b)`           — fused cosine similarity
  *   - `simhash64(tokens)`          — 64-bit SimHash of array<string>
  *   - `minhash64(hashes, k)`       — k-slot MinHash signature
  *   - `jaccard_sorted(a, b)`       — Jaccard of sorted long arrays
  *   - `hashed_shingles(tokens, n)` — sorted distinct n-gram hashes
  *   - `minhash_bands(hashes, k, b)`— fused signature→LSH band keys
  *   - `adc_score_lut(codes, lut)`  — PQ ADC distance from an in-row LUT
  *
  * Two entry points: set `spark.sql.extensions=graft.GraftExtensions`
  * at session build (the SparkSessionExtensions path), or call
  * [[GraftFunctions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def arity(name: String, n: Int)(f: Seq[Expression] => Expression): Builder =
    args => {
      require(args.length == n, s"$name expects $n arguments, got ${args.length}")
      f(args)
    }

  val descriptors: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("nfc_normalize", info("nfc_normalize", "nfc_normalize(str) - Unicode NFC normalization"),
      arity("nfc_normalize", 1)(a => NfcNormalize(a.head))),
    ("vec_dot", info("vec_dot", "vec_dot(a, b) - dot product of array<double>"),
      arity("vec_dot", 2)(a => DotProduct(a(0), a(1)))),
    ("vec_cosine", info("vec_cosine", "vec_cosine(a, b) - cosine similarity of array<double>"),
      arity("vec_cosine", 2)(a => CosineSim(a(0), a(1)))),
    ("simhash64", info("simhash64", "simhash64(tokens) - 64-bit SimHash of array<string>"),
      arity("simhash64", 1)(a => SimHash64(a.head))),
    ("minhash64", info("minhash64", "minhash64(hashes, k) - k-slot MinHash signature of array<bigint>"),
      arity("minhash64", 2) { a =>
        val k = a(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"minhash64 k must be an integer literal, got $other")
        }
        MinHash64(a.head, k)
      }),
    ("jaccard_sorted", info("jaccard_sorted", "jaccard_sorted(a, b) - Jaccard of sorted distinct array<bigint>"),
      arity("jaccard_sorted", 2)(a => JaccardSorted(a(0), a(1)))),
    ("hashed_shingles", info("hashed_shingles",
      "hashed_shingles(tokens, n) - sorted distinct 64-bit hashes of word n-grams"),
      arity("hashed_shingles", 2)(a => HashedShingles(a.head, intLit("hashed_shingles n", a(1))))),
    ("minhash_bands", info("minhash_bands",
      "minhash_bands(hashes, k, bands) - LSH band keys of the k-slot MinHash signature"),
      arity("minhash_bands", 3)(a =>
        MinHashBands(a.head, intLit("minhash_bands k", a(1)), intLit("minhash_bands bands", a(2))))),
    ("adc_score_lut", info("adc_score_lut",
      "adc_score_lut(codes, lut) - ADC distance of PQ codes against a flattened m*k LUT"),
      arity("adc_score_lut", 2)(a => AdcScoreLut(a(0), a(1)))),
  )

  private def intLit(what: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
