package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization — the memory side of large-scale ANN (the
  * IVF-PQ combination is the canonical 100 TB design: IVF prunes which
  * vectors to look at, PQ shrinks what "looking" costs).
  *
  * The vector space is split into `m` contiguous sub-spaces; each gets
  * its own small k-means codebook; a vector compresses to `m` small
  * codes (k ≤ 256 → one byte each: a 64-dim float vector becomes
  * 8 bytes, 32× smaller). Queries score compressed vectors
  * asymmetrically (ADC): per query, a LUT of query-subvector→centroid
  * distances is built once (driver-side, KB-scale) and every corpus
  * row's score is `m` table lookups — no decompression, no vector
  * math on the big side.
  *
  * Spark shapes: codebook training is Lloyd's over ALL subspaces in
  * one distributed pass per iteration (explode to (sub, cell, dim)
  * rows → one groupBy); encoding is `m` O(1)-plan
  * [[graft.expr.CentroidExprs.NearestCell]] projections; scoring is
  * one [[graft.expr.AdcScores]] projection + a per-query top-k window.
  * Ranking is approximate by construction; recall vs brute force is
  * pinned in PqSpec, and like the other approximate paths the exact
  * brute-force twin stays the verification baseline.
  */
object Pq {

  /** codebooks(sub)(code) = centroid of that code in that sub-space. */
  final case class Model(m: Int, dsub: Int, codebooks: Array[Array[Array[Double]]]) {
    def k: Int = codebooks(0).length
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  private def subvec(vec: Column, j: Int, dsub: Int): Column =
    slice(vec, j * dsub + 1, dsub)

  /** Train per-subspace codebooks on a BOUNDED sample, Lloyd's
    * driver-side — the same move as [[Ivf.fit]] (FAISS-standard
    * practice: ~`samplePerCode` training vectors per centroid). ONE
    * distributed pass collects the hash-ordered sample
    * (TakeOrderedAndProject; k×samplePerCode rows), then every
    * subspace's Lloyd iterations run driver-side — m×k×dsub×|sample|
    * multiply-adds per iteration, ms-scale. The previous form
    * persisted the full corpus and ran one distributed
    * explode+aggregate job pair per iteration (1 + 2·iters Spark
    * jobs; at 100 TB, iters extra full passes). `dim % m == 0`
    * required; `k` ≤ 256 keeps one-byte codes. Seeding is unchanged:
    * farthest-point spread per subspace over the first 8×k sample
    * rows (a prefix of the same hash order the old code sampled).
    * Assignment mirrors [[graft.expr.CentroidExprs.NearestCell]]
    * (L2 argmin, strict-< lowest-code tie-break); deterministic end
    * to end. The gates' covering-shortlist + exact-re-rank configs
    * make final outputs independent of codebook values; PqSpec pins
    * recall on the approximate path. */
  def fit(corpus: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 5,
      samplePerCode: Int = 256): Model = {
    require(samplePerCode >= 8, "fit: samplePerCode must be ≥ 8")
    val train = Ivf.trainingSample(corpus, k * samplePerCode)
    if (train.isEmpty)
      throw new IllegalArgumentException("cannot fit PQ on an empty corpus")
    fitOnSample(train, m, k, iters)
  }

  private[ops] def fitOnSample(train: Array[Array[Double]], m: Int, k: Int,
      iters: Int): Model = {
    val dim = train.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    // fixed dimensionality up front (ADVICE r18) — see Ivf.fitOnSample
    require(train.forall(_.length == dim),
      s"fit: embeddings must share one dimensionality (first is $dim)")
    val dsub = dim / m
    def d2(a: Array[Double], b: Array[Double]): Double = {
      val n = math.min(a.length, b.length)
      var s = 0.0; var i = 0
      while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val sample = train.take(k * 8)
    var codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      val cand = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      val chosen = scala.collection.mutable.ArrayBuffer(cand.head)
      while (chosen.size < k && chosen.size < cand.length)
        chosen += cand.maxBy(v => chosen.iterator.map(c => d2(v, c)).min)
      chosen.toArray
    }
    val subs: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      train.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
    }
    for (_ <- 0 until iters) {
      codebooks = Array.tabulate(m) { j =>
        val cb = codebooks(j)
        val sums = Array.ofDim[Double](cb.length, dsub)
        val counts = new Array[Long](cb.length)
        subs(j).foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cb.length) {
            val d = d2(v, cb(c))
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          val s = sums(best)
          var i = 0
          while (i < dsub) { s(i) += v(i); i += 1 }
        }
        // empty cells keep their previous centroid
        Array.tabulate(cb.length) { c =>
          if (counts(c) == 0L) cb(c)
          else Array.tabulate(dsub)(i => sums(c)(i) / counts(c))
        }
      }
    }
    Model(m, dsub, codebooks)
  }

  /** The m-code column for an `array<double>` vector column — exposed
    * so composers ([[IvfPq]]) can encode derived vectors (residuals)
    * without materializing an intermediate frame. */
  def codesFor(vec: Column, model: Model): Column =
    array((0 until model.m).map(j =>
      graft.expr.CentroidExprs.nearestCell(subvec(vec, j, model.dsub), model.codebooks(j))): _*)

  /** Compress the corpus: (id, codes array<int> of length m). */
  def encode(corpus: DataFrame, model: Model): DataFrame =
    corpus.select(col("id"), codesFor(asDouble(col("embedding")), model).as("codes"))

  /** Approximate top-k nearest (smallest L2 — on normalized vectors the
    * cosine ranking) for each query over a PQ-encoded corpus.
    * Queries are collected (query sets are small — the same broadcast
    * assumption as [[Similarity.bruteForceTopK]]); their LUT block
    * rides into one [[graft.expr.AdcScores]] projection. */
  def topK(codes: DataFrame, queries: DataFrame, model: Model, k: Int): DataFrame = {
    val qs = queries.select(col("qid"), asDouble(col("embedding")).as("qvec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(qs.nonEmpty, "no query vectors")
    val luts: Array[Array[Array[Double]]] = qs.map { case (_, qv) =>
      Array.tabulate(model.m) { j =>
        val off = j * model.dsub
        model.codebooks(j).map { c =>
          var s = 0.0; var i = 0
          while (i < c.length) { val d = qv(off + i) - c(i); s += d * d; i += 1 }
          s
        }
      }
    }
    val qids = qs.map(_._1)
    val scored = codes
      .select(col("id"), posexplode(
        graft.expr.AdcScores.adcScores(col("codes"), luts)).as(Seq("qi", "dist2")))
      .withColumn("qid", element_at(typedlit(qids), col("qi") + 1))
      .where(col("qid") =!= col("id"))
    val w = Window.partitionBy("qid").orderBy(col("dist2").asc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "id", "dist2", "rank")
  }

  /** PQ shortlist + exact re-rank — the production serving shape:
    * ADC ranks the compressed corpus to a shortlist of `shortlist`×k
    * candidates per query (cheap, lookup-only), then ONLY those rows'
    * full vectors are fetched and exact-cosine re-ranked. Compression
    * error affects which candidates make the shortlist, not the final
    * ordering — recall at the same codebook size jumps accordingly. */
  def topKReranked(corpus: DataFrame, queries: DataFrame, model: Model,
      k: Int, shortlist: Int = 4): DataFrame = {
    val cand = topK(encode(corpus, model), queries, model, k * shortlist)
      .select(col("qid"), col("id"))
    val vecs = corpus.select(col("id"), asDouble(col("embedding")).as("vec"))
    val qvecs = queries.select(col("qid"), asDouble(col("embedding")).as("qvec"))
    val exact = cand
      .join(vecs, Seq("id"))
      .join(broadcast(qvecs), Seq("qid"))
      .withColumn("cosine", Similarity.cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "id", "cosine", "rank")
  }
}
