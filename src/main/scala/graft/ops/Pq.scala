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

  /** Train per-subspace codebooks. `dim % m == 0` required; `k` ≤ 256
    * keeps one-byte codes. Seeding reuses the farthest-point spread on
    * a hash-ordered sample (per subspace), like [[Ivf.fit]]. */
  def fit(corpus: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 5): Model = {
    val vecs = corpus.select(col("id"), asDouble(col("embedding")).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // deterministic seeds per subspace from one hash-ordered sample;
      // dim comes from the sample itself (the former standalone
      // `select(size(vec)).limit(1)` probe was one whole extra Spark
      // job per fit — guide §1.2: don't compute things twice)
      val sample = vecs.orderBy(xxhash64(col("id")), col("id")).limit(k * 8)
        .select("vec").collect().map(_.getSeq[Double](0).toArray)
      if (sample.isEmpty)
        throw new IllegalArgumentException("cannot fit PQ on an empty corpus")
      val dim = sample.head.length
      require(dim % m == 0, s"dim $dim not divisible by m=$m")
      val dsub = dim / m
      def d2(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        s
      }
      var codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
        val cand = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
        val chosen = scala.collection.mutable.ArrayBuffer(cand.head)
        while (chosen.size < k && chosen.size < cand.length)
          chosen += cand.maxBy(v => chosen.iterator.map(c => d2(v, c)).min)
        chosen.toArray
      }

      // per-dimension SUMS of the subvector plus one count, keyed by
      // (sub, cell), divided driver-side (avg's own sum/count division
      // — same IEEE op): ONE hash aggregate with map-side partial
      // aggregation (m×k×(dsub+1) values cross the exchange). The
      // previous form posexploded the subvectors (rows ×dim total) and
      // needed a second exchange + sort to re-assemble arrays (guide
      // §2.3/§2.4 — 2 Exchange → 1 per iteration). sum-not-avg keeps
      // the aggregate buffer at dsub+1 fields, clear of the
      // spark.sql.codegen.maxFields whole-stage-codegen cliff the
      // dim=64 IVF form measured (see Ivf.fit). The gates'
      // covering-shortlist configs make final outputs independent of
      // merge-order ULPs, exactly as before.
      val dsubSums = (0 until dsub).map(i => sum(element_at(col("sv"), i + 1)).as(s"s$i"))
      for (_ <- 0 until iters) {
        // one distributed pass updates EVERY subspace: explode each row
        // to its m (sub, cell, subvec) assignments, then one groupBy
        val perSub = array((0 until m).map { j =>
          struct(lit(j).as("sub"),
            graft.expr.CentroidExprs.nearestCell(subvec(col("vec"), j, dsub), codebooks(j)).as("cell"),
            subvec(col("vec"), j, dsub).as("sv"))
        }: _*)
        val updated = vecs.select(explode(perSub).as("a"))
          .select(col("a.sub").as("sub"), col("a.cell").as("cell"), col("a.sv").as("sv"))
          .groupBy("sub", "cell").agg(count(lit(1)).as("n"), dsubSums: _*)
          .collect()
          .map { r =>
            val n = r.getLong(2).toDouble
            (r.getInt(0), r.getInt(1)) ->
              Array.tabulate(dsub)(i => r.getDouble(i + 3) / n)
          }
          .toMap
        codebooks = Array.tabulate(m)(j => Array.tabulate(codebooks(j).length)(c =>
          updated.getOrElse((j, c), codebooks(j)(c)))) // empty cells keep their centroid
      }
      Model(m, dsub, codebooks)
    } finally vecs.unpersist(blocking = false)
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
