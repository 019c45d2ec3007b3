package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ — the canonical 100 TB ANN composition: the IVF coarse
  * quantizer prunes WHICH vectors a query looks at (probe `nprobe` of
  * `nlist` cells), PQ compression shrinks what looking COSTS (m table
  * lookups per row instead of a dim-length dot product, m bytes of
  * storage instead of 4·dim).
  *
  * This variant encodes raw vectors (not cell residuals): the codes
  * are cell-independent, so one LUT per query serves every probed
  * cell, the index is a plain (id, cell, codes) frame, and the two
  * stages stay independently testable. Residual encoding — sharper at
  * the same code budget, at the cost of per-(query, cell) LUTs — is
  * the documented refinement if recall at a fixed byte budget ever
  * becomes the binding constraint.
  *
  * Query cost: corpus/nlist × nprobe rows touched, m lookups each,
  * then an exact re-rank of only the shortlist's full vectors — every
  * stage ∝ the data it must see, never the corpus.
  */
object IvfPq {

  final case class Model(coarse: Ivf.Model, pq: Pq.Model)

  /** Train both stages on the same corpus (coarse cells first, PQ
    * codebooks on the full vectors). */
  def fit(corpus: DataFrame, nlist: Int = 16, m: Int = 8, k: Int = 16,
      iters: Int = 4): Model =
    Model(Ivf.fit(corpus, nlist, iters), Pq.fit(corpus, m, k, iters))

  /** The index: (id, cell, codes). Persist `partitionBy("cell")` (see
    * [[save]]) so probes are partition-pruned file reads. */
  def index(corpus: DataFrame, model: Model): DataFrame =
    Ivf.assign(corpus, model.coarse)
      .join(Pq.encode(corpus, model.pq), Seq("id"))
      .select("id", "cell", "codes")

  def save(spark: SparkSession, model: Model, corpus: DataFrame, path: String): Unit = {
    import spark.implicits._
    model.coarse.centroids.toSeq.map { case (i, c) => (i, c.toSeq) }
      .toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
    model.pq.codebooks.zipWithIndex.toSeq
      .flatMap { case (cb, sub) => cb.zipWithIndex.map { case (c, code) => (sub, code, c.toSeq) } }
      .toDF("sub", "code", "centroid")
      .write.mode("overwrite").parquet(s"$path/codebooks")
    index(corpus, model)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  final case class Index(model: Model, cells: DataFrame)

  def load(spark: SparkSession, path: String): Index = {
    val centroids = spark.read.parquet(s"$path/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val cbRows = spark.read.parquet(s"$path/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = cbRows.map(_._1).max + 1
    val codebooks = Array.tabulate(m) { sub =>
      cbRows.filter(_._1 == sub).sortBy(_._2).map(_._3)
    }
    val dsub = codebooks(0)(0).length
    Index(Model(Ivf.Model(centroids), Pq.Model(m, dsub, codebooks)),
      spark.read.parquet(s"$path/cells"))
  }

  private def asDouble(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(c, _.cast("double"))

  /** Approximate top-k: probe `nprobe` cells per query, ADC-score only
    * those cells' code rows, exact-cosine re-rank the
    * `shortlist`×k-deep shortlist against the full vectors.
    *
    * @param cells  the (id, cell, codes) index frame
    * @param corpus (id, embedding) — read only for the shortlist rows
    */
  def topK(cells: DataFrame, corpus: DataFrame, queries: DataFrame, model: Model,
      k: Int, nprobe: Int = 4, shortlist: Int = 4): DataFrame = {
    val qs = queries.select(col("qid"), asDouble(col("embedding")).as("qvec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(qs.nonEmpty, "no query vectors")
    val luts: Array[Array[Array[Double]]] = qs.map { case (_, qv) =>
      Array.tabulate(model.pq.m) { j =>
        val off = j * model.pq.dsub
        model.pq.codebooks(j).map { c =>
          var s = 0.0; var i = 0
          while (i < c.length) { val d = qv(off + i) - c(i); s += d * d; i += 1 }
          s
        }
      }
    }
    import queries.sparkSession.implicits._
    // (qi, qid, cell) probe rows — tiny (nQueries × nprobe), broadcast
    val matrix = model.coarse.centroids.map(_._2)
    val probes = qs.zipWithIndex.flatMap { case ((qid, qv), qi) =>
      val dists = matrix.map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { val d = qv(i) - c(i); s += d * d; i += 1 }
        s
      }
      dists.zipWithIndex.sortBy { case (d, cid) => (d, cid) }.take(nprobe)
        .map { case (_, cid) => (qi, qid, cid) }
    }.toSeq.toDF("qi", "qid", "cell")

    val scored = cells.join(broadcast(probes), Seq("cell"))
      .where(col("qid") =!= col("id"))
      .withColumn("dist2", graft.expr.AdcScores.adcScore(col("codes"), col("qi"), luts))
    val wShort = Window.partitionBy("qid").orderBy(col("dist2").asc, col("id"))
    val short = scored.withColumn("srank", row_number().over(wShort))
      .where(col("srank") <= k * shortlist)
      .select("qid", "id")

    val vecs = corpus.select(col("id"), asDouble(col("embedding")).as("vec"))
    val qvecs = queries.select(col("qid"), asDouble(col("embedding")).as("qvec"))
    val exact = short.join(vecs, Seq("id")).join(broadcast(qvecs), Seq("qid"))
      .withColumn("cosine", Similarity.cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "id", "cosine", "rank")
  }
}
