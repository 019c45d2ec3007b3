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
  * Two encodings:
  *   - raw (`residual = false`): codes compress the vectors
  *     themselves — cell-independent, one LUT per query serves every
  *     probed cell, stages stay independently testable;
  *   - residual (`residual = true`, the classic IVF-PQ form): codes
  *     compress `v − centroid(cell(v))`. Residuals concentrate near
  *     the origin, so the same codebook budget quantizes them more
  *     finely — sharper at the same m bytes — at the cost of one LUT
  *     per (query, probed cell) (still KB-scale, built driver-side).
  *
  * Query cost: corpus/nlist × nprobe rows touched, m lookups each,
  * then an exact re-rank of only the shortlist's full vectors — every
  * stage ∝ the data it must see, never the corpus.
  */
object IvfPq {

  final case class Model(coarse: Ivf.Model, pq: Pq.Model, residual: Boolean = false)

  private def centroidMap(coarse: Ivf.Model): Map[Int, Seq[Double]] =
    coarse.centroids.map { case (i, c) => i -> c.toSeq }.toMap

  /** (id, cell, rvec = v − centroid(cell)) — the residual frame. */
  private def residuals(corpus: DataFrame, coarse: Ivf.Model): DataFrame =
    Ivf.assign(corpus, coarse)
      .withColumn("__cent", element_at(typedlit(centroidMap(coarse)), col("cell")))
      .select(col("id"), col("cell"),
        zip_with(col("vec"), col("__cent"), (a, b) => a - b).as("rvec"))

  /** Train both stages on ONE shared hash-ordered sample: coarse cells
    * first, then PQ codebooks on either the sampled vectors or their
    * cell residuals (computed driver-side — the same
    * v − centroid(cell(v)) arithmetic [[residuals]] runs distributed,
    * over the same hash-order prefix the separate fits would each have
    * collected). One distributed top-k collection pass instead of two
    * (and instead of the pre-r19 2·iters-jobs-per-stage form). */
  def fit(corpus: DataFrame, nlist: Int = 16, m: Int = 8, k: Int = 16,
      iters: Int = 4, residual: Boolean = false): Model = {
    val samplePer = 256
    val train = Ivf.trainingSample(corpus, math.max(nlist, k) * samplePer)
    require(train.nonEmpty, "cannot fit an IVF-PQ model on an empty corpus")
    val coarse = Ivf.fitOnSample(train.take(nlist * samplePer), nlist, iters)
    val matrix = coarse.centroids.map(_._2)
    val pqTrain0 = train.take(k * samplePer)
    val pqTrain =
      if (!residual) pqTrain0
      else pqTrain0.map { v =>
        val c = matrix(Ivf.nearestIdx(v, matrix))
        val n = math.min(v.length, c.length)
        Array.tabulate(v.length)(i => if (i < n) v(i) - c(i) else v(i))
      }
    Model(coarse, Pq.fitOnSample(pqTrain, m, k, iters), residual)
  }

  /** The index: (id, cell, codes). Persist `partitionBy("cell")` (see
    * [[save]]) so probes are partition-pruned file reads. */
  def index(corpus: DataFrame, model: Model): DataFrame =
    if (model.residual)
      residuals(corpus, model.coarse)
        .select(col("id"), col("cell"), Pq.codesFor(col("rvec"), model.pq).as("codes"))
    else
      Ivf.assign(corpus, model.coarse)
        .select(col("id"), col("cell"), Pq.codesFor(col("vec"), model.pq).as("codes"))

  def save(spark: SparkSession, model: Model, corpus: DataFrame, path: String): Unit = {
    import spark.implicits._
    // KB-scale model frames: one writer task, one file each (local
    // Seqs would otherwise spread over default-parallelism tasks)
    model.coarse.centroids.toSeq.map { case (i, c) => (i, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    model.pq.codebooks.zipWithIndex.toSeq
      .flatMap { case (cb, sub) => cb.zipWithIndex.map { case (c, code) => (sub, code, c.toSeq) } }
      .toDF("sub", "code", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebooks")
    Seq(model.residual).toDF("residual")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
    index(corpus, model)
      // null stamp: keeps one cells schema across the save → append
      // lifecycle (the Ivf.save stance; appendIndex stamps real ids)
      .withColumn("batch_id", lit(null).cast("long"))
      // one writer per cell dir, adaptive (IndexMaintenance
      // .oneWriterPerCell): the exchange is paid only when the input
      // is multi-partition — i.e. exactly when it prevents
      // |tasks|×|cells| small files (guide §6)
      .transform(IndexMaintenance.oneWriterPerCell)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  final case class Index(model: Model, cells: DataFrame)

  /** Fold a batch of NEW vectors into a persisted index — the
    * [[Ivf.appendIndex]] lifecycle for the compressed form: encode the
    * batch under the FROZEN quantizers (coarse centroids AND PQ
    * codebooks both read back from `path`, KB-scale) and append into
    * the cell partitions. Frozen quantizers make
    * `index ∪ batch ≡ one-shot index of the union under the same
    * model` EXACT (IvfPqSpec pins it). Same contracts as the IVF
    * form: id-disjoint batches; codebook drift under distribution
    * shift degrades ADC ranking quality gradually — monitor cell
    * balance and rebuild (fit + save) when it leaves the build-time
    * envelope. [[compactIndexed]] restores one file per cell after a
    * run of appends.
    *
    * `batchId` gives the compressed form the SAME crash-replay resume
    * as its sibling ([[IndexMaintenance.resumeStampedAppend]] — the
    * appendlog-first protocol keyed on the batch's expected row count,
    * so a partially-committed batch is stripped and rewritten, never
    * existence-skipped into data loss). Unstamped appends stay the
    * plain at-least-once path. Legacy indexes saved before the stamp
    * gain a `batch_id` column on first stamped append (probes ignore
    * it; compaction's mergeSchema keeps it). */
  def appendIndex(spark: SparkSession, batch: DataFrame, path: String,
      batchId: Option[Long] = None, model: Option[Model] = None): Unit = {
    import spark.implicits._
    val logPath = s"$path/appendlog"
    val cellsPath = s"$path/cells"
    val (logLanded, fullyLanded) = IndexMaintenance.resumeStampedAppend(
      spark, logPath, cellsPath, batchId, partitionCols = Seq("cell"))
    if (fullyLanded) return
    if (batchId.isDefined && !logLanded)
      Seq((batchId.get, batch.count())).toDF("batch_id", "n_rows")
        .write.mode("append").parquet(logPath)
    // `model`: the stored quantizers when the caller already holds them
    // (same frozen-model contract as [[Ivf.appendIndex]]); omitted ⇒
    // read back from `path` — now via loadModel, which no longer drags
    // the cells frame in just to encode a batch
    index(batch, model.getOrElse(loadModel(spark, path)))
      .withColumn("batch_id",
        batchId.map(lit(_)).getOrElse(lit(null)).cast("long"))
      // one writer per touched cell per batch (adaptive — see
      // IndexMaintenance.oneWriterPerCell)
      .transform(IndexMaintenance.oneWriterPerCell)
      .write.mode("append").partitionBy("cell").parquet(cellsPath)
  }

  /** DELETE/takedown propagation — [[Ivf.removeVectors]] for the
    * compressed form: strip the ids' code rows from `cells/` (staged
    * swap, cell layout preserved). Both quantizers store no corpus
    * statistics, so the strip alone makes the index bit-identical to
    * a one-shot [[save]] of the survivors under the same frozen model
    * (IvfPqSpec pins it). Unknown ids are no-ops. Appendlog decrement
    * + `removeId` retry stamp exactly as in [[Ivf.removeVectors]] —
    * a replayed stamped batch must read the takedown as fully landed,
    * never as a partial commit to repair. `checkpoint` (pass it
    * whenever a stream maintains this index) makes the removal REFUSE
    * rows of an uncommitted streaming batch
    * ([[IndexMaintenance.requireBatchesCommitted]]). */
  def removeVectors(spark: SparkSession, path: String,
      ids: org.apache.spark.sql.DataFrame,
      removeId: Option[Long] = None,
      checkpoint: Option[String] = None): Unit =
    IndexMaintenance.removeKeysWithLogDecrement(spark, s"$path/appendlog",
      s"$path/cells", ids.select(col("id")), "id",
      partitionCols = Seq("cell"), removeId = removeId,
      checkpoint = checkpoint)

  /** One file per cell partition after appends — the staged-rename
    * re-layout ([[IndexMaintenance.compactDir]]); results-identical,
    * `dedupeRows` collapses at-least-once retry duplicates. */
  def compactIndexed(spark: SparkSession, path: String,
      dedupeRows: Boolean = false): Unit =
    IndexMaintenance.compactDir(spark, s"$path/cells",
      dedupeRows = dedupeRows, partitionCols = Seq("cell"))

  /** Read the persisted model parts with their writer-fixed schemas
    * stated explicitly ([[save]]'s own layout) — skips one
    * footer-inference Spark job per directory. */
  def loadModel(spark: SparkSession, path: String): Model = {
    val centroids = spark.read
      .schema("cell INT, centroid ARRAY<DOUBLE>")
      .parquet(s"$path/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val cbRows = spark.read
      .schema("sub INT, code INT, centroid ARRAY<DOUBLE>")
      .parquet(s"$path/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = cbRows.map(_._1).max + 1
    val codebooks = Array.tabulate(m) { sub =>
      cbRows.filter(_._1 == sub).sortBy(_._2).map(_._3)
    }
    val dsub = codebooks(0)(0).length
    val residual = spark.read.schema("residual BOOLEAN")
      .parquet(s"$path/meta").head().getBoolean(0)
    Model(Ivf.Model(centroids), Pq.Model(m, dsub, codebooks), residual)
  }

  def load(spark: SparkSession, path: String): Index =
    Index(loadModel(spark, path), spark.read.parquet(s"$path/cells"))

  private def asDouble(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(c, _.cast("double"))

  /** Approximate top-k: probe `nprobe` cells per query, ADC-score only
    * those cells' code rows, exact-cosine re-rank the
    * `shortlist`×k-deep shortlist against the full vectors.
    *
    * LUTs are built driver-side (classic IVF-PQ: KB per query), but
    * the batch is CHUNKED (`queryChunk`): the driver holds one chunk's
    * LUTs at a time — each chunk's result is materialized
    * (localCheckpoint) and its LUT array released before the next
    * chunk builds, so a million-query batch runs at stable driver
    * memory instead of accumulating nQueries × nprobe × m × k doubles.
    * A batch that fits one chunk (the common case) stays fully lazy —
    * no checkpoint, unchanged plan.
    *
    * Size `queryChunk` against the TASK BINARY it implies: the chunk's
    * LUT block rides in every scoring task as
    * queryChunk × nprobe × m × k × 8 bytes (the default 1024 at
    * nprobe=8, m=8, k=64 → 33 MB; 4096 was measured OOMing an 8 GB
    * driver at a 50 k-query batch — task-result threads each hold a
    * deserialized copy). Past ~10⁵ queries, prefer [[topKDistributed]],
    * which ships each LUT exactly once through a shuffle instead of
    * once per task.
    *
    * @param cells  the (id, cell, codes) index frame
    * @param corpus (id, embedding) — read only for the shortlist rows
    */
  def topK(cells: DataFrame, corpus: DataFrame, queries: DataFrame, model: Model,
      k: Int, nprobe: Int = 4, shortlist: Int = 4, queryChunk: Int = 1024): DataFrame = {
    val qframe = queries.select(col("qid"), asDouble(col("embedding")).as("qvec"))
    // ONE bounded head(chunk+1) sizes the chunking AND (in the common
    // ≤-one-chunk case) already holds the vectors chunkTopK needs —
    // the old shape collected qids first and then re-scanned the query
    // frame for the vectors inside chunkTopK (two jobs over the same
    // rows). Driver exposure stays the chunk, never the batch.
    val probe = qframe.head(queryChunk + 1)
    require(probe.nonEmpty, "no query vectors")
    if (probe.length <= queryChunk) {
      val qs0 = probe.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      return chunkTopKRows(cells, corpus, qframe, qs0, model, k, nprobe, shortlist)
    }
    val qids = qframe.select("qid").collect().map(_.getLong(0)).sorted
    // multi-chunk: persist the projected queries once (each chunk is a
    // narrow filtered read), materialize per chunk, release per chunk
    val persisted = qframe.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      qids.grouped(queryChunk).map { chunk =>
        chunkTopK(cells, corpus,
          persisted.where(col("qid").isInCollection(chunk)), model, k, nprobe, shortlist)
          .localCheckpoint(true) // eagerly done ⇒ this chunk's LUTs become garbage
      }.reduce(_ union _)
    } finally persisted.unpersist(blocking = false)
  }

  /** Fully-distributed top-k: NO driver-side work at any batch size —
    * probe selection ([[graft.expr.CentroidExprs.nearestCells]]), LUT
    * construction ([[graft.expr.PqLut]]) and ADC scoring all run as
    * codegen'd expressions on executor rows. The probes frame
    * (nQueries × nprobe rows, each carrying its m×k-double LUT) joins
    * the code index on `cell` — Catalyst broadcasts it while it is
    * small and falls back to a shuffle join for huge batches, which is
    * exactly the topology a 10⁶-query batch wants (the chunked
    * [[topK]] stays the low-latency path for interactive batches:
    * driver LUTs skip the probe-side shuffle entirely).
    *
    * Same output contract as [[topK]] (IvfPqSpec pins equality on both
    * encodings). */
  def topKDistributed(cells: DataFrame, corpus: DataFrame, queries: DataFrame,
      model: Model, k: Int, nprobe: Int = 4, shortlist: Int = 4): DataFrame = {
    val matrix = model.coarse.centroids.map(_._2)
    val qframe = queries.select(col("qid"), asDouble(col("embedding")).as("qvec"))
    val probes = qframe
      .withColumn("cell",
        explode(graft.expr.CentroidExprs.nearestCells(col("qvec"), matrix, nprobe)))
      .withColumn("lut", graft.expr.PqLut.pqLut(col("qvec"), col("cell"),
        model.pq.codebooks, matrix, model.residual))
      .select("qid", "cell", "lut")

    // shuffle_hash, not sort-merge: the probe rows carry a 4 KB LUT
    // payload each — SMJ would SORT those fat rows and copy them into
    // every scored output row; SHJ hashes the (smaller) probe side per
    // partition and streams the codes, and whole-stage codegen consumes
    // the LUT by pointer when computing dist2. Catalyst still upgrades
    // to broadcast when the batch is small enough.
    val scored = cells.join(probes.hint("shuffle_hash"), Seq("cell"))
      .where(col("qid") =!= col("id"))
      .withColumn("dist2", graft.expr.PqLut.adcScoreLut(col("codes"), col("lut")))
    val wShort = Window.partitionBy("qid").orderBy(col("dist2").asc, col("id"))
    val short = scored.withColumn("srank", row_number().over(wShort))
      .where(col("srank") <= k * shortlist)
      .select("qid", "id")

    val vecs = corpus.select(col("id"), asDouble(col("embedding")).as("vec"))
    val exact = short.join(vecs, Seq("id")).join(qframe, Seq("qid"))
      .withColumn("cosine", Similarity.cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "id", "cosine", "rank")
  }

  /** Routes a batch to [[topK]] (driver-built LUTs — lowest latency for
    * interactive batches) or [[topKDistributed]] (executor-built LUTs —
    * no driver ceiling) on the measured crossover: one cheap count of
    * the query frame, nothing else.
    *
    * Threshold from the r4/r5 soaks (local[24]): at a 100 k-vector
    * index, 10 k queries ran 19.4 s chunked vs 33.4 s distributed and
    * 50 k queries 234.5 vs 212.2 s — distributed edging ahead; but at a
    * 200 k-vector index, 100 k queries ran 376.7 chunked vs 752.7 s
    * distributed (the LUT shuffle grows ∝ queries × nprobe × m·k while
    * chunked amortizes fixed 33 MB task binaries over more rows). The
    * crossover is corpus-dependent, so the default routes conservatively:
    * chunked until the batch is deep into the regime where its REAL
    * limit binds — the driver ceiling and one-job-per-chunk scheduling
    * (~200 sequential jobs at the default chunk) — and distributed
    * beyond. Callers who measured their own corpus shape can pass their
    * own threshold. Output is identical either way (IvfPqSpec pins both
    * routes). */
  def topKAuto(cells: DataFrame, corpus: DataFrame, queries: DataFrame, model: Model,
      k: Int, nprobe: Int = 4, shortlist: Int = 4, queryChunk: Int = 1024,
      routeThreshold: Long = 200000): DataFrame = {
    if (queries.count() <= routeThreshold)
      topK(cells, corpus, queries, model, k, nprobe, shortlist, queryChunk)
    else
      topKDistributed(cells, corpus, queries, model, k, nprobe, shortlist)
  }

  /** One bounded chunk: collect its vectors, build its probes + LUTs,
    * score + re-rank. `qframe` must be (qid, qvec double[]). */
  private def chunkTopK(cells: DataFrame, corpus: DataFrame, qframe: DataFrame,
      model: Model, k: Int, nprobe: Int, shortlist: Int): DataFrame =
    chunkTopKRows(cells, corpus, qframe,
      qframe.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)),
      model, k, nprobe, shortlist)

  /** [[chunkTopK]] when the chunk's rows are ALREADY collected (the
    * one-chunk fast path — saves re-scanning the query frame). */
  private def chunkTopKRows(cells: DataFrame, corpus: DataFrame, qframe: DataFrame,
      qs: Array[(Long, Array[Double])],
      model: Model, k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    // One LUT per (query, probed cell): for raw codes the cell makes
    // no difference (the LUT repeats nprobe×, KB-scale waste); for
    // residual codes the LUT quantizes q − centroid(cell) — the
    // asymmetric side of classic IVF-PQ.
    val matrix = model.coarse.centroids.map(_._2)
    def lutOf(v: Array[Double]): Array[Array[Double]] =
      Array.tabulate(model.pq.m) { j =>
        val off = j * model.pq.dsub
        model.pq.codebooks(j).map { c =>
          var s = 0.0; var i = 0
          while (i < c.length) { val d = v(off + i) - c(i); s += d * d; i += 1 }
          s
        }
      }
    val probeRows: Array[(Long, Int, Array[Double])] = qs.flatMap { case (qid, qv) =>
      val dists = matrix.map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { val d = qv(i) - c(i); s += d * d; i += 1 }
        s
      }
      dists.zipWithIndex.sortBy { case (d, cid) => (d, cid) }.take(nprobe)
        .map { case (_, cid) => (qid, cid, qv) }
    }
    val luts: Array[Array[Array[Double]]] = probeRows.map { case (_, cid, qv) =>
      if (model.residual) {
        val cent = matrix(cid)
        lutOf(Array.tabulate(qv.length)(i => qv(i) - cent(i)))
      } else lutOf(qv)
    }
    import qframe.sparkSession.implicits._
    // (li, qid, cell) probe rows — tiny (nQueries × nprobe), broadcast
    val probes = probeRows.zipWithIndex
      .map { case ((qid, cid, _), li) => (li, qid, cid) }.toSeq
      .toDF("li", "qid", "cell")

    val scored = cells.join(broadcast(probes), Seq("cell"))
      .where(col("qid") =!= col("id"))
      .withColumn("dist2", graft.expr.AdcScores.adcScore(col("codes"), col("li"), luts))
    val wShort = Window.partitionBy("qid").orderBy(col("dist2").asc, col("id"))
    val short = scored.withColumn("srank", row_number().over(wShort))
      .where(col("srank") <= k * shortlist)
      .select("qid", "id")

    val vecs = corpus.select(col("id"), asDouble(col("embedding")).as("vec"))
    val exact = short.join(vecs, Seq("id")).join(broadcast(qframe), Seq("qid"))
      .withColumn("cosine", Similarity.cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "id", "cosine", "rank")
  }
}
