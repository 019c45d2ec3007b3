package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the corpus in embedding space, then prune
  * near-duplicate pairs WITHIN each cluster only. The clustering is the
  * whole scale story — pairwise cosine over a 100 TB corpus is n² and
  * impossible, but within k balanced clusters it is n²/k per cluster
  * task, and k grows with the corpus (the paper runs ~50 k clusters on
  * LAION; at 100 TB pick k ≈ n / 5000 and train with [[Ivf.fit]]).
  *
  * Composition, not a new engine: production clusters come from the
  * existing IVF k-means trainer ([[Ivf.fit]] → [[Ivf.assign]]), and
  * [[prune]] accepts ANY (id, vec, cluster) frame. [[assignByCosine]]
  * is the deterministic seed-centroid assignment used by the oracle
  * gate and by callers who already have fixed centroids.
  *
  * Scale design:
  *   - assignment is a single codegen projection against a
  *     driver-collected centroid matrix riding as ONE reference object
  *     — zero joins, zero shuffles, O(1) plan size in k (centroids are
  *     KB-scale by construction; large-k production assignment goes
  *     through [[Ivf.assign]], same shape);
  *   - the prune self-join shuffles both sides on the cluster key once;
  *     each cluster's pairs are generated inside one task, so cost is
  *     Σ|cluster|², bounded by the clustering granularity;
  *   - the removal set is distinct ids only (narrow), and the final
  *     anti-join re-uses the corpus partitioning.
  */
object SemDedup {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Assign each corpus row to its max-cosine centroid.
    *
    * Centroids are collected to the driver (they are small by
    * definition — seed vectors or a trained quantizer) and ride as ONE
    * reference object inside [[graft.expr.CentroidExprs.BestCosineCell]],
    * so the argmax is one whole-stage-codegen pass over the corpus with
    * O(1) plan size in k — k per-centroid expression nodes would bloat
    * analysis and overflow generated methods near k ≈ 10³ (the same
    * trap [[Ivf.nearestCentroid]] and `expr.LshKeys` document). Ties
    * break to the LOWEST centroid id (cosine DESC, cid ASC) —
    * deterministic and oracle-matchable.
    *
    * Rows with a null embedding are dropped (no meaningful cluster).
    *
    * @param corpus    (`id`, `embedding` array<numeric>, carry cols)
    * @param centroids (`cid` numeric, `embedding`) — must be small
    * @return corpus columns + `cluster` (long) + `centroid_cosine`
    */
  def assignByCosine(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    Reserved.requireAbsent("semdedup.assignByCosine",
      Seq("cluster", "centroid_cosine", "__best"), corpus)
    val cents: Array[(Long, Array[Double])] = centroids
      .where(col("embedding").isNotNull)
      .select(col("cid").cast("long"), asDouble(col("embedding")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty, "semdedup: empty centroid set")
    require(cents.length <= 4096,
      s"semdedup: ${cents.length} centroids exceed the driver-collect " +
        "budget — train a coarse quantizer with Ivf.fit and assign " +
        "with Ivf.assign instead")
    val best = graft.expr.CentroidExprs.bestCosineCell(
      asDouble(col("embedding")), cents.map(_._1), cents.map(_._2))
    corpus
      .where(col("embedding").isNotNull)
      .withColumn("__best", best)
      .withColumn("cluster", col("__best.cluster"))
      .withColumn("centroid_cosine", col("__best.cosine"))
      .drop("__best")
  }

  /** Remove every row that has a LOWER-id neighbour in the SAME cluster
    * with cosine ≥ `threshold` (greedy keep-lowest-id, the
    * deterministic variant of the paper's one-per-group pruning; the
    * removal decision looks at all lower-id cluster mates, kept or
    * not, so it is a single pass — no iteration).
    *
    * @param assigned   (`id`, vecCol, clusterCol, carry cols)
    * @param clusterCol cluster key (`cell` for [[Ivf.assign]] output)
    * @param vecCol     embedding column (`vec` for [[Ivf.assign]])
    * @return the surviving subset of `assigned`, columns unchanged
    */
  def prune(assigned: DataFrame, threshold: Double,
      clusterCol: String = "cluster", vecCol: String = "embedding"): DataFrame = {
    Reserved.requireAbsent("semdedup.prune",
      Seq("__c", "__id1", "__id2", "__v1", "__v2", "__rm"), assigned)
    val side = assigned.select(col(clusterCol).as("__c"), col("id"),
      asDouble(col(vecCol)).as("__v"))
    val l = side.select(col("__c"), col("id").as("__id1"), col("__v").as("__v1"))
    val r = side.select(col("__c"), col("id").as("__id2"), col("__v").as("__v2"))
    val removed = l.join(r, "__c")
      .where(col("__id1") < col("__id2"))
      .where(Similarity.cosine(col("__v1"), col("__v2")) >= threshold)
      .select(col("__id2").as("__rm"))
      .distinct()
    assigned.join(removed, col("id") === col("__rm"), "left_anti")
  }

  /** Seed-centroid SemDeDup end-to-end: assign by cosine, prune within
    * clusters. Production path with a trained quantizer:
    * `prune(Ivf.assign(corpus, Ivf.fit(corpus, nlist)), τ,
    * clusterCol = "cell", vecCol = "vec")`. */
  def semDedup(corpus: DataFrame, centroids: DataFrame,
      threshold: Double): DataFrame =
    prune(assignByCosine(corpus, centroids), threshold)

  /** Incremental SemDeDup against a persisted SEEN-vector index — the
    * dedup-on-ingest form ([[graft.streaming.EventStreams
    * .semDedupStream]] wires it per micro-batch): arriving vectors
    * assign to the FROZEN `centroids`, and a row is removed when a
    * same-cluster vector at cosine ≥ `threshold` exists either in ANY
    * earlier batch or at a LOWER id within its own batch. For
    * id-ascending arrival this is EXACTLY the batch [[semDedup]] over
    * the union (the batch removal rule "some lower-id cluster mate,
    * kept or not, is τ-close" decomposes by batch precisely when
    * earlier-batch ⇒ lower-id; EventStreamsSpec pins the equivalence) —
    * which is also why the index stores EVERY seen vector, not just
    * survivors: the batch rule's witness set is all rows.
    *
    * Crash ordering follows [[Dedup.paragraphDedupIncrement]]: output
    * materializes BEFORE the index append (a retry re-emits, never
    * self-strips), and the `batchId` stamp excludes the replaying
    * batch's own rows from "seen", closing the crash-after-both-writes
    * window. Replay-duplicated index rows are exact duplicates —
    * [[IndexMaintenance.compactDir]] with `dedupeRows = true` collapses
    * them on whatever cadence the stream chooses.
    *
    * Scale: one shuffle on the cluster key per batch (the [[prune]]
    * topology, incrementalized); the candidate join is |batch| ×
    * |cluster members|, bounded by the clustering granularity exactly
    * like the batch pass. The index grows ∝ corpus — it IS the corpus
    * in embedding space, cluster-keyed.
    *
    * @param newRows (`id`, `embedding`, carry cols) — id-disjoint from
    *   every earlier batch (the index-family contract)
    * @return the batch's surviving rows (assignByCosine columns) */
  def semDedupIncrement(newRows: DataFrame, centroids: DataFrame,
      threshold: Double, indexPath: String,
      batchId: Option[Long] = None): DataFrame = {
    val spark = newRows.sparkSession
    Reserved.requireAbsent("semdedup.increment",
      Seq("__c", "__id1", "__id2", "__v1", "__v2", "__rm", "__sv"), newRows)
    val assigned = assignByCosine(newRows, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idxDir = new org.apache.hadoop.fs.Path(s"$indexPath/vectors")
    // restore a dir lost by an interrupted compaction BEFORE the
    // existence probe: degrading to "no index yet" would both skip the
    // cross-batch prune (wrong output) and re-create the seen set with
    // only this batch (permanent loss at the next rewrite)
    IndexMaintenance.guardAppend(spark, idxDir.toString)
    val haveIndex = idxDir.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(idxDir)

    val side = assigned.select(col("cluster").as("__c"), col("id"),
      asDouble(col("embedding")).as("__v1"))
    // within-batch rule: a lower-id τ-close batch mate removes the row
    val withinRm = side
      .join(side.select(col("__c"), col("id").as("__id2"),
        col("__v1").as("__v2")), "__c")
      .where(col("id") < col("__id2"))
      .where(Similarity.cosine(col("__v1"), col("__v2")) >= threshold)
      .select(col("__id2").as("__rm"))
    // cross-batch rule: ANY earlier-batch τ-close cluster mate removes
    // it (earlier batches always win — keep-first, id-blind)
    val seenRm =
      if (!haveIndex) withinRm.limit(0)
      else {
        val idx0 = IndexMaintenance.readStamped(spark, idxDir.toString)
        val seen = batchId match {
          case Some(b) if idx0.columns.contains("batch_id") =>
            idx0.where(col("batch_id").isNull || col("batch_id") =!= b)
          case _ => idx0
        }
        side.join(seen.select(col("cluster").as("__c"), col("vec").as("__sv")), "__c")
          .where(Similarity.cosine(col("__v1"), col("__sv")) >= threshold)
          .select(col("id").as("__rm"))
      }
    val removed = withinRm.unionByName(seenRm).distinct()
    val out = assigned.join(removed, col("id") === col("__rm"), "left_anti")
      .localCheckpoint(true) // output BEFORE the append — see scaladoc
    assigned
      .select(col("id"), asDouble(col("embedding")).as("vec"), col("cluster"))
      .withColumn("batch_id",
        batchId.map(lit(_)).getOrElse(lit(null)).cast("long"))
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(idxDir.toString)
    assigned.unpersist(blocking = false)
    out
  }

  /** DELETE/takedown propagation for the seen-vector index — the
    * inverse lifecycle verb to [[semDedupIncrement]]'s append: strip
    * the ids' rows from `vectors/` ([[IndexMaintenance
    * .rewriteExcludingKeys]] — staged swap, doubling as a re-layout
    * compaction; replay-duplicated rows still need the usual
    * `compactDir(dedupeRows = true)` cadence). A removed vector stops
    * pruning future batches: the
    * stripped index is row-identical to one accumulated over the
    * surviving batches only (SemDedupSpec pins increment equality),
    * which is the right takedown semantics — an erased document's
    * embedding must not keep suppressing near-duplicates it can no
    * longer be compared against. Naturally idempotent; unknown ids
    * are no-ops. Removing ids of a batch whose streaming checkpoint
    * hasn't committed is REFUSED at runtime when `checkpoint` names
    * the maintaining stream's checkpoint
    * ([[IndexMaintenance.requireBatchesCommitted]] — quiescence plus
    * the stamped cross-check, the vectors are batch-stamped); without
    * it the race stays the caller's contract (the index-family rule). */
  def removeSeen(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, ids: DataFrame,
      checkpoint: Option[String] = None): Unit = {
    checkpoint.foreach { cp =>
      // heal a torn compaction swap BEFORE the guard's read — the
      // strip below would heal it anyway, but the guard reads first
      IndexMaintenance.guardAppend(spark, s"$indexPath/vectors")
      val affected = IndexMaintenance.readStamped(spark, s"$indexPath/vectors")
        .join(ids.select(col("id")), Seq("id"), "left_semi")
      IndexMaintenance.requireBatchesCommitted(spark, affected, cp,
        s"SemDedup.removeSeen($indexPath)")
    }
    IndexMaintenance.rewriteExcludingKeys(spark, s"$indexPath/vectors",
      ids.select(col("id")), "id")
  }
}
