package graft.ops

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shared maintenance for the persisted append-only index directories
  * the incremental operators accumulate (paragraph-dedup fingerprints,
  * MinHash band indexes, boilerplate line stats, …): every append adds
  * at least one parquet file, so at streaming cadence any of them hits
  * the small-file cliff — a year of 5-minute triggers is ~10⁵ files,
  * and every query pays the listing + open cost.
  *
  * [[compactDir]] is the generic re-layout: read → optionally
  * `distinct` → repartition → staged-rename swap (live→__old,
  * staged→live, drop __old — the `Warehouse.compact` crash ordering:
  * every intermediate state keeps the data adjacent, never
  * deleted-before-replaced). It is only correct for indexes whose
  * semantics are ROW-SET semantics — where any rewrite of the same
  * rows (or, with `dedupeRows`, of the distinct row set) answers
  * queries identically. That holds for fingerprint sets (anti-join
  * membership), band indexes (candidate generation), and additive
  * stats rows; it does NOT hold for anything carrying file-order or
  * per-append meta — [[Bm25.compactIndex]] stays bespoke for exactly
  * that reason (its meta rows collapse by SUM, not distinct).
  */
object IndexMaintenance {

  /** Compact one flat parquet directory in place.
    *
    * @param dedupeRows also collapse duplicate rows — for
    *   membership-set indexes (e.g. the paragraph-dedup `pmd5` dir,
    *   where an at-least-once retry may have appended the same
    *   fingerprints twice); duplicates there are semantically inert,
    *   so dropping them is a pure shrink. Leave false for indexes
    *   where row multiplicity carries information (additive stats).
    * @param targetFiles output file count (1 is right until the index
    *   outgrows a single task's comfortable write — then pick
    *   ~bytes/128 MB).
    * @param partitionCols keep this hive-partition layout through the
    *   rewrite (e.g. the IVF `cell` key) — rows shuffle BY the
    *   partition columns so each task writes whole partitions: one
    *   file per partition value, the layout a partition-pruned probe
    *   wants; `targetFiles` is ignored on this path. */
  def compactDir(spark: SparkSession, dir: String,
      dedupeRows: Boolean = false, targetFiles: Int = 1,
      partitionCols: Seq[String] = Nil): Unit = {
    require(targetFiles > 0, "targetFiles must be positive")
    rewriteDir(spark, dir, targetFiles, partitionCols) { df0 =>
      if (dedupeRows) df0.distinct() else df0
    }
  }

  /** Rewrite one index directory EXCLUDING the rows whose `keyCol`
    * value appears in `keys` — the shared row-strip behind
    * DELETE/takedown propagation (the removeDocs family) and behind
    * clearing a partially-committed batch before a crash-replay
    * re-appends it (`keys` = the one batch_id). Anti-join semantics:
    * duplicate keys are harmless and rows with a NULL key never match
    * (legacy unstamped rows survive a batch_id strip untouched).
    * Naturally IDEMPOTENT — re-running the same exclusion is a pure
    * re-layout. Only correct for ROW-SET-semantics directories, like
    * [[compactDir]]; the rewrite doubles as a compaction (same layout
    * rules). `rangeSortCols` preserves a range-laid-out, sorted flat
    * dir (the band-index `buckets/` shape) instead of the
    * `targetFiles` collapse. */
  def rewriteExcludingKeys(spark: SparkSession, dir: String,
      keys: org.apache.spark.sql.DataFrame, keyCol: String,
      targetFiles: Int = 1, partitionCols: Seq[String] = Nil,
      rangeSortCols: Seq[String] = Nil): Unit =
    rewriteDir(spark, dir, targetFiles, partitionCols, rangeSortCols) { df0 =>
      require(df0.columns.contains(keyCol),
        s"rewriteExcludingKeys: $dir has no column $keyCol")
      df0.join(keys.select(col(keyCol)), Seq(keyCol), "left_anti")
    }

  /** The shared RESUME PROBE of a log-first stamped append (the
    * [[Ivf.appendIndex]] protocol, reused by [[IvfPq.appendIndex]]):
    * given a tiny `logDir` of (batch_id, n_rows) intent rows written
    * BEFORE the data and a `dataDir` of batch_id-stamped rows, decide
    * how a (possibly replayed) stamped append should proceed — and
    * repair a PARTIALLY committed batch on the way.
    *
    * Returns (logLanded, fullyLanded):
    *   - (true, true)  → the batch landed completely; skip everything.
    *   - (true, false) → the log landed but the data is absent or was
    *     partial; any partial rows have been STRIPPED (staged swap) —
    *     write the data only, not the log.
    *   - (false, false) → nothing landed (or the probe degraded on an
    *     unreadable dir): full append.
    *
    * Completeness is keyed on the logged EXPECTED row count, not mere
    * existence — a crash inside the data parquet job commit (all of it
    * under FileOutputCommitter v2) leaves SOME task files visible, and
    * an existence-keyed skip would permanently lose the rest. Legacy
    * log rows without n_rows resume on existence (nothing better is
    * recoverable for them). The probe itself degrades to "not landed"
    * on unreadable dirs (torn _temporary debris must not kill a
    * recovery), but the strip runs OUTSIDE that degrade — a failed
    * strip must abort the append, not be swallowed. */
  def resumeStampedAppend(spark: SparkSession, logDir: String,
      dataDir: String, batchId: Option[Long],
      partitionCols: Seq[String]): (Boolean, Boolean) = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(logDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val (logLanded, expected, landed) = batchId match {
      case Some(b) if fs.exists(new org.apache.hadoop.fs.Path(logDir)) =>
        try {
          val log0 = spark.read.option("mergeSchema", "true").parquet(logDir)
          val logRow = log0.where(col("batch_id") === b).collect().headOption
          val exp =
            if (logRow.isDefined && log0.columns.contains("n_rows"))
              Option(logRow.get.getAs[Any]("n_rows")).map(_.asInstanceOf[Long])
            else None
          val n =
            if (logRow.isEmpty) 0L
            else {
              val data = spark.read.option("mergeSchema", "true").parquet(dataDir)
              if (!data.columns.contains("batch_id")) 0L
              else data.where(col("batch_id") === b).count()
            }
          (logRow.isDefined, exp, n)
        } catch { case _: Exception => (false, None, 0L) }
      case _ => (false, None, 0L)
    }
    val fullyLanded = logLanded && (expected match {
      case Some(n) => landed == n
      case None => landed > 0 // legacy log row: existence-keyed resume
    })
    if (logLanded && !fullyLanded && landed > 0)
      rewriteExcludingKeys(spark, dataDir,
        Seq(batchId.get).toDF("batch_id"), "batch_id",
        partitionCols = partitionCols)
    (logLanded, fullyLanded)
  }

  /** The shared read → transform → staged-rename swap (live→__old,
    * staged→live, drop __old — every intermediate state keeps the data
    * adjacent, never deleted-before-replaced). */
  private def rewriteDir(spark: SparkSession, dir: String,
      targetFiles: Int, partitionCols: Seq[String],
      rangeSortCols: Seq[String] = Nil)(
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(dir)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(live), s"no index directory at $dir")
    val staged = new Path(s"$dir/../${live.getName}__compacting").toString
    fs.delete(new Path(staged), true)
    // mergeSchema: index dirs evolve (batch_id stamps arrived after
    // some dirs were first written); a first-footer read would DROP
    // the stamp column from every stamped row, erasing the replay
    // detection the stamps exist for. The rewrite reads all data
    // anyway — the footer-merge cost is noise.
    val df = transform(spark.read.option("mergeSchema", "true").parquet(dir))
    val shaped =
      if (rangeSortCols.nonEmpty)
        df.repartitionByRange(rangeSortCols.map(col): _*)
          .sortWithinPartitions(rangeSortCols.map(col): _*)
      else if (partitionCols.isEmpty) df.repartition(targetFiles)
      else df.repartition(partitionCols.map(col): _*)
    val w0 = shaped.write.mode(SaveMode.Overwrite)
    (if (partitionCols.isEmpty) w0 else w0.partitionBy(partitionCols: _*))
      .parquet(staged)
    val old = new Path(s"$dir/../${live.getName}__old")
    fs.delete(old, true)
    require(fs.rename(live, old), s"compaction: cannot stage out live $dir")
    if (!fs.rename(new Path(staged), live)) {
      require(fs.rename(old, live), s"compaction: $dir lost — data in $old")
      throw new IllegalStateException(s"compaction swap failed for $dir; live restored")
    }
    fs.delete(old, true)
  }
}
