package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with known stats: 4 docs, hand-countable tf/df
  private def corpus = Seq(
    (1L, "spark joins data with spark"),
    (2L, "hash join beats sort join"),
    (3L, "the vector scan is fast"),
    (4L, "spark hash join")).toDF("doc_id", "text")

  test("buildStats: tf, df, dl, and global totals are exact") {
    val st = Bm25.buildStats(corpus)
    assert(st.nDocs == 4L)
    assert(st.sumDl == 5L + 5L + 5L + 3L)
    val tf = st.postings.where($"term" === "spark")
      .orderBy("doc_id").select("doc_id", "tf").as[(Long, Long)].collect().toSeq
    assert(tf == Seq((1L, 2L), (4L, 1L)))
    val df = st.df.where($"term".isin("spark", "join", "the"))
      .orderBy("term").select("term", "df").as[(String, Long)].collect().toSeq
    assert(df == Seq(("join", 2L), ("spark", 2L), ("the", 1L)))
    st.postings.unpersist(blocking = false)
  }

  test("scoreTerms ≡ score(buildStats(docs)) — null text and multi-term, bit-exact") {
    val withNullDoc = corpus.unionByName(
      Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val terms = Seq("spark", "join", "the", "absent")
    val st = Bm25.buildStats(withNullDoc)
    val viaStats = Bm25.score(st, terms)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val oneShot = Bm25.scoreTerms(withNullDoc, terms)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(oneShot == viaStats) // exact doubles: same totals, same contrib tree
    st.postings.unpersist(blocking = false)
  }

  test("score matches the closed-form BM25 value") {
    val st = Bm25.buildStats(corpus)
    val got = Bm25.topK(st, Seq("spark"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    def bm25(tf: Long, df: Long, dl: Long): Double = {
      val avgdl = st.sumDl.toDouble / st.nDocs.toDouble
      val idf = math.log(1.0 + (st.nDocs.toDouble - df + 0.5) / (df + 0.5))
      val raw = idf * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl))
      BigDecimal(raw).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.keySet == Set(1L, 4L))
    assert(math.abs(got(1L) - bm25(2, 2, 5)) < 1e-11)
    assert(math.abs(got(4L) - bm25(1, 2, 3)) < 1e-11)
    // doc 4 is shorter than average → its single occurrence outranks
    // a flat tf=1 at dl=5 (the length normalization doing its job)
    assert(got(4L) > bm25(1, 2, 5))
    st.postings.unpersist(blocking = false)
  }

  test("multi-term scores sum per doc; n_terms counts matched terms") {
    val st = Bm25.buildStats(corpus)
    val row = Bm25.score(st, Seq("spark", "join"))
      .where($"doc_id" === 4L).select("n_terms", "score")
      .as[(Long, Double)].head()
    assert(row._1 == 2L)
    val single = Bm25.score(st, Seq("spark")).where($"doc_id" === 4L)
      .select("score").as[Double].head() +
      Bm25.score(st, Seq("join")).where($"doc_id" === 4L)
        .select("score").as[Double].head()
    assert(math.abs(row._2 - single) < 1e-11)
    st.postings.unpersist(blocking = false)
  }

  test("persisted index: two disjoint appends ≡ one in-memory build") {
    val st = Bm25.buildStats(corpus)
    val expect = Bm25.topK(st, Seq("spark", "join", "scan"), k = 10)
      .select("doc_id", "n_terms", "score").as[(Long, Long, Double)]
      .collect().toSet
    val idx = java.nio.file.Files.createTempDirectory("bm25spec").toString
    try {
      Bm25.appendIndex(corpus.where($"doc_id" <= 2), idx)
      Bm25.appendIndex(corpus.where($"doc_id" > 2), idx)
      val got = Bm25.topKIndexed(spark, idx, Seq("spark", "join", "scan"), k = 10)
        .select("doc_id", "n_terms", "score").as[(Long, Long, Double)]
        .collect().toSet
      assert(got == expect)
      // meta carries one delta row per append; totals sum exactly
      val meta = spark.read.parquet(s"$idx/meta")
      assert(meta.count() == 2L)
      assert(meta.agg(sum("n_docs"), sum("sum_dl"))
        .as[(Long, Long)].head() == ((4L, 18L)))
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(idx)
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
    st.postings.unpersist(blocking = false)
  }

  test("indexed query plan prunes postings partitions to the query terms' buckets") {
    val idx = java.nio.file.Files.createTempDirectory("bm25plan").toString
    try {
      Bm25.appendIndex(corpus, idx, nBuckets = 8)
      val plan = Bm25.topKIndexed(spark, idx, Seq("spark"), k = 5)
        .queryExecution.executedPlan.toString
      // the bucket column is a partition dir: the scan must carry a
      // pushed term filter, and the fused top-k must be present
      assert(plan.contains("PushedFilters") && plan.contains("term"),
        s"no pushed term filter in:\n$plan")
      assert(plan.contains("TakeOrderedAndProject"), "top-k did not fuse")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      try walk.iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  test("compactIndex: identical results, one file per bucket, one meta row") {
    val idx = java.nio.file.Files.createTempDirectory("bm25compact").toString
    try {
      // three appends → up to 3 files per touched bucket + 3 meta rows
      Bm25.appendIndex(corpus.where($"doc_id" === 1), idx, nBuckets = 8)
      Bm25.appendIndex(corpus.where($"doc_id" === 2 || $"doc_id" === 3), idx, nBuckets = 8)
      Bm25.appendIndex(corpus.where($"doc_id" === 4), idx, nBuckets = 8)
      val terms = Seq("spark", "join", "scan", "vector")
      val before = Bm25.topKIndexed(spark, idx, terms, k = 10)
        .select("doc_id", "n_terms", "score").as[(Long, Long, Double)]
        .collect().toSet
      val filesBefore = countParquetFiles(s"$idx/postings")
      assert(filesBefore.values.exists(_ > 1),
        s"fixture too weak — no bucket accumulated multiple files: $filesBefore")

      Bm25.compactIndex(spark, idx)

      val after = Bm25.topKIndexed(spark, idx, terms, k = 10)
        .select("doc_id", "n_terms", "score").as[(Long, Long, Double)]
        .collect().toSet
      assert(after == before, "compaction changed query results")
      val filesAfter = countParquetFiles(s"$idx/postings")
      assert(filesAfter.values.forall(_ == 1),
        s"a bucket still holds >1 file after compaction: $filesAfter")
      assert(filesAfter.keySet == filesBefore.keySet, "compaction lost a bucket dir")
      val meta = spark.read.parquet(s"$idx/meta")
      assert(meta.count() == 1L, "meta not collapsed to one row")
      assert(meta.select("n_docs", "sum_dl", "n_buckets")
        .as[(Long, Long, Int)].head() == ((4L, 18L, 8)))
      // no staging / __old debris survives the swap
      val leftovers = new java.io.File(idx).listFiles().map(_.getName)
        .filter(n => n.contains("__compacting") || n.contains("__old"))
      assert(leftovers.isEmpty, s"staging debris left behind: ${leftovers.mkString(",")}")
      // compaction is idempotent and re-appendable: a fresh append then
      // a second compaction still answers identically
      Bm25.appendIndex(Seq((9L, "spark scan again")).toDF("doc_id", "text"),
        idx, nBuckets = 8)
      val withNine = Bm25.topKIndexed(spark, idx, terms, k = 10)
        .select("doc_id").as[Long].collect().toSet
      Bm25.compactIndex(spark, idx)
      val withNineCompacted = Bm25.topKIndexed(spark, idx, terms, k = 10)
        .select("doc_id").as[Long].collect().toSet
      assert(withNine == withNineCompacted && withNine.contains(9L))
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      try walk.iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  /** parquet file count per bucket=N directory under a postings root */
  private def countParquetFiles(postingsDir: String): Map[String, Int] = {
    val root = new java.io.File(postingsDir)
    root.listFiles().filter(d => d.isDirectory && d.getName.startsWith("bucket="))
      .map(d => d.getName ->
        d.listFiles().count(f => f.getName.endsWith(".parquet")))
      .toMap
  }

  test("crash replay: stamped appends converge at every crash point") {
    val idx = java.nio.file.Files.createTempDirectory("bm25crash").toString
    val terms = Seq("spark", "join", "scan", "vector")
    def scores() = Bm25.topKIndexed(spark, idx, terms, k = 10)
      .select("doc_id", "n_terms", "score").as[(Long, Long, Double)]
      .collect().toSet
    try {
      val b0 = corpus.where($"doc_id" <= 2)
      val b1 = corpus.where($"doc_id" > 2)
      Bm25.appendIndex(b0, idx, nBuckets = 8, batchId = Some(0L))
      Bm25.appendIndex(b1, idx, nBuckets = 8, batchId = Some(1L))
      val ref = scores()
      val metaCount = spark.read.parquet(s"$idx/meta").count()
      assert(metaCount == 2L)

      // crash point: both writes landed, checkpoint didn't commit —
      // the harness replays batch 1; the stamped append must SKIP
      Bm25.appendIndex(b1, idx, nBuckets = 8, batchId = Some(1L))
      assert(scores() == ref, "full replay duplicated postings (scores drifted)")
      assert(spark.read.parquet(s"$idx/meta").count() == 2L,
        "full replay duplicated the meta row")

      // crash point: meta landed, postings write died (the documented
      // meta-first torn state). Simulate by stripping batch 1's
      // postings rows, then replay — the append must finish ONLY the
      // postings, not double the meta.
      val keep = spark.read.parquet(s"$idx/postings")
        .where($"batch_id".isNull || $"batch_id" =!= 1L)
        .localCheckpoint(true)
      val fs = new org.apache.hadoop.fs.Path(idx)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(s"$idx/postings"), true)
      keep.repartition(col("bucket"))
        .write.partitionBy("bucket").parquet(s"$idx/postings")
      assert(scores() != ref, "fixture: torn state should be missing batch 1")
      Bm25.appendIndex(b1, idx, nBuckets = 8, batchId = Some(1L))
      assert(scores() == ref, "torn-state resume did not restore the index")
      assert(spark.read.parquet(s"$idx/meta").count() == 2L,
        "torn-state resume re-appended the meta row")

      // and compaction preserves the stamps: a replay AFTER compaction
      // is still detected as landed
      Bm25.compactIndex(spark, idx)
      Bm25.appendIndex(b1, idx, nBuckets = 8, batchId = Some(1L))
      assert(scores() == ref, "post-compaction replay duplicated the batch")
      assert(spark.read.parquet(s"$idx/meta").count() == 2L,
        "compaction must keep one meta row per batch_id")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      try walk.iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  test("partial-commit recovery: a half-landed postings batch is stripped and rewritten, not skipped") {
    val idx = java.nio.file.Files.createTempDirectory("bm25partial").toString
    val terms = Seq("spark", "join", "scan", "vector")
    def scores() = Bm25.topKIndexed(spark, idx, terms, k = 10)
      .select("doc_id", "n_terms", "score").as[(Long, Long, Double)]
      .collect().toSet
    def batchPostings() = spark.read.parquet(s"$idx/postings")
      .where($"batch_id" === 1L).count()
    try {
      val b0 = corpus.where($"doc_id" <= 2)
      val b1 = corpus.where($"doc_id" > 2)
      Bm25.appendIndex(b0, idx, nBuckets = 8, batchId = Some(0L))
      Bm25.appendIndex(b1, idx, nBuckets = 8, batchId = Some(1L))
      val ref = scores()
      val refBatch = batchPostings()
      assert(refBatch > 1, "fixture: batch 1 needs >1 posting to split")

      // crash point: the postings JOB commit died half-way (the
      // FileOutputCommitter-v2 window) — only SOME of batch 1's
      // posting rows are visible, and the meta row (written first) is
      // fully landed. The old existence-keyed probe read 'some rows
      // present' as 'landed' and SKIPPED — permanently losing the
      // missing postings while meta still counted the whole batch.
      val keep = spark.read.parquet(s"$idx/postings")
        .where($"batch_id".isNull || $"batch_id" =!= 1L ||
          pmod($"doc_id" + length($"term"), lit(2)) === 0)
        .localCheckpoint(true)
      val fs = new org.apache.hadoop.fs.Path(idx)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(s"$idx/postings"), true)
      keep.repartition(col("bucket"))
        .write.partitionBy("bucket").parquet(s"$idx/postings")
      val partial = batchPostings()
      assert(partial > 0 && partial < refBatch,
        "fixture: the partial state should hold SOME but not all of batch 1")

      Bm25.appendIndex(b1, idx, nBuckets = 8, batchId = Some(1L))
      assert(batchPostings() == refBatch,
        "partial-commit replay did not restore the batch's postings")
      assert(scores() == ref, "partial-commit recovery drifted the scores")
      assert(spark.read.parquet(s"$idx/meta").count() == 2L,
        "partial-commit replay re-appended the meta row")
      // and the recovered index is again idempotent under replay
      Bm25.appendIndex(b1, idx, nBuckets = 8, batchId = Some(1L))
      assert(scores() == ref)
      assert(batchPostings() == refBatch)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      try walk.iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  test("removeDocs: takedown ≡ one-shot build over the survivors; stamped retry idempotent") {
    val idx = java.nio.file.Files.createTempDirectory("bm25rm").toString
    val surv = java.nio.file.Files.createTempDirectory("bm25surv").toString
    val terms = Seq("spark", "join", "scan", "vector")
    def scores(p: String) = Bm25.topKIndexed(spark, p, terms, k = 10)
      .select("doc_id", "n_terms", "score").as[(Long, Long, Double)]
      .collect().toSet
    def metaTotals(p: String) = {
      val r = spark.read.option("mergeSchema", "true").parquet(s"$p/meta")
        .agg(sum("n_docs"), sum("sum_dl")).head()
      (r.getLong(0), r.getLong(1))
    }
    try {
      // removed set: docs 1 and 4 (+ an unknown id, which must no-op)
      val removed = Seq(1L, 4L, 999L).toDF("doc_id")
      Bm25.appendIndex(corpus, idx, nBuckets = 8)
      Bm25.removeDocs(spark, idx, removed, removeId = Some(7L))
      Bm25.appendIndex(corpus.where($"doc_id" =!= 1L && $"doc_id" =!= 4L),
        surv, nBuckets = 8)
      val want = scores(surv)
      assert(scores(idx) == want,
        "takedown index must score bit-identically to a build over the survivors")
      assert(metaTotals(idx) == metaTotals(surv),
        "summed meta deltas must equal the survivors' exact totals")
      assert(!scores(idx).exists(s => s._1 == 1L || s._1 == 4L))
      // no postings of the removed docs survive anywhere
      assert(spark.read.option("mergeSchema", "true").parquet(s"$idx/postings")
        .where($"doc_id".isin(1L, 4L)).isEmpty)

      // stamped retry (crash-replay of the whole removal): idempotent
      Bm25.removeDocs(spark, idx, removed, removeId = Some(7L))
      assert(scores(idx) == want, "stamped retry double-decremented")
      // compaction preserves the remove stamp — retry after re-layout
      Bm25.compactIndex(spark, idx)
      Bm25.removeDocs(spark, idx, removed, removeId = Some(7L))
      assert(scores(idx) == want, "post-compaction retry double-decremented")
      // an unstamped removal of already-gone ids is also a no-op
      Bm25.removeDocs(spark, idx, removed)
      assert(scores(idx) == want)
      // and the index keeps living: a later append folds in normally
      val more = Seq((10L, "spark vector scan again")).toDF("doc_id", "text")
      Bm25.appendIndex(more, idx, nBuckets = 8)
      Bm25.appendIndex(more, surv, nBuckets = 8)
      assert(scores(idx) == scores(surv),
        "post-takedown append must keep tracking the survivors' index")
    } finally Seq(idx, surv).foreach { p =>
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try walk.iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  test("removeDocs of a stamped batch + that batch's replay: takedown survives (per-batch meta decrement)") {
    val idx = java.nio.file.Files.createTempDirectory("bm25-rm-replay").toString
    val terms = Seq("spark", "join", "scan", "vector")
    def scores() = Bm25.topKIndexed(spark, idx, terms, k = 10)
      .select("doc_id", "n_terms", "score").as[(Long, Long, Double)]
      .collect().toSet
    val batch0 = corpus.where($"doc_id" <= 2L)
    Bm25.appendIndex(batch0, idx, nBuckets = 8, batchId = Some(0L))
    Bm25.appendIndex(corpus.where($"doc_id" >= 3L), idx, nBuckets = 8,
      batchId = Some(1L))
    Bm25.removeDocs(spark, idx, Seq(1L).toDF("doc_id"), removeId = Some(3L))
    val want = scores()
    assert(!want.exists(_._1 == 1L))

    // replay of the long-committed batch 0 (a backfill re-run, a
    // restarted stream re-delivering from an old offset): the
    // per-batch decrement row makes the count-keyed resume sum batch
    // 0's meta rows to the POST-takedown posting count — fully landed,
    // skip. Without it (the r14 state) the resume read the takedown as
    // a partial commit, stripped batch 0's remainder and re-appended
    // the whole batch: doc 1 resurrected while the negative global
    // delta still applied (wrong N and sum_dl on every later score).
    Bm25.appendIndex(batch0, idx, nBuckets = 8, batchId = Some(0L))
    assert(scores() == want, "a replayed batch resurrected a taken-down doc")
    assert(spark.read.option("mergeSchema", "true").parquet(s"$idx/postings")
      .where($"doc_id" === 1L).isEmpty)
    // and the decrement survives compaction (meta collapses per
    // (batch_id, remove_id), so the batch's sum is unchanged)
    Bm25.compactIndex(spark, idx)
    Bm25.appendIndex(batch0, idx, nBuckets = 8, batchId = Some(0L))
    assert(scores() == want, "post-compaction replay resurrected a taken-down doc")
  }

  test("NULL text contributes no postings; inconsistent bucket counts fail fast") {
    val withNull = corpus.union(Seq((9L, null: String)).toDF("doc_id", "text"))
    val st = Bm25.buildStats(withNull)
    assert(st.nDocs == 4L) // the NULL doc has no tokens, hence no dl row
    st.postings.unpersist(blocking = false)
    val idx = java.nio.file.Files.createTempDirectory("bm25bad").toString
    try {
      Bm25.appendIndex(corpus.where($"doc_id" <= 2), idx, nBuckets = 8)
      Bm25.appendIndex(corpus.where($"doc_id" > 2), idx, nBuckets = 16)
      val e = intercept[IllegalArgumentException] {
        Bm25.topKIndexed(spark, idx, Seq("spark"), k = 5).collect()
      }
      assert(e.getMessage.contains("n_buckets"))
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      try walk.iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }
  test("torn staged swap (postings renamed to __old): every append shape restores, never re-creates") {
    val idx = java.nio.file.Files.createTempDirectory("bm25-torn-swap").toString
    val ref = java.nio.file.Files.createTempDirectory("bm25-torn-ref").toString
    val terms = Seq("spark", "join", "scan", "vector")
    def scores(path: String) = Bm25.topKIndexed(spark, path, terms, k = 10)
      .select("doc_id", "n_terms", "score").as[(Long, Long, Double)]
      .collect().toSet
    Bm25.appendIndex(corpus, ref, nBuckets = 8)

    // crash between the postings swap's two renames, then the COMMON
    // gate/soak shape: an UNSTAMPED append. Before the unconditional
    // restore this path skipped the torn-swap check entirely (it lives
    // behind "this batch's meta row exists"), re-created postings/
    // with only the new batch, and left meta counting every batch -
    // silently wrong N/avgdl/df on the next probe.
    Bm25.appendIndex(corpus.where($"doc_id" <= 2L), idx, nBuckets = 8,
      batchId = Some(0L))
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def p(x: String) = new org.apache.hadoop.fs.Path(x)
    assert(fs.rename(p(s"$idx/postings"), p(s"$idx/postings__old")))
    Bm25.appendIndex(corpus.where($"doc_id" >= 3L), idx, nBuckets = 8)
    assert(scores(idx) == scores(ref),
      "unstamped append after a torn swap lost the prior batch")

    // a NEW stamped batch (no meta row yet) over a fresh torn state:
    // the result must equal a one-shot build over corpus + the batch
    assert(fs.rename(p(s"$idx/postings"), p(s"$idx/postings__old")))
    Bm25.appendIndex(Seq((9L, "spark vector")).toDF("doc_id", "text"), idx,
      nBuckets = 8, batchId = Some(7L))
    val ref2 = java.nio.file.Files.createTempDirectory("bm25-torn-ref2").toString
    Bm25.appendIndex(
      corpus.unionByName(Seq((9L, "spark vector")).toDF("doc_id", "text")),
      ref2, nBuckets = 8)
    assert(scores(idx) == scores(ref2),
      "new-batch append after a torn swap lost the prior index")
  }
}
