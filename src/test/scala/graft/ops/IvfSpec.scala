package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("fit separates obvious clusters; assign is consistent") {
    // two tight blobs around (10,0,0) and (0,10,0)
    val vecs = ((0 until 20).map(i => (i.toLong, Array(10f + i * 0.01f, 0f, 0f))) ++
      (20 until 40).map(i => (i.toLong, Array(0f, 10f + i * 0.01f, 0f))))
      .toDF("id", "embedding")
    val model = Ivf.fit(vecs, nlist = 2, iters = 4)
    val cells = Ivf.assign(vecs, model)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val blob1 = (0L until 20L).map(cells)
    val blob2 = (20L until 40L).map(cells)
    assert(blob1.distinct.size == 1 && blob2.distinct.size == 1)
    assert(blob1.head != blob2.head)
  }

  test("seeding spreads over a sorted/clustered corpus: no empty cells, bounded skew") {
    // ids sorted BY cluster — the adversarial case for first-n-by-id
    // seeding (all seeds land in cluster 0 and Lloyd's never splits a
    // starved cell). 4 well-separated blobs of 25, nlist=4.
    val centers = Seq((0f, 0f), (50f, 0f), (0f, 50f), (50f, 50f))
    val vecs = centers.zipWithIndex.flatMap { case ((cx, cy), c) =>
      (0 until 25).map(i => ((c * 25 + i).toLong, Array(cx + i * 0.1f, cy - i * 0.1f)))
    }.toDF("id", "embedding")
    val model = Ivf.fit(vecs, nlist = 4, iters = 4)
    val sizes = Ivf.assign(vecs, model).groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.size == 4, s"expected 4 non-empty cells, got $sizes")
    assert(sizes.values.max <= 2 * sizes.values.min, s"cell skew too high: $sizes")
  }

  test("assign plan size is O(1) in nlist (centroid matrix rides as a reference object)") {
    val vecs = (0 until 64).map(i => (i.toLong, Array(i.toFloat, (64 - i).toFloat)))
      .toDF("id", "embedding")
    def planLen(nlist: Int): Int = {
      val m = Ivf.fit(vecs, nlist = nlist, iters = 1)
      Ivf.assign(vecs, m).queryExecution.sparkPlan.toString.length
    }
    val small = planLen(2)
    val big = planLen(32)
    // a least-chain formulation grows the plan ~16x here; the reference
    // -object form stays flat (allow slack for id-string noise)
    assert(big < small * 2, s"plan grew with nlist: $small -> $big")
  }

  test("topK with full probe equals brute force; reduced probe keeps decent recall") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.where(col("id") < 10).select(col("id").as("qid"), col("embedding"))
    val model = Ivf.fit(e, nlist = 8, iters = 3)

    val brute = Similarity.bruteForceTopK(e, q, k = 5)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Ivf.topK(e, q, model, k = 5, nprobe = 8) // all cells = exact
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute)

    val probed = Ivf.topK(e, q, model, k = 5, nprobe = 3)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect probed).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall")
  }

  test("topKFiltered: full probe ≡ brute force over the FILTERED corpus") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"), col("label"))
    val corpus = e.select("id", "embedding")
    val q = e.where(col("id") < 10).select(col("id").as("qid"), col("embedding"))
    val model = Ivf.fit(corpus, nlist = 8, iters = 3)
    val allowed = e.where(col("label").isin(1, 2, 3)).select("id")

    val brute = Similarity.bruteForceTopK(
        corpus.join(allowed, Seq("id"), "left_semi"), q, k = 5)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = Ivf.topKFiltered(corpus, q, model, allowed, k = 5, nprobe = 8)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered == brute)
    // results obey the filter (pre-filter, not post-filter: k rows survive)
    val labels = e.select(col("id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(filtered.forall { case (_, id) => Set(1, 2, 3)(labels(id)) })
    // duplicate ids in `allowed` must not multiply candidates
    val dup = Ivf.topKFiltered(corpus, q, model, allowed.union(allowed),
        k = 5, nprobe = 8)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dup == brute)
  }

  test("topKFilteredAdaptive: nprobe scales with measured selectivity; recall holds at 3 tiers") {
    // the scaling function itself, pinned exactly
    assert(Ivf.adaptiveNprobe(4, 16, 1.0) == 4, "full selectivity keeps the base")
    assert(Ivf.adaptiveNprobe(4, 16, 0.5) == 8)
    assert(Ivf.adaptiveNprobe(4, 16, 0.25) == 16)
    assert(Ivf.adaptiveNprobe(4, 16, 0.05) == 16, "caps at nlist")
    assert(Ivf.adaptiveNprobe(4, 16, 0.0) == 4, "degenerate: empty filter keeps the base")

    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.where(col("id") < 10).select(col("id").as("qid"), col("embedding"))
    val model = Ivf.fit(e, nlist = 8, iters = 3)

    // three tiers: ~100 %, ~30 %, ~10 % of the corpus pass the filter
    for (m <- Seq(1, 3, 10)) {
      val allowed = e.where(col("id") % m === 0).select("id")
      val brute = Similarity.bruteForceTopK(
          e.join(allowed, Seq("id"), "left_semi"), q, k = 5)
        .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Ivf.topKFilteredAdaptive(e, q, model, allowed, k = 5, nprobe = 3)
        .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute intersect got).size.toDouble / brute.size
      // selectivity ≤ 3/8 drives the effective nprobe to nlist = full
      // probe = exact; the 100 % tier runs the base nprobe and only
      // needs decent recall
      if (m >= 3) assert(got == brute,
        s"tier 1/$m: adaptive probe should be exact (full probe), recall $recall")
      else assert(recall >= 0.3, s"tier 1/$m recall $recall")
    }
  }

  test("save/load round trip: persisted index answers identically") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.where(col("id") < 5).select(col("id").as("qid"), col("embedding"))
    val model = Ivf.fit(e, nlist = 8, iters = 3)
    val path = java.nio.file.Files.createTempDirectory("ivf").toString

    Ivf.save(spark, model, e, path)
    val index = Ivf.load(spark, path)
    assert(index.model.centroids.map(_._1).toSeq == model.centroids.map(_._1).toSeq)
    index.model.centroids.zip(model.centroids).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq == b.toSeq)
    }
    // the cells frame is partitioned by cell on disk (one dir per cell)
    assert(new java.io.File(s"$path/cells").listFiles()
      .exists(_.getName.startsWith("cell=")))

    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = key(Ivf.topK(e, q, model, k = 5, nprobe = 3))
    val loaded = key(Ivf.topKIndexed(index, q, k = 5, nprobe = 3))
    assert(loaded == direct)

    // the persisted probe PRUNES cell partitions: the probed cell set
    // lands on the scan as PartitionFilters, so per-query I/O is
    // nprobe×|queries| cells, not the whole index
    val probePlan = Ivf.topKIndexed(index, q, k = 5, nprobe = 3)
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("PartitionFilters: [cell"),
      s"probe scan reads every cell partition — pruning filter missing:\n$probePlan")
  }

  test("appendIndex: fold-in ≡ one-shot save under the same model; compaction results-identical") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.where(col("id") < 5).select(col("id").as("qid"), col("embedding"))
    val base = e.where(col("id") % 5 =!= 0)
    val batch = e.where(col("id") % 5 === 0)
    val model = Ivf.fit(base, nlist = 8, iters = 3)
    val incPath = java.nio.file.Files.createTempDirectory("ivf-inc").toString
    val onePath = java.nio.file.Files.createTempDirectory("ivf-one").toString

    Ivf.save(spark, model, base, incPath)
    Ivf.appendIndex(spark, batch, incPath)
    Ivf.save(spark, model, e, onePath)

    // cell-assignment equality: the frozen quantizer gives the batch
    // the SAME cells a one-shot build would (set equality of rows)
    def cellSet(p: String) = spark.read.parquet(s"$p/cells")
      .select(col("id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cellSet(incPath) == cellSet(onePath),
      "append under the frozen quantizer must reproduce the one-shot cell layout")

    // probe equality at reduced nprobe (the approximate path, not just
    // the exact full-probe config)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val oneShot = key(Ivf.topKIndexed(Ivf.load(spark, onePath), q, k = 5, nprobe = 3))
    assert(key(Ivf.topKIndexed(Ivf.load(spark, incPath), q, k = 5, nprobe = 3)) == oneShot)

    // cellStats sees the whole union
    val n = Ivf.cellStats(spark, incPath).agg(sum("n_vectors")).head().getLong(0)
    assert(n == e.count())

    // compaction: one file per cell dir, results identical, no debris
    Ivf.compactIndex(spark, incPath)
    val cellDirs = new java.io.File(s"$incPath/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    cellDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName} has ${files.length} files after compaction")
    }
    assert(!new java.io.File(incPath).listFiles()
      .exists(f => f.getName.contains("__compacting") || f.getName.contains("__old")))
    assert(key(Ivf.topKIndexed(Ivf.load(spark, incPath), q, k = 5, nprobe = 3)) == oneShot)
    assert(cellSet(incPath) == cellSet(onePath))

    // dedupeRows: a double-appended batch (at-least-once retry) collapses
    Ivf.appendIndex(spark, batch, incPath)
    Ivf.compactIndex(spark, incPath, dedupeRows = true)
    assert(cellSet(incPath) == cellSet(onePath))
    assert(key(Ivf.topKIndexed(Ivf.load(spark, incPath), q, k = 5, nprobe = 3)) == oneShot)
  }

  test("appendIndex crash replay: stamped appends converge at every crash point") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.where(col("id") < 5).select(col("id").as("qid"), col("embedding"))
    val base = e.where(col("id") % 5 =!= 0)
    val batch = e.where(col("id") % 5 === 0)
    val model = Ivf.fit(base, nlist = 8, iters = 3)
    val path = java.nio.file.Files.createTempDirectory("ivf-crash").toString
    Ivf.save(spark, model, base, path)
    Ivf.appendIndex(spark, batch, path, Some(0L))
    def rows() = spark.read.parquet(s"$path/cells").count()
    def key() = Ivf.topKIndexed(Ivf.load(spark, path), q, k = 5, nprobe = 8)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val (refRows, refKey) = (rows(), key())

    // crash point: both writes landed, checkpoint didn't commit —
    // the replay must SKIP (an unstamped replay would duplicate every
    // vector and probes would emit duplicate candidates)
    Ivf.appendIndex(spark, batch, path, Some(0L))
    assert(rows() == refRows, "full replay duplicated cell rows")
    assert(key() == refKey)

    // crash point: appendlog landed, cells write died (log-first torn
    // state). Simulate by stripping batch 0's cell rows; the replay
    // must finish JUST the cells and not double the log.
    val keep = spark.read.parquet(s"$path/cells")
      .where(col("batch_id").isNull).localCheckpoint(true)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/cells"), true)
    keep.write.partitionBy("cell").parquet(s"$path/cells")
    assert(rows() < refRows, "fixture: torn state should be missing batch 0")
    Ivf.appendIndex(spark, batch, path, Some(0L))
    assert(rows() == refRows, "torn-state resume did not restore the cells")
    assert(key() == refKey)
    assert(spark.read.parquet(s"$path/appendlog").count() == 1L,
      "torn-state resume re-appended the log row")

    // compaction preserves both the stamps and the log: a replay
    // AFTER compaction is still detected as landed
    Ivf.compactIndex(spark, path)
    Ivf.appendIndex(spark, batch, path, Some(0L))
    assert(rows() == refRows, "post-compaction replay duplicated the batch")
    assert(key() == refKey)
  }

  test("rebuildIfDrifted: drifted index refits ≡ fresh fit+save; balanced index is a no-op") {
    // 4 tight blobs, 10 vectors each — fit lands one cell per blob
    def blob(cx: Double, cy: Double, cz: Double, ids: Range) =
      ids.map(i => (i.toLong, Array((cx + 0.001 * i).toFloat, cy.toFloat, cz.toFloat)))
    val init = (blob(10, 0, 0, 0 until 10) ++ blob(0, 10, 0, 10 until 20) ++
      blob(0, 0, 10, 20 until 30) ++ blob(7, 7, 0, 30 until 40))
      .toDF("id", "embedding")
    val model = Ivf.fit(init, nlist = 4, iters = 3)
    val path = java.nio.file.Files.createTempDirectory("ivf-drift").toString + "/idx"
    Ivf.save(spark, model, init, path)

    // balanced: no-op, layout untouched
    def layout() = spark.read.parquet(s"$path/cells")
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val before = layout()
    assert(!Ivf.rebuildIfDrifted(spark, path, maxRatio = 2.0, iters = 3))
    assert(layout() == before, "a balanced no-op must not rewrite the index")

    // drift: pile 40 new vectors onto blob 1's region — its cell goes
    // to ~50 of 80 rows (mean 20, ratio 2.5 > 2)
    val pile = blob(10, 0, 0, 100 until 140).toDF("id", "embedding")
    Ivf.appendIndex(spark, pile, path)
    assert(Ivf.rebuildIfDrifted(spark, path, maxRatio = 2.0, iters = 3),
      "skewed index must trigger the rebuild")

    // rebuild ≡ a fresh deterministic fit+save over the same rows
    val full = init.unionByName(pile)
    val refPath = java.nio.file.Files.createTempDirectory("ivf-ref").toString + "/idx"
    Ivf.save(spark, Ivf.fit(full, nlist = 4, iters = 3), full, refPath)
    def key(p: String) = {
      val q = full.where(col("id").isin(0L, 15L, 25L, 105L))
        .select(col("id").as("qid"), col("embedding"))
      Ivf.topKIndexed(Ivf.load(spark, p), q, k = 5, nprobe = 4)
        .select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    assert(key(path) == key(refPath),
      "rebuilt index must probe identically to a fresh fit+save")
    def cellOf(p: String) = spark.read.parquet(s"$p/cells")
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cellOf(path) == cellOf(refPath),
      "rebuilt assignment must equal the fresh fit's")
    // the refit is OPTIMAL for the data, which is genuinely skewed
    // (the piled blob holds 50 of 80 rows → ratio 2.5 even under a
    // fresh quantizer) — so the same 2.0 threshold would re-trigger
    // forever. Pin instead that the refit result is STABLE at a
    // threshold admitting the data's true shape: no further rebuild,
    // layout untouched.
    val rebuilt = cellOf(path)
    assert(!Ivf.rebuildIfDrifted(spark, path, maxRatio = 3.0, iters = 3))
    assert(cellOf(path) == rebuilt)
  }

  test("removeVectors: takedown ≡ one-shot save of the survivors under the same model") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.where(col("id") < 5).select(col("id").as("qid"), col("embedding"))
    val model = Ivf.fit(e, nlist = 8, iters = 3)
    val rmPath = java.nio.file.Files.createTempDirectory("ivf-rm").toString
    val survPath = java.nio.file.Files.createTempDirectory("ivf-surv").toString
    val removed = e.where(col("id") % 7 === 0).select("id")
    Ivf.save(spark, model, e, rmPath)
    Ivf.removeVectors(spark, rmPath, removed)
    Ivf.save(spark, model, e.where(col("id") % 7 =!= 0), survPath)
    def cellSet(p: String) = spark.read.parquet(s"$p/cells")
      .select("id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cellSet(rmPath) == cellSet(survPath),
      "stripped cells must equal the survivors' one-shot layout")
    def key(p: String) = Ivf.topKIndexed(Ivf.load(spark, p), q, k = 5, nprobe = 8)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = key(survPath)
    assert(key(rmPath) == want)
    // fixture strength: the removal actually changed probe results
    // (some removed id ranked in the full index's top-k)
    val fullKey = Ivf.topK(e, q, model, k = 5, nprobe = 8)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fullKey.exists(_._2 % 7 == 0) && fullKey != want,
      "fixture: removed ids should have been probe-relevant")
    // idempotent: re-running the same removal is a pure re-layout
    Ivf.removeVectors(spark, rmPath, removed)
    assert(cellSet(rmPath) == cellSet(survPath))
    assert(key(rmPath) == want)
  }

  test("appendIndex partial-commit recovery: a half-landed batch is stripped and rewritten, not skipped") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.where(col("id") < 5).select(col("id").as("qid"), col("embedding"))
    val base = e.where(col("id") % 5 =!= 0)
    val batch = e.where(col("id") % 5 === 0)
    val model = Ivf.fit(base, nlist = 8, iters = 3)
    val path = java.nio.file.Files.createTempDirectory("ivf-partial").toString
    Ivf.save(spark, model, base, path)
    Ivf.appendIndex(spark, batch, path, Some(0L))
    def rows() = spark.read.parquet(s"$path/cells").count()
    def batchRows() = spark.read.parquet(s"$path/cells")
      .where(col("batch_id") === 0L).count()
    def key() = Ivf.topKIndexed(Ivf.load(spark, path), q, k = 5, nprobe = 8)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val (refRows, refBatchRows, refKey) = (rows(), batchRows(), key())

    // crash point: the cells parquet JOB commit died half-way (the
    // FileOutputCommitter-v2 window where task files become visible
    // incrementally) — simulate by keeping only half of batch 0's
    // rows. The appendlog row IS present, so the old existence-keyed
    // probe would have SKIPPED the replay and permanently lost the
    // other half — the data-loss window this test pins shut.
    val keep = spark.read.parquet(s"$path/cells")
      .where(col("batch_id").isNull || pmod(col("id"), lit(2)) === 0)
      .localCheckpoint(true)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/cells"), true)
    keep.write.partitionBy("cell").parquet(s"$path/cells")
    val partial = batchRows()
    assert(partial > 0 && partial < refBatchRows,
      "fixture: the partial state should hold SOME but not all of batch 0")

    Ivf.appendIndex(spark, batch, path, Some(0L))
    assert(batchRows() == refBatchRows,
      "partial-commit replay did not restore the full batch")
    assert(rows() == refRows,
      "partial-commit replay duplicated the already-landed half")
    assert(key() == refKey)
    assert(spark.read.parquet(s"$path/appendlog").count() == 1L,
      "partial-commit replay re-appended the log row")
    // and the recovered index is again idempotent under replay
    Ivf.appendIndex(spark, batch, path, Some(0L))
    assert(rows() == refRows)
  }

  test("removeVectors of a stamped batch + that batch's replay: takedown survives (appendlog decrement)") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val base = e.where(col("id") % 5 =!= 0)
    val batch = e.where(col("id") % 5 === 0)
    val model = Ivf.fit(base, nlist = 8, iters = 3)
    val path = java.nio.file.Files.createTempDirectory("ivf-rm-replay").toString
    Ivf.save(spark, model, base, path)
    Ivf.appendIndex(spark, batch, path, Some(0L))
    // takedown hits PART of the stamped batch (and none of the base)
    val removed = e.where(col("id") % 10 === 0).select("id")
    val removedIds = removed.collect().map(_.getLong(0)).toSet
    assert(removedIds.nonEmpty)
    Ivf.removeVectors(spark, path, removed, removeId = Some(7L))
    def liveIds() = spark.read.parquet(s"$path/cells")
      .select("id").collect().map(_.getLong(0)).toSet
    val survivors = liveIds()
    assert(removedIds.forall(!survivors.contains(_)))

    // the data-resurrection hazard this pins shut: the batch's
    // count-keyed resume sums the appendlog — with the decrement row
    // the post-takedown count reads as FULLY LANDED and the replay
    // skips; without it (the r14 state) the replay would read the
    // takedown as a partial commit, strip the rest of batch 0 and
    // re-append the whole batch, resurrecting every removed vector.
    Ivf.appendIndex(spark, batch, path, Some(0L))
    assert(liveIds() == survivors,
      "a replayed batch resurrected taken-down vectors")

    // retrying the SAME stamped removal: decrement must not double
    // (and the replay must still read fully-landed afterwards)
    Ivf.removeVectors(spark, path, removed, removeId = Some(7L))
    val log = spark.read.option("mergeSchema", "true").parquet(s"$path/appendlog")
    assert(log.where(col("remove_id") === 7L).count() == 1L,
      "stamped removal retry appended a second decrement row")
    Ivf.appendIndex(spark, batch, path, Some(0L))
    assert(liveIds() == survivors)
  }

  test("torn staged swap (cells renamed to __old) is restored on resume, never re-created from one batch") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val base = e.where(col("id") % 5 =!= 0)
    val batch = e.where(col("id") % 5 === 0)
    val model = Ivf.fit(base, nlist = 8, iters = 3)
    val path = java.nio.file.Files.createTempDirectory("ivf-torn-swap").toString
    Ivf.save(spark, model, base, path)
    Ivf.appendIndex(spark, batch, path, Some(0L))
    def ids() = spark.read.parquet(s"$path/cells")
      .select("id").collect().map(_.getLong(0)).toSet
    val refIds = ids()

    // crash between rewriteDir's two renames (a strip/compaction in
    // flight): live cells renamed to __old, staged never swapped in.
    // Before the restore guard, the resume probe degraded this to
    // "nothing landed" and the replay re-created cells/ holding ONLY
    // batch 0 — silent loss of the whole prior index through the
    // recovery path itself.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    assert(fs.rename(p(s"$path/cells"), p(s"$path/cells__old")))
    fs.mkdirs(p(s"$path/cells__compacting"))
    Ivf.appendIndex(spark, batch, path, Some(0L))
    assert(ids() == refIds,
      "torn-swap resume lost the prior index (expected a restore from __old)")
    assert(!fs.exists(p(s"$path/cells__old")),
      "restore should have renamed __old back to live")

    // the restore must guard EVERY append shape, not just the replay
    // of an already-logged batch: a NEW batch id (no log row yet) and
    // an unstamped append each hit the probe's "nothing landed" arm,
    // which before the unconditional restore re-created cells/ from
    // scratch while __old held the whole index
    val extra = e.where(col("id") % 5 === 1)
    assert(fs.rename(p(s"$path/cells"), p(s"$path/cells__old")))
    Ivf.appendIndex(spark, extra, path, Some(99L)) // NEW batch id
    val withExtra = refIds ++ extra.select("id").collect().map(_.getLong(0)).toSet
    assert(ids() == withExtra,
      "new-batch append after a torn swap lost the prior index")
    assert(fs.rename(p(s"$path/cells"), p(s"$path/cells__old")))
    Ivf.appendIndex(spark, e.where(col("id") % 5 === 2), path) // unstamped
    assert(withExtra.subsetOf(ids()),
      "unstamped append after a torn swap lost the prior index")

    // the un-restorable torn state — live missing, no __old, staged
    // present — must fail LOUDLY, not degrade to an empty re-create
    assert(fs.rename(p(s"$path/cells"), p(s"$path/cells__compacting2")))
    fs.delete(p(s"$path/cells__compacting"), true)
    assert(fs.rename(p(s"$path/cells__compacting2"), p(s"$path/cells__compacting")))
    intercept[IllegalStateException] {
      Ivf.appendIndex(spark, batch, path, Some(0L))
    }
    // ...for every append shape
    intercept[IllegalStateException] {
      Ivf.appendIndex(spark, batch, path, Some(101L))
    }
    intercept[IllegalStateException] {
      Ivf.appendIndex(spark, batch, path)
    }
    // and removeVectors refuses the same state instead of stripping air
    intercept[Exception] {
      Ivf.removeVectors(spark, path, e.where(col("id") === 0L).select("id"))
    }
  }
}
