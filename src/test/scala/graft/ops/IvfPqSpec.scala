package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding"))

  test("full probe + corpus-covering shortlist is exact (equals brute force)") {
    val e = corpus
    val q = e.where(col("id") < 8).select(col("id").as("qid"), col("embedding"))
    val brute = Similarity.bruteForceTopK(e, q, k = 5)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val model = IvfPq.fit(e, nlist = 8, m = 8, k = 16, iters = 3)
    val exact = IvfPq.topK(IvfPq.index(e, model), e, q, model,
      k = 5, nprobe = 8, shortlist = 200)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == brute)
  }

  test("chunked query batch equals the single-chunk result exactly") {
    val e = corpus
    val q = e.where(col("id") < 20).select(col("id").as("qid"), col("embedding"))
    val model = IvfPq.fit(e, nlist = 8, m = 8, k = 16, iters = 3)
    val idx = IvfPq.index(e, model)
    def key(df: org.apache.spark.sql.DataFrame) = df.select("qid", "id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val oneChunk = key(IvfPq.topK(idx, e, q, model, k = 5, nprobe = 8, shortlist = 200))
    // 20 queries forced through 7-query chunks: 3 materialized chunks
    val chunked = key(IvfPq.topK(idx, e, q, model, k = 5, nprobe = 8, shortlist = 200,
      queryChunk = 7))
    assert(chunked == oneChunk)
  }

  test("distributed (executor-built LUTs) equals driver-LUT topK, both encodings") {
    val e = corpus
    val q = e.where(col("id") < 15).select(col("id").as("qid"), col("embedding"))
    def key(df: org.apache.spark.sql.DataFrame) = df.select("qid", "id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    for (res <- Seq(false, true)) {
      val model = IvfPq.fit(e, nlist = 8, m = 8, k = 16, iters = 3, residual = res)
      val idx = IvfPq.index(e, model)
      val driver = key(IvfPq.topK(idx, e, q, model, k = 5, nprobe = 3, shortlist = 4))
      val dist = key(IvfPq.topKDistributed(idx, e, q, model, k = 5, nprobe = 3, shortlist = 4))
      assert(dist == driver, s"residual=$res")
    }
  }

  test("topKAuto routes by batch size and answers identically on both routes") {
    val e = corpus
    val q = e.where(col("id") < 15).select(col("id").as("qid"), col("embedding"))
    def key(df: org.apache.spark.sql.DataFrame) = df.select("qid", "id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val model = IvfPq.fit(e, nlist = 8, m = 8, k = 16, iters = 3)
    val idx = IvfPq.index(e, model)
    val viaChunked = key(IvfPq.topKAuto(idx, e, q, model, k = 5, nprobe = 3,
      shortlist = 4, routeThreshold = 1000)) // 15 ≤ 1000 → driver-LUT route
    val viaDistributed = key(IvfPq.topKAuto(idx, e, q, model, k = 5, nprobe = 3,
      shortlist = 4, routeThreshold = 1)) // 15 > 1 → distributed route
    val reference = key(IvfPq.topK(idx, e, q, model, k = 5, nprobe = 3, shortlist = 4))
    assert(viaChunked == reference)
    assert(viaDistributed == reference)
  }

  test("reduced probe keeps useful recall at a fraction of the rows touched") {
    val e = corpus
    val q = e.where(col("id") < 8).select(col("id").as("qid"), col("embedding"))
    val brute = Similarity.bruteForceTopK(e, q, k = 5)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val model = IvfPq.fit(e, nlist = 8, m = 8, k = 16, iters = 3)
    val approx = IvfPq.topK(IvfPq.index(e, model), e, q, model,
      k = 5, nprobe = 3, shortlist = 8)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect approx).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall")
  }

  test("residual encoding: exact at full probe; recall at least matches raw codes") {
    val e = corpus
    val q = e.where(col("id") < 8).select(col("id").as("qid"), col("embedding"))
    val brute = Similarity.bruteForceTopK(e, q, k = 5)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val res = IvfPq.fit(e, nlist = 8, m = 8, k = 16, iters = 3, residual = true)
    assert(res.residual)
    // full probe + covering shortlist: exact regardless of encoding
    val exact = IvfPq.topK(IvfPq.index(e, res), e, q, res,
      k = 5, nprobe = 8, shortlist = 200)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == brute)
    // reduced probe, small shortlist: residual codes quantize finer
    def recallOf(m: IvfPq.Model): Double = {
      val approx = IvfPq.topK(IvfPq.index(e, m), e, q, m, k = 5, nprobe = 3, shortlist = 4)
        .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute intersect approx).size.toDouble / brute.size
    }
    val raw = IvfPq.fit(e, nlist = 8, m = 8, k = 16, iters = 3)
    val (rRaw, rRes) = (recallOf(raw), recallOf(res))
    assert(rRes >= rRaw - 0.1, s"residual recall $rRes much worse than raw $rRaw")
    assert(rRes >= 0.3, s"residual recall $rRes")
  }

  test("save/load round trip answers identically and partitions by cell") {
    val e = corpus
    val q = e.where(col("id") < 5).select(col("id").as("qid"), col("embedding"))
    val model = IvfPq.fit(e, nlist = 8, m = 4, k = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("ivfpq").toString
    IvfPq.save(spark, model, e, path)
    val loaded = IvfPq.load(spark, path)
    assert(new java.io.File(s"$path/cells").listFiles()
      .exists(_.getName.startsWith("cell=")))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = key(IvfPq.topK(IvfPq.index(e, model), e, q, model, k = 5, nprobe = 3))
    val viaDisk = key(IvfPq.topK(loaded.cells, e, q, loaded.model, k = 5, nprobe = 3))
    assert(direct == viaDisk)
  }

  test("stamped appendIndex: replay skips, torn state resumes, partial commit strips and rewrites") {
    val e = corpus
    val q = e.where(col("id") < 5).select(col("id").as("qid"), col("embedding"))
    val base = e.where(col("id") % 5 =!= 0)
    val batch = e.where(col("id") % 5 === 0)
    val model = IvfPq.fit(base, nlist = 8, m = 4, k = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("ivfpq-crash").toString
    IvfPq.save(spark, model, base, path)
    IvfPq.appendIndex(spark, batch, path, Some(0L))
    def rows() = spark.read.option("mergeSchema", "true").parquet(s"$path/cells").count()
    def batchRows() = spark.read.option("mergeSchema", "true").parquet(s"$path/cells")
      .where(col("batch_id") === 0L).count()
    def key() = {
      val idx = IvfPq.load(spark, path)
      IvfPq.topK(idx.cells, e, q, idx.model, k = 5, nprobe = 3)
        .select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    val (refRows, refBatchRows, refKey) = (rows(), batchRows(), key())

    // full replay (crash after both writes, before the checkpoint
    // commit): must SKIP — an unstamped replay would duplicate codes
    IvfPq.appendIndex(spark, batch, path, Some(0L))
    assert(rows() == refRows, "full replay duplicated code rows")
    assert(key() == refKey)

    // partial job commit: keep only half of batch 0's rows; the
    // appendlog row IS present, so an existence-keyed probe would skip
    // and permanently lose the other half
    val keep = spark.read.option("mergeSchema", "true").parquet(s"$path/cells")
      .where(col("batch_id").isNull || pmod(col("id"), lit(2)) === 0)
      .localCheckpoint(true)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/cells"), true)
    keep.write.partitionBy("cell").parquet(s"$path/cells")
    val partial = batchRows()
    assert(partial > 0 && partial < refBatchRows,
      "fixture: the partial state should hold SOME but not all of batch 0")
    IvfPq.appendIndex(spark, batch, path, Some(0L))
    assert(batchRows() == refBatchRows, "partial-commit replay did not restore the batch")
    assert(rows() == refRows, "partial-commit replay duplicated the landed half")
    assert(key() == refKey)
    assert(spark.read.parquet(s"$path/appendlog").count() == 1L,
      "replay re-appended the log row")

    // compaction preserves stamps and log: replay after is still landed
    IvfPq.compactIndexed(spark, path)
    IvfPq.appendIndex(spark, batch, path, Some(0L))
    assert(rows() == refRows, "post-compaction replay duplicated the batch")
    assert(key() == refKey)
  }

  test("removeVectors: takedown ≡ one-shot save of the survivors under the same frozen model") {
    val e = corpus
    val q = e.where(col("id") < 5).select(col("id").as("qid"), col("embedding"))
    val surv = e.where(col("id") % 7 =!= 0)
    val model = IvfPq.fit(e, nlist = 8, m = 4, k = 8, iters = 2)
    val rmPath = java.nio.file.Files.createTempDirectory("ivfpq-rm").toString
    val survPath = java.nio.file.Files.createTempDirectory("ivfpq-surv").toString
    IvfPq.save(spark, model, e, rmPath)
    IvfPq.removeVectors(spark, rmPath, e.where(col("id") % 7 === 0).select("id"))
    IvfPq.save(spark, model, surv, survPath)
    def codeSet(p: String) = spark.read.parquet(s"$p/cells")
      .select(col("id"), col("cell"), col("codes").cast("string"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(codeSet(rmPath) == codeSet(survPath),
      "stripped code rows must equal the survivors' one-shot layout")
    def key(p: String) = {
      val idx = IvfPq.load(spark, p)
      IvfPq.topK(idx.cells, surv, q, idx.model, k = 5, nprobe = 3)
        .select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    assert(key(rmPath) == key(survPath))
    // idempotent re-run
    IvfPq.removeVectors(spark, rmPath, e.where(col("id") % 7 === 0).select("id"))
    assert(codeSet(rmPath) == codeSet(survPath))
  }

  test("appendIndex: frozen-quantizer fold-in ≡ one-shot index; compaction results-identical") {
    val e = corpus
    val q = e.where(col("id") < 5).select(col("id").as("qid"), col("embedding"))
    val base = e.where(col("id") % 5 =!= 0)
    val batch = e.where(col("id") % 5 === 0)
    val model = IvfPq.fit(base, nlist = 8, m = 4, k = 8, iters = 2)
    val incPath = java.nio.file.Files.createTempDirectory("ivfpq-inc").toString
    val onePath = java.nio.file.Files.createTempDirectory("ivfpq-one").toString
    IvfPq.save(spark, model, base, incPath)
    IvfPq.appendIndex(spark, batch, incPath)
    IvfPq.save(spark, model, e, onePath)

    // codes equality: frozen coarse + PQ quantizers give the batch the
    // same (cell, codes) a one-shot index would
    def codeSet(p: String) = spark.read.parquet(s"$p/cells")
      .select(col("id"), col("cell"), col("codes").cast("string"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(codeSet(incPath) == codeSet(onePath),
      "append under frozen quantizers must reproduce the one-shot code layout")

    def key(p: String) = {
      val idx = IvfPq.load(spark, p)
      IvfPq.topK(idx.cells, e, q, idx.model, k = 5, nprobe = 3)
        .select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    val oneShot = key(onePath)
    assert(key(incPath) == oneShot)

    IvfPq.compactIndexed(spark, incPath)
    new java.io.File(s"$incPath/cells").listFiles()
      .filter(_.getName.startsWith("cell=")).foreach { d =>
        assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
          s"${d.getName} not compacted to one file")
      }
    assert(key(incPath) == oneShot)
    assert(codeSet(incPath) == codeSet(onePath))
  }
}
