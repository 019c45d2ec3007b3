package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  // corpus with planted near-dups: base docs + light mutations
  private def doc(i: Long, extra: String = "") =
    (i, s"alpha bravo charlie delta echo foxtrot golf hotel india $i $extra")

  test("chunk index: increment profile ≡ one-shot profile over the union") {
    val dir = java.nio.file.Files.createTempDirectory("chdix").toString
    // ≥30-char docs sharing exact 30-char chunks across corpus/batch,
    // plus a short doc (no chunks) and a batch-internal-only dup pair
    val boiler = "x" * 30 // one exact chunk everywhere it appears
    val corpus = (1L to 20L).map(i => (i, boiler + s" unique corpus text $i " + ("y" * 31)))
      .toDF("doc_id", "text")
    val batch = Seq(
      (101L, boiler + " fresh batch content one " + ("z" * 35)),
      (102L, ("q" * 33) + " batch only pair"),
      (103L, ("q" * 33) + " batch only pair"), // dup chunk with 102 only
      (104L, "short")).toDF("doc_id", "text")
    Dedup.buildChunkIndex(corpus, dir)
    val got = Dedup.substringDupProfileIncrement(batch, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Dedup.substringDupProfile(corpus.unionByName(batch))
      .where(col("doc_id") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // the short doc has no chunks → absent, like the one-shot profile
    assert(!got.exists(_._1 == 104L))
    // the batch-internal pair counts without any index hit
    assert(got.exists(t => t._1 == 102L && t._3 > 0))
  }

  test("chunk index: width mismatch on probe or Append fails fast") {
    val dir = java.nio.file.Files.createTempDirectory("chdixw").toString
    val docs = Seq((1L, "a" * 40), (2L, "a" * 40)).toDF("doc_id", "text")
    Dedup.buildChunkIndex(docs, dir, width = 30)
    val e1 = intercept[IllegalArgumentException] {
      Dedup.substringDupProfileIncrement(docs, dir, width = 40)
    }
    assert(e1.getMessage.contains("width=30"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.buildChunkIndex(docs, dir, width = 40, mode = SaveMode.Append)
    }
    assert(e2.getMessage.contains("append"))
  }

  test("chunk index: SaveMode.Append fold-in ≡ one-shot index") {
    val oneDir = java.nio.file.Files.createTempDirectory("chdix1").toString
    val twoDir = java.nio.file.Files.createTempDirectory("chdix2").toString
    val mk = (lo: Long, hi: Long) => (lo to hi)
      .map(i => (i, s"${"c" * 31} shared boiler ${"d" * 30} tail $i")).toDF("doc_id", "text")
    val a = mk(1L, 12L); val b = mk(13L, 20L); val probe = mk(21L, 25L)
    Dedup.buildChunkIndex(a.unionByName(b), oneDir)
    Dedup.buildChunkIndex(a, twoDir)
    Dedup.buildChunkIndex(b, twoDir, mode = SaveMode.Append)
    val one = Dedup.substringDupProfileIncrement(probe, oneDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val two = Dedup.substringDupProfileIncrement(probe, twoDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one == two)
    assert(one.nonEmpty && one.forall(_._3 > 0)) // boiler chunks are dups
  }

  test("incremental ≡ batch over the union, restricted to increment pairs") {
    val dir = java.nio.file.Files.createTempDirectory("nddix").toString
    val corpus = ((1L to 40L).map(doc(_)) ++
      Seq((101L, doc(7)._2), (102L, doc(9)._2 + " juliet"))).toDF("id", "text")
    // increment: one dup of an indexed doc, one dup-pair inside the batch,
    // and unique docs
    val incr = Seq(
      (201L, doc(7)._2),                       // matches 7 and 101
      (202L, "unique kilo lima mike november oscar papa quebec 202"),
      (203L, doc(15)._2 + " extra"),           // near 15
      (204L, doc(15)._2 + " extra"),           // = 203, near 15
      (205L, "three tok doc")).toDF("id", "text")

    Dedup.buildBandIndex(corpus, dir, n = 3, k = 48, bands = 16)
    val got = Dedup.incrementalNearDups(incr, dir, threshold = 0.8, n = 3, k = 48, bands = 16)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val incrIds = Set(201L, 202L, 203L, 204L, 205L)
    val batch = Dedup.minhashNearDups(corpus.unionByName(incr), threshold = 0.8,
        n = 3, k = 48, bands = 16)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => incrIds.contains(p._1) || incrIds.contains(p._2))
      // incremental emits (new, old); batch emits (min, max) — normalize:
      // new-id-first for cross pairs, (min, max) for in-batch pairs
      .map { case (a, b) =>
        if (incrIds.contains(a) && incrIds.contains(b)) (math.min(a, b), math.max(a, b))
        else if (incrIds.contains(a)) (a, b) else (b, a)
      }.toSet
    assert(got == batch, s"got=$got batch=$batch")
    // sanity on the planted structure
    assert(got.contains((201L, 7L)) && got.contains((201L, 101L)))
    assert(got.contains((203L, 204L)))
    assert(!got.exists(p => p._1 == 202L || p._2 == 202L))
  }

  test("appending the increment folds it into the index for the NEXT batch") {
    val dir = java.nio.file.Files.createTempDirectory("nddix2").toString
    val corpus = (1L to 20L).map(doc(_)).toDF("id", "text")
    Dedup.buildBandIndex(corpus, dir, n = 3, k = 48, bands = 16)
    val b1 = Seq((301L, doc(3)._2 + " x")).toDF("id", "text")
    Dedup.buildBandIndex(b1, dir, n = 3, k = 48, bands = 16, mode = SaveMode.Append)
    // a second batch duplicating 301 must now match it through the index
    val b2 = Seq((401L, doc(3)._2 + " x")).toDF("id", "text")
    val got = Dedup.incrementalNearDups(b2, dir, threshold = 0.8, n = 3, k = 48, bands = 16)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((401L, 301L)) && got.contains((401L, 3L)))
  }

  test("removeFromChunkIndex: negated counts ≡ index over the survivors; width guard holds") {
    val rmDir = java.nio.file.Files.createTempDirectory("chdrm").toString
    val survDir = java.nio.file.Files.createTempDirectory("chdsurv").toString
    val boiler = "x" * 30
    // chunks cut at fixed 30-char boundaries, so every block is
    // exactly 30 wide: chunk 1 (boiler) shared by ALL docs, chunk 2
    // shared by docs 1..6 only, chunk 3 unique per doc
    val corpus = (1L to 20L).map { i =>
      val second = if (i <= 6) "Y" * 30 else f"tail$i%026d"
      (i, boiler + second + f"pad$i%027d")
    }.toDF("doc_id", "text")
    val removed = corpus.where(col("doc_id") >= 5L)
    val survivors = corpus.where(col("doc_id") < 5L)
    Dedup.buildChunkIndex(corpus, rmDir)
    Dedup.removeFromChunkIndex(removed, rmDir)
    Dedup.buildChunkIndex(survivors, survDir)
    // summed counts equal the survivors' recount (zero rows excluded)
    def counts(p: String) = spark.read.parquet(s"$p/chunks")
      .groupBy("__h").agg(sum("n_docs").as("n")).where(col("n") =!= 0L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(counts(rmDir) == counts(survDir))
    // probe equivalence: a batch re-using the shared chunks profiles
    // identically against the decremented and the survivor index
    val batch = Seq(
      (101L, boiler + ("Y" * 30)),
      (102L, ("q" * 33) + " no corpus chunk")).toDF("doc_id", "text")
    def probe(p: String) = Dedup.substringDupProfileIncrement(batch, p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probe(rmDir) == probe(survDir))
    // width guard: removing at the wrong width must fail fast
    val e = intercept[IllegalArgumentException] {
      Dedup.removeFromChunkIndex(removed, rmDir, width = 40)
    }
    assert(e.getMessage.contains("remove from"))
  }

  test("removeFromBandIndex: takedown ≡ index built over the survivors; removed ids stop matching") {
    val rmDir = java.nio.file.Files.createTempDirectory("nddrm").toString
    val survDir = java.nio.file.Files.createTempDirectory("nddsurv").toString
    val corpus = ((1L to 40L).map(doc(_)) ++
      Seq((101L, doc(7)._2), (102L, doc(9)._2 + " juliet"))).toDF("id", "text")
    val removedIds = Seq(7L, 102L, 9999L) // 9999 unknown → no-op
    val survivors = corpus.where(!col("id").isin(removedIds: _*))
    Dedup.buildBandIndex(corpus, rmDir, n = 3, k = 48, bands = 16)
    Dedup.removeFromBandIndex(spark, rmDir, removedIds.toDF("id"))
    Dedup.buildBandIndex(survivors, survDir, n = 3, k = 48, bands = 16)

    // row-identical index state (buckets and shingles both)
    def buckets(p: String) = spark.read.parquet(s"$p/buckets")
      .select("band", "bkey", "id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    def shingleIds(p: String) = spark.read.parquet(s"$p/shingles")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(buckets(rmDir) == buckets(survDir))
    assert(shingleIds(rmDir) == shingleIds(survDir))

    // probe equivalence: an increment duplicating a REMOVED doc matches
    // only the surviving copies (doc 7 removed, its dup 101 survives)
    val incr = Seq((201L, doc(7)._2)).toDF("id", "text")
    def probe(p: String) = Dedup.incrementalNearDups(incr, p,
        threshold = 0.8, n = 3, k = 48, bands = 16)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = probe(rmDir)
    assert(got == probe(survDir))
    assert(got.contains((201L, 101L)) && !got.exists(_._2 == 7L),
      "removed doc must stop matching; its surviving near-dup must still match")
    // idempotent re-run
    Dedup.removeFromBandIndex(spark, rmDir, removedIds.toDF("id"))
    assert(buckets(rmDir) == buckets(survDir))
  }

  test("gate parity: 60% build + 20% Append probes identically to the one-shot 80% index") {
    // the q_incremental_append contract on real testdata — both gate
    // queries share one DuckDB oracle, so they must agree bit-for-bit
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val oneShot = rows(graft.queries.PipelineQueries.qIncrementalDedup(spark, dir))
    val appended = rows(graft.queries.PipelineQueries.qIncrementalAppend(spark, dir))
    assert(appended == oneShot)
    assert(appended.nonEmpty) // the sf0.001 corpus has increment-touching pairs
  }
}
