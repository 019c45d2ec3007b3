package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine on known vectors") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f), 0.0), // zero-vector guard
    ).toDF("a", "b", "expect")
    val got = df.select(
      Similarity.cosine(transform(col("a"), _.cast("double")),
        transform(col("b"), _.cast("double"))).as("c"), col("expect")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("bruteForceTopK: ranks by cosine desc, excludes self, respects k") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 0.01f, 0.0f)),
    ).toDF("id", "embedding")
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "embedding")
    val out = Similarity.bruteForceTopK(e, q, k = 2).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((3L, 1), (1L, 2))) // 3 is closer than 1; self excluded
  }

  test("lshTopK recall vs brute force on testdata embeddings") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.where(col("id") < 10).select(col("id").as("qid"), col("embedding"))
    val brute = Similarity.bruteForceTopK(e, q, k = 5)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(e, q, k = 5, nBits = 4, nTables = 8)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    // approximate by construction; 8 tables × 6 bits over 500 vecs
    assert(recall >= 0.5, s"recall $recall too low")
    assert(lsh.nonEmpty)
  }

  test("cosineNearDupsBucketed: subset of brute force with identical cosines, high recall") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val brute = toMap(Similarity.cosineNearDups(e, threshold = 0.4))
    val bucketed = toMap(Similarity.cosineNearDupsBucketed(e, threshold = 0.4))
    // exact verification ⇒ every returned pair is a true near-dup with
    // the same cosine as brute force (no false positives, ever)
    bucketed.foreach { case (pair, c) =>
      assert(brute.contains(pair), s"false positive $pair")
      assert(math.abs(brute(pair) - c) < 1e-12)
    }
    val recall = bucketed.size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall too low (${bucketed.size}/${brute.size})")
  }

  test("full-coverage lshTopK (nBits=0) equals brute force exactly") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.where(col("id") < 10).select(col("id").as("qid"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "id", "cosine", "rank").orderBy("qid", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val brute = rows(Similarity.bruteForceTopK(e, q, k = 5))
    val full = rows(Similarity.lshTopK(e, q, k = 5, nBits = 0, nTables = 2))
    assert(full == brute) // one bucket per table ⇒ provably exact
  }

  test("full-coverage cosineNearDupsBucketed (nBits=0) equals brute force exactly") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val brute = toMap(Similarity.cosineNearDups(e, threshold = 0.4))
    val full = toMap(Similarity.cosineNearDupsBucketed(e, threshold = 0.4,
      nBits = 0, nTables = 2))
    assert(full.keySet == brute.keySet)
    full.foreach { case (pair, c) => assert(math.abs(brute(pair) - c) < 1e-12) }
  }

  test("lsh bucket key is deterministic") {
    val e = Seq((0L, Array(0.5f, -0.25f, 1.0f))).toDF("id", "embedding")
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val k1 = e.select(Similarity.lshKey(col("v"), 8, 0, 3)).head().getLong(0)
    val k2 = e.select(Similarity.lshKey(col("v"), 8, 0, 3)).head().getLong(0)
    assert(k1 == k2)
  }
}
