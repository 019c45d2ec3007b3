package graft

import org.apache.spark.sql.functions._

/** [[ScaleTestdata]]'s replication invariants — the properties that
  * make a scaled bench measure algorithms instead of artifacts. */
class ScaleTestdataSpec extends SparkSpec {
  import spark.implicits._

  test("key shift: copies are disjoint universes, FK joins stay exactly valid") {
    val orders = Seq((1L, 10L), (2L, 11L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((10L, "a"), (11L, "b")).toDF("c_custkey", "c_name")
    val so = ScaleTestdata.scaleTable(orders, "orders", 3)
    val sc = ScaleTestdata.scaleTable(cust, "customer", 3)
    assert(so.count() == 6 && sc.count() == 6)
    assert(so.select("o_orderkey").distinct().count() == 6, "keys must not collide")
    // every scaled order still finds exactly one customer
    val joined = so.join(sc, so("o_custkey") === sc("c_custkey"))
    assert(joined.count() == 6)
    // and never across copies: key and its FK shifted together
    assert(joined.where((so("o_orderkey") < 100000000L) =!=
      (sc("c_custkey") < 100000000L)).isEmpty)
  }

  test("documents decor: cross-copy shingle jaccard falls below dedup thresholds; copy 0 verbatim") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val scaled = ScaleTestdata.scaleTable(docs, "documents", 2)
    val sh = scaled.select(col("doc_id"),
      graft.ops.Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(sh(1L) == docs.select(graft.ops.Dedup.shingles(col("text"), 3))
      .head().getSeq[String](0).toSet, "copy 0 must be byte-identical")
    val inter = sh(1L).intersect(sh(100000001L)).size.toDouble
    val union = sh(1L).union(sh(100000001L)).size.toDouble
    assert(inter / union < 0.5,
      s"cross-copy jaccard ${inter / union} must sit under near-dup thresholds")
  }

  test("embeddings sign flip: within-copy cosine preserved, cross-copy decorrelated") {
    val e = Seq(
      (1L, Array(1.0f, 0.5f, -0.25f, 0.75f, 0.1f, -0.6f, 0.33f, 0.9f)),
      (2L, Array(0.9f, 0.55f, -0.2f, 0.7f, 0.15f, -0.5f, 0.3f, 0.85f)))
      .toDF("vec_id", "embedding")
    val scaled = ScaleTestdata.scaleTable(e, "embeddings", 2)
    def cos(a: Long, b: Long): Double = {
      val m = scaled.collect().map(r =>
        r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
      val (x, y) = (m(a), m(b))
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    // the same per-dim signs multiply BOTH vectors of a within-copy
    // pair, so their cosine is bit-preserved up to float rounding
    assert(math.abs(cos(1L, 2L) - cos(100000001L, 100000002L)) < 1e-6,
      "within-copy geometry must be preserved")
    // a vector against its own flipped copy decorrelates (not ±1)
    assert(math.abs(cos(1L, 100000001L)) < 0.9,
      "cross-copy cosine must decorrelate")
  }
}
