package graft.ops

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains, separate clusters, and singleton-pair components") {
    // chain 1-2-3, pair 10-11, pair 20-21 (21 also linked to 22)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id1", "id2")
    val out = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("keepCanonical retains one doc per cluster plus unpaired docs") {
    val docs = Seq((1L, "a"), (2L, "a'"), (3L, "a''"), (10L, "b"), (11L, "b'"), (99L, "solo"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val kept = Dedup.keepCanonical(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 10L, 99L))
  }

  test("long chain converges within iteration bound") {
    val pairs = (0L until 15L).map(i => (i, i + 1)).toDF("id1", "id2")
    val out = Dedup.connectedComponents(pairs, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSet == Set(0L))
    assert(out.keySet == (0L to 15L).toSet)
  }
}
