package graft.queries

import graft.SparkSpec
import graft.ops.{Bm25, Similarity}
import org.apache.spark.sql.functions._

/** q_hybrid_rrf's semantic arm is brute-force cosine — the declared
  * verification baseline. The production arm at 100 TB is LSH-bucketed
  * ANN ([[Similarity.lshTopK]]); this spec pins that swapping it in
  * changes NOTHING on a recall-complete fixture: with `nBits = 0`
  * every vector lands in each table's single bucket, so the candidate
  * set is the full corpus and the LSH machinery must reproduce the
  * brute-force ranking exactly — same window, same (cosine desc, id)
  * tie-break. Fusion semantics are shared code
  * ([[SearchQueries.fuseArms]]), so equal arms ⇒ equal fused output
  * bit-for-bit (only integer ranks cross the fusion boundary). */
class HybridRetrievalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("hybrid RRF with the production LSH ANN arm ≡ the brute-force baseline arm") {
    val docs = graft.Tables.documents(spark, sfDir)
    val stats = Bm25.buildStats(docs)
    // checkpoint the (≤50-row) lexical arm so the two fusions below
    // share one frame instead of rebuilding the index twice
    val lex = SearchQueries.lexicalArm(stats).localCheckpoint(true)
    stats.postings.unpersist(blocking = false)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = emb.where(col("id") === 0)
      .select(col("id").as("qid"), col("embedding"))
    val semBrute = Similarity.bruteForceTopK(emb, q, k = 50).select("id", "rank")
    val semLsh = Similarity.lshTopK(emb, q, k = 50, nBits = 0).select("id", "rank")

    // the arms agree rank-for-rank before fusing (recall-complete LSH)
    val bruteRanks = semBrute.orderBy("rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val lshRanks = semLsh.orderBy("rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(lshRanks == bruteRanks,
      "recall-complete lshTopK diverged from bruteForceTopK ranking")

    def fused(sem: org.apache.spark.sql.DataFrame): Seq[(Long, Any, Any, Double)] =
      SearchQueries.fuseArms(lex, sem).collect().toSeq
        .map(r => (r.getLong(0), r.get(1), r.get(2), r.getDouble(3)))

    val viaBrute = fused(semBrute)
    val viaLsh = fused(semLsh)
    assert(viaLsh == viaBrute, "fused hybrid output changed under the production ANN arm")
    assert(viaBrute.size == 20 && viaBrute.map(_._1).distinct.size == 20)
  }
}
