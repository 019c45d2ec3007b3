package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def normalized(df: org.apache.spark.sql.DataFrame) = {
    val v = transform(col("embedding"), _.cast("double"))
    val n = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    df.select(col("vec_id").as("id"),
      transform(v, x => x / n).as("embedding"))
  }

  test("encode compresses to m small codes; codebooks have the declared shape") {
    val e = normalized(spark.read.parquet(s"$dir/embeddings.parquet"))
    val model = Pq.fit(e, m = 8, k = 16, iters = 3)
    assert(model.codebooks.length == 8)
    assert(model.codebooks.forall(_.length == 16))
    assert(model.codebooks.forall(_.forall(_.length == model.dsub)))
    val codes = Pq.encode(e, model)
    val row = codes.head()
    assert(row.getSeq[Int](1).length == 8)
    assert(codes.count() == e.count())
    // codes are small ints — one byte each at k<=256
    assert(codes.select(explode(col("codes"))).agg(max("col")).head().getInt(0) < 16)
  }

  test("ADC top-k recall vs exact cosine; rerank recovers most of the gap") {
    val e = normalized(spark.read.parquet(s"$dir/embeddings.parquet"))
    val q = e.where(col("id") < 10).select(col("id").as("qid"), col("embedding"))
    val brute = Similarity.bruteForceTopK(e, q, k = 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val model = Pq.fit(e, m = 8, k = 64, iters = 4)
    val approx = Pq.topK(Pq.encode(e, model), q, model, k = 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect approx).size.toDouble / brute.size
    assert(recall >= 0.4, s"ADC-only recall $recall too low")
    val reranked = Pq.topKReranked(e, q, model, k = 10, shortlist = 4)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rr = (brute intersect reranked).size.toDouble / brute.size
    assert(rr >= recall, s"rerank made recall worse: $recall -> $rr")
    assert(rr >= 0.6, s"reranked recall $rr too low")
  }

  test("determinism: same corpus, same model, same codes") {
    val e = normalized(spark.read.parquet(s"$dir/embeddings.parquet"))
    val m1 = Pq.fit(e, m = 4, k = 8, iters = 2)
    val m2 = Pq.fit(e, m = 4, k = 8, iters = 2)
    assert(m1.codebooks.flatten.flatten.toSeq == m2.codebooks.flatten.flatten.toSeq)
    val c1 = Pq.encode(e, m1).orderBy("id").collect().map(_.getSeq[Int](1)).toSeq
    val c2 = Pq.encode(e, m2).orderBy("id").collect().map(_.getSeq[Int](1)).toSeq
    assert(c1 == c2)
  }
}
