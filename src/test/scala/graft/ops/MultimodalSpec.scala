package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.mediaFromText(spark,
    Seq((0L, "an image payload"), (1L, "an audio payload"), (2L, "a video payload"))
      .toDF("doc_id", "text"), "doc_id", "text")

  test("mediaFromText assigns kinds by id and utf-8 payloads") {
    val rows = media.collect().sortBy(_.media_id)
    assert(rows.map(_.kind).toSeq == Seq("image", "audio", "video"))
    assert(new String(rows(0).payload, "UTF-8") == "an image payload")
  }

  test("extractFeatures: deterministic stub decode through mapPartitions") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.width).toSeq == f2.map(_.width).toSeq)
    assert(f1.forall(f => f.width >= 1 && f.width <= 1920))
    assert(f1.forall(f => f.height >= 1 && f.height <= 1080))
    assert(f1.find(_.kind == "image").get.duration_ms == 0L)
    assert(f1.forall(_.feature.length == 8))
    assert(f1.forall(_.byte_len > 0))
  }

  test("extracted features compose into the ANN path (media → vectors → top-k)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Multimodal.mediaFromText(spark, docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(m).toDF()
      .select(col("media_id").as("id"), col("feature").as("embedding"))
    val q = feats.where(col("id") < 3).select(col("id").as("qid"), col("embedding"))
    val nn = Similarity.bruteForceTopK(feats, q, k = 3).collect()
    assert(nn.length == 9) // 3 queries × top-3
    assert(nn.forall(r => r.getAs[Double]("cosine") >= -1.0 && r.getAs[Double]("cosine") <= 1.0 + 1e-12))
  }

  test("sampleFrames: stride offsets for videos only") {
    val feats = Multimodal.extractFeatures(media).toDF()
    val frames = Multimodal.sampleFrames(feats, stride = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(frames.forall(_._1 == 2L)) // only the video row
    // "a video payload" = 15 bytes → offsets 0,5,10 (≤ byte_len-1 = 14)
    assert(frames.map(_._2).sorted.toSeq == Seq(0L, 5L, 10L))
  }
}
