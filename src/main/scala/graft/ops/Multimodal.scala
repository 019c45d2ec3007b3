package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads + typed metadata, with
  * decode / feature-extraction / resize / frame-sample stages shaped
  * for distributed execution (`mapPartitions` over typed rows — the
  * Scala analog of `mapInPandas` batch UDFs).
  *
  * The actual codec step is STUBBED (this container ships no image or
  * audio libraries): [[FakeDecoder]] derives deterministic properties
  * from the payload bytes. Everything around it — schema, batch
  * iteration, partitioning, output shape — is real and tested; a
  * production deployment swaps `FakeDecoder` for a JNI/javacv codec
  * with no plan changes.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      width: Int,
      height: Int,
      duration_ms: Long,
      feature: Array[Double])

  /** STUB decoder: deterministic pseudo-decode of a payload. A real
    * implementation parses the container format; this derives stable
    * fake dimensions/duration from byte content so pipelines and tests
    * have reproducible values. */
  object FakeDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val len = r.payload.length
      val h = java.util.Arrays.hashCode(r.payload).toLong & 0x7fffffffL
      val feature = Array.tabulate(8) { i =>
        if (len == 0) 0.0
        else r.payload(((h + i * 31) % len).toInt) & 0xff match { case b => b / 255.0 }
      }
      MediaFeatures(
        media_id = r.media_id,
        kind = r.kind,
        byte_len = len,
        width = (h % 1920).toInt + 1,
        height = ((h >> 8) % 1080).toInt + 1,
        duration_ms = if (r.kind == "image") 0L else (h % 600000L),
        feature = feature)
    }
  }

  /** Batch decode: one decoder instance per partition (the expensive
    * init a real codec needs), rows streamed through it — the exact
    * shape a `mapInPandas`/Arrow-batch pipeline has. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map(FakeDecoder.decode)
    }
  }

  /** Deterministic frame sampling for video-like payloads: every
    * `stride`-th byte offset becomes a "frame" anchor — the real
    * implementation samples decoded frames at timestamps; the
    * partitioning/explode shape is identical. */
  def sampleFrames(features: DataFrame, stride: Int = 1000): DataFrame =
    features
      .where(col("kind") === "video")
      .withColumn("frame_offset",
        explode(sequence(lit(0L), greatest(col("byte_len").cast("long") - 1, lit(0L)), lit(stride.toLong))))
      .select(col("media_id"), col("frame_offset"))

  /** Wrap a text-keyed table into a media table (test/bench helper:
    * payloads are the utf-8 bytes — stands in for real blobs). */
  def mediaFromText(spark: SparkSession, df: DataFrame,
      idCol: String, textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio").otherwise(lit("video")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload")).as[MediaRow]
  }
}
