package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY.md §2.3): media payloads travel as
  * opaque `binary` columns beside a typed metadata struct; decode /
  * feature-extraction / frame-sampling run as partition-local typed
  * transforms (`mapPartitions`), the JVM analogue of `mapInPandas` — batch
  * iteration per partition, stable output schema, no driver involvement.
  *
  * The actual byte decoding is STUBBED (no image/audio codecs in this
  * environment): [[MediaCodec.decodeStub]] derives a deterministic fake
  * feature vector from the raw bytes. The Spark-side plumbing — schema,
  * partitioning, batch shape, typed encoders — is real and tested; swapping
  * in a real codec changes only the function body.
  */
object Multimodal {

  case class MediaMeta(
      modality: String,
      mime: String,
      width: Int,
      height: Int,
      sampleRate: Int,
      nFrames: Int)

  case class MediaRecord(id: Long, content: Array[Byte], meta: MediaMeta)

  case class MediaFeature(id: Long, modality: String, dim: Int, features: Array[Double])

  /** Wraps a text column as a fake media payload with typed metadata —
    * stands in for `spark.read.format("binaryFile")` / blob-store ingestion. */
  def attachBinary(df: DataFrame, idCol: String, payloadCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      col(payloadCol).cast("binary").as("content"),
      struct(
        lit(modality).as("modality"),
        lit(s"application/x-$modality").as("mime"),
        (octet_length(col(payloadCol).cast("binary")) % 640 + 1).cast("int").as("width"),
        lit(480).as("height"),
        lit(16000).as("sampleRate"),
        (octet_length(col(payloadCol).cast("binary")) % 30 + 1).cast("int").as("nFrames")
      ).as("meta"))

  object MediaCodec {
    val FeatureDim = 16

    /** STUB decoder: a real implementation would decode the image/audio
      * payload here (e.g. via a JNI codec). The deterministic stand-in is a
      * normalized 16-bin byte histogram — stable across runs and partitions
      * so the downstream pipeline is testable end-to-end. */
    def decodeStub(content: Array[Byte]): Array[Double] = {
      val bins = new Array[Double](FeatureDim)
      var i = 0
      while (i < content.length) {
        bins((content(i) & 0xff) % FeatureDim) += 1.0
        i += 1
      }
      val n = math.max(content.length, 1).toDouble
      bins.map(b => b / n)
    }
  }

  /** Partition-local feature extraction: one decoder instantiation per
    * partition (the expensive-init pattern real codecs need), streaming
    * batches through without materializing the partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // real codecs would init native resources here, once per partition
      records.map { r =>
        val feats = MediaCodec.decodeStub(r.content)
        MediaFeature(r.id, r.meta.modality, feats.length, feats)
      }
    }
  }

  /** Deterministic frame sampling: slices the payload into `meta.nFrames`
    * chunks and keeps every `stride`-th — the plumbing shape of video
    * frame-extraction (explode to one row per sampled frame). */
  def sampleFrames(df: DataFrame, stride: Int = 2): DataFrame = {
    val nFrames = col("meta.nFrames")
    val frameLen = greatest(floor(octet_length(col("content")) / nFrames).cast("int"), lit(1))
    df.select(
      col("id"),
      posexplode(
        filter(
          transform(sequence(lit(0), nFrames - 1),
            i => struct(i.as("idx"), col("content").substr(lit(1) + i * frameLen, frameLen).as("bytes"))),
          f => f.getField("idx") % stride === 0)))
      .select(
        col("id"),
        col("col.idx").as("frame_idx"),
        col("col.bytes").as("frame_bytes"),
        octet_length(col("col.bytes")).cast("long").as("frame_len"))
  }

  /** Typed view over an attachBinary output frame. */
  def asMediaDataset(df: DataFrame): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.as[MediaRecord]
  }
}
