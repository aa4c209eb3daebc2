package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Multimodal plumbing tests: schema, typed mapPartitions feature extraction
  * (stubbed decode), and deterministic frame sampling. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark

  private lazy val media = {
    import spark.implicits._
    val df = Seq(
      (1L, "some synthetic image payload bytes for doc one"),
      (2L, "another payload with different content entirely"),
      (3L, "short")
    ).toDF("doc_id", "text")
    Multimodal.attachBinary(df, "doc_id", "text", "image")
  }

  test("attachBinary produces binary content + typed metadata struct") {
    val schema = media.schema
    assert(schema("content").dataType.typeName == "binary")
    val metaType = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(metaType.fieldNames.toSet ==
      Set("modality", "mime", "width", "height", "sampleRate", "nFrames"))
    assert(media.select("meta.modality").distinct().head().getString(0) == "image")
  }

  test("extractFeatures runs partition-local and returns normalized vectors") {
    val feats = Multimodal.extractFeatures(Multimodal.asMediaDataset(media)).collect()
    assert(feats.length == 3)
    assert(feats.forall(_.dim == Multimodal.MediaCodec.FeatureDim))
    // histogram is normalized: sums to 1 for non-empty payloads
    assert(feats.forall(f => math.abs(f.features.sum - 1.0) < 1e-9))
    // deterministic: second run bit-identical
    val again = Multimodal.extractFeatures(Multimodal.asMediaDataset(media)).collect()
    assert(feats.sortBy(_.id).zip(again.sortBy(_.id)).forall {
      case (a, b) => a.features.sameElements(b.features)
    })
  }

  test("WAV round-trip: JDK encode parses back through the from-scratch RIFF parser") {
    import spark.implicits._
    val wavs = Multimodal.encodeDemoWav(
      Seq(1L, 2L, 7L).toDF("doc_id"), "doc_id").collect().sortBy(_.id)
    assert(wavs.length == 3)
    wavs.foreach { w =>
      val (sr, samples) = Multimodal.MediaCodec.wavPcm16(w.wav).getOrElse(
        fail(s"JDK-encoded WAV for id ${w.id} did not parse"))
      assert(sr == 16000)
      assert(samples.length == Multimodal.DemoWavSamples)
      // every decoded sample matches the declared pure-arithmetic waveform
      samples.zipWithIndex.foreach { case (s, i) =>
        assert(s == ((((w.id * 37 + i * 13) % 65536 + 65536) % 65536) - 32768).toShort)
      }
    }
  }

  test("decodedAudioHistogram bins match the sample formula; decode dispatches to audio") {
    import spark.implicits._
    val media = Multimodal.encodeDemoWav(Seq(5L).toDF("doc_id"), "doc_id")
    val rows = Multimodal.decodedAudioHistogram(media).collect()
    assert(rows.length == Multimodal.MediaCodec.FeatureDim)
    assert(rows.forall(_.sampleRate == 16000))
    assert(rows.map(_.n).sum == Multimodal.DemoWavSamples)
    val expected = (0 until Multimodal.DemoWavSamples)
      .groupBy(i => ((5L * 37 + i * 13) % 65536).toInt / 4096)
      .view.mapValues(_.size.toLong).toMap
    rows.foreach(r => assert(r.n == expected.getOrElse(r.bin, 0L)))
    // the generic decode dispatch routes a WAV payload through the real
    // parser, not the byte-histogram stub
    val wav = media.collect().head.wav
    val viaDecode = Multimodal.MediaCodec.decode(wav)
    val viaAudio = Multimodal.MediaCodec.decodeAudio(wav).get
    assert(viaDecode.sameElements(viaAudio))
    assert(!viaDecode.sameElements(Multimodal.MediaCodec.decodeStub(wav)))
    // non-WAV bytes are rejected by the parser, not mis-parsed
    assert(Multimodal.MediaCodec.wavPcm16("definitely not a riff container".getBytes).isEmpty)
  }

  test("binaryFile ingestion round-trips real AVI files through the codec") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val dir = Files.createDirectories(Paths.get("target/mm_spec/avis"))
    // write three real AVI files, then ingest them back through Spark's
    // binaryFile source and decode — the full blob-store entry path
    val byId = Multimodal.encodeDemoAvi(Seq(1L, 2L, 3L).toDF("id"), "id")
      .collect().map(r => r.id -> r.avi).toMap
    byId.foreach { case (id, bytes) => Files.write(dir.resolve(s"$id.avi"), bytes) }
    val ingested = Multimodal.readBinaryFiles(spark, dir.toString, glob = "*.avi")
    assert(ingested.count() == 3)
    val decoded = ingested
      .select(regexp_extract(col("path"), "(\\d+)\\.avi$", 1).cast("long").as("id"), col("content"))
      .as[(Long, Array[Byte])]
      .collect().toMap
    byId.foreach { case (id, bytes) =>
      assert(java.util.Arrays.equals(decoded(id), bytes), s"payload for $id changed in flight")
      assert(Multimodal.MediaCodec.videoFrameHistograms(decoded(id)).nonEmpty)
    }
    // length pushdown reaches the file-listing relation
    val pruned = Multimodal.readBinaryFiles(spark, dir.toString, glob = "*.avi")
      .filter(col("length") > 0)
    assert(pruned.count() == 3)
  }

  test("sampleFrames keeps every stride-th frame with deterministic bytes") {
    def snapshot() = Multimodal.sampleFrames(media, stride = 2)
      .select(col("id"), col("frame_idx"), base64(col("frame_bytes")).as("b64"), col("frame_len"))
      .collect()
    val rows = snapshot()
    assert(rows.nonEmpty)
    // only even frame indexes survive stride=2
    assert(rows.forall(_.getAs[Int]("frame_idx") % 2 == 0))
    // frame bytes are non-empty slices of the payload
    assert(rows.forall(_.getAs[Long]("frame_len") > 0))
    val again = snapshot()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }
}
