package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.multimodal.Multimodal.MediaCodec

/** ScalaCheck laws for the pure-JVM media codec layer. All JVM-local (no
  * Spark jobs), so the full case budget is cheap: arbitrary PCM buffers and
  * rates must survive the container round-trip bit-exactly, and arbitrary
  * non-WAV bytes must be rejected, not mis-parsed. */
object CodecLawsSpec extends Properties("CodecLaws") {

  private val rateGen: Gen[Int] = Gen.oneOf(8000, 16000, 22050, 44100, 48000)
  private val pcmGen: Gen[List[Short]] =
    Gen.choose(1, 300).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Short.MinValue, Short.MaxValue)))

  private def packLe(samples: List[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    out
  }

  property("hand-rolled container == JDK WAVE writer, and parses back bit-exactly") =
    Prop.forAll(pcmGen, rateGen) { (samples, rate) =>
      val pcm = packLe(samples)
      val hand = graft.multimodal.Multimodal.wavHeader(samples.length, rate) ++ pcm
      val jdk = graft.multimodal.Multimodal.jdkWav(pcm, rate)
      val parsed = MediaCodec.wavPcm16(hand)
      java.util.Arrays.equals(hand, jdk) &&
        parsed.exists { case (sr, out) => sr == rate && out.toList == samples }
    }

  property("audioHistogram partitions every sample into exactly one bin") =
    Prop.forAll(pcmGen, rateGen) { (samples, rate) =>
      val wav = graft.multimodal.Multimodal.wavHeader(samples.length, rate) ++ packLe(samples)
      MediaCodec.audioHistogram(wav).exists { case (_, bins) =>
        bins.length == MediaCodec.FeatureDim && bins.sum == samples.length.toLong
      }
    }

  property("corrupt chunk sizes inside a RIFF container are rejected, not spun on") =
    Prop.forAll(Gen.oneOf(-8, -1, Int.MinValue, Int.MaxValue - 4)) { badSize =>
      // RIFF+WAVE header followed by a chunk whose size field is corrupt:
      // negative sizes used to freeze the chunk walk (off never advanced),
      // huge ones overflowed the offset — both must return None promptly
      val b = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes); b.putInt(40); b.put("WAVE".getBytes)
      b.put("fmt ".getBytes); b.putInt(badSize); b.put(new Array[Byte](28))
      MediaCodec.wavPcm16(b.array()).isEmpty
    }

  property("non-RIFF bytes are rejected, never mis-parsed") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val arr = bytes.toArray
      val looksRiff = arr.length >= 44 &&
        arr.take(4).sameElements("RIFF".getBytes) && arr.slice(8, 12).sameElements("WAVE".getBytes)
      looksRiff || MediaCodec.wavPcm16(arr).isEmpty
    }

  property("generic decode routes WAVs through the real parser, others to the stub") =
    Prop.forAll(pcmGen) { samples =>
      val wav = graft.multimodal.Multimodal.wavHeader(samples.length, 16000) ++ packLe(samples)
      val viaDecode = MediaCodec.decode(wav)
      MediaCodec.decodeAudio(wav).exists(_.sameElements(viaDecode))
    }

  // ---- AVI video container ----

  private val frameDimGen: Gen[(Int, Int)] =
    for { w <- Gen.choose(1, 12); h <- Gen.choose(1, 12) } yield (w, h)

  private def dibFrames(w: Int, h: Int, n: Int, seed: Long): Seq[Array[Byte]] = {
    val stride = ((w * 3 + 3) / 4) * 4
    (0 until n).map { f =>
      val dib = new Array[Byte](stride * h)
      var i = 0
      while (i < dib.length) {
        dib(i) = ((seed + f * 131 + i * 7) % 256).toByte
        i += 1
      }
      dib
    }
  }

  property("AVI container round-trips frames bit-exactly through the walker") =
    Prop.forAll(frameDimGen, Gen.choose(1, 6), Gen.chooseNum(0L, 1000000L)) {
      case ((w, h), n, seed) =>
        val frames = dibFrames(w, h, n, seed)
        val avi = graft.multimodal.Multimodal.aviContainer(frames, w, h, fps = 10)
        MediaCodec.aviDibFrames(avi).exists { case (pw, ph, parsed) =>
          pw == w && ph == h && parsed.size == n &&
            parsed.zip(frames).forall { case (a, b) => java.util.Arrays.equals(a, b) }
        }
    }

  property("videoFrameHistograms partitions every pixel of every frame into one bin") =
    Prop.forAll(frameDimGen, Gen.choose(1, 5), Gen.chooseNum(0L, 1000000L)) {
      case ((w, h), n, seed) =>
        val avi = graft.multimodal.Multimodal.aviContainer(dibFrames(w, h, n, seed), w, h, 10)
        MediaCodec.videoFrameHistograms(avi).exists(hists =>
          hists.size == n && hists.forall(bins =>
            bins.length == MediaCodec.FeatureDim && bins.sum == w.toLong * h))
    }

  property("corrupt chunk sizes inside an AVI are rejected, not spun on") =
    Prop.forAll(Gen.oneOf(-8, -1, Int.MinValue, Int.MaxValue - 4)) { badSize =>
      val b = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes); b.putInt(40); b.put("AVI ".getBytes)
      b.put("LIST".getBytes); b.putInt(badSize); b.put(new Array[Byte](28))
      MediaCodec.aviDibFrames(b.array()).isEmpty
    }

  property("non-AVI bytes are rejected by the AVI walker, never mis-parsed") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val arr = bytes.toArray
      val looksAvi = arr.length >= 24 &&
        arr.take(4).sameElements("RIFF".getBytes) && arr.slice(8, 12).sameElements("AVI ".getBytes)
      looksAvi || MediaCodec.aviDibFrames(arr).isEmpty
    }

  property("generic decode routes AVIs through the real frame decoder") =
    Prop.forAll(frameDimGen, Gen.chooseNum(0L, 1000000L)) { case ((w, h), seed) =>
      val avi = graft.multimodal.Multimodal.aviContainer(dibFrames(w, h, 3, seed), w, h, 10)
      val viaDecode = MediaCodec.decode(avi)
      MediaCodec.decodeVideo(avi).exists(_.sameElements(viaDecode))
    }

  private def patchTag(avi: Array[Byte], tag: String, bodyOffset: Int, value: Array[Byte]): Array[Byte] = {
    val out = avi.clone()
    val idx = out.indices.indexWhere(i => i + 4 <= out.length &&
      new String(out, i, 4, "US-ASCII") == tag)
    require(idx >= 0, s"tag $tag not found")
    System.arraycopy(value, 0, out, idx + 8 + bodyOffset, value.length)
    out
  }

  private def le(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  property("hostile strf geometry (stride*height overflowing Int) is rejected, not crashed on") =
    Prop.forAll(Gen.oneOf(
      (800000000, 1), (Int.MaxValue / 3, 1), (715827883, 1),
      // w AND h near Int.MaxValue: strideL*h wraps LONG past the naive
      // `<= Int.MaxValue` check — the guard must compare by division
      (Int.MaxValue, Int.MaxValue), (Int.MaxValue / 2, Int.MaxValue / 2),
      (46341, 46341))) { case (hugeWidth, hugeHeight) =>
      val avi = graft.multimodal.Multimodal.aviContainer(dibFrames(8, 8, 1, 1L), 8, 8, 10)
      // biWidth is at strf body +4, biHeight at +8
      val patched = patchTag(patchTag(avi, "strf", 4, le(hugeWidth)), "strf", 8, le(hugeHeight))
      MediaCodec.aviDibFrames(patched).isEmpty &&
        MediaCodec.decode(patched).length == MediaCodec.FeatureDim // stub path, no throw
    }

  property("an strf is only honored for the 'vids' stream (audio strf must not set geometry)") =
    Prop.forAll(Gen.chooseNum(0L, 1000L)) { seed =>
      val avi = graft.multimodal.Multimodal.aviContainer(dibFrames(8, 8, 1, seed), 8, 8, 10)
      // flip the stream header's fccType from 'vids' to 'auds': the strf
      // that follows must be ignored, leaving no video geometry → reject
      val patched = patchTag(avi, "strh", 0, "auds".getBytes("US-ASCII"))
      MediaCodec.aviDibFrames(patched).isEmpty
    }

  private def jpegFrames(w: Int, h: Int, n: Int, seed: Long): Seq[Array[Byte]] =
    (0 until n).map { f =>
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((seed + f * 131 + (y * w + x) * 7) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

  property("MJPEG container round-trips the JPEG frame bytes bit-exactly") =
    Prop.forAll(frameDimGen, Gen.choose(1, 4), Gen.chooseNum(0L, 1000000L)) {
      case ((w, h), n, seed) =>
        val frames = jpegFrames(w, h, n, seed)
        val avi = graft.multimodal.Multimodal.aviContainer(frames, w, h, 10, mjpeg = true)
        MediaCodec.aviMjpegFrames(avi).exists(parsed =>
          parsed.size == n &&
            parsed.zip(frames).forall { case (a, b) => java.util.Arrays.equals(a, b) }) &&
          MediaCodec.aviDibFrames(avi).isEmpty // MJPEG is not the DIB flavor
    }

  property("MJPEG frame decode partitions every pixel of every frame into one bin") =
    Prop.forAll(frameDimGen, Gen.choose(1, 3), Gen.chooseNum(0L, 1000000L)) {
      case ((w, h), n, seed) =>
        val avi = graft.multimodal.Multimodal.aviContainer(
          jpegFrames(w, h, n, seed), w, h, 10, mjpeg = true)
        val viaVideo = MediaCodec.decodeVideo(avi)
        MediaCodec.mjpegFrameHistograms(avi).exists(hists =>
          hists.size == n && hists.forall(bins =>
            bins.length == MediaCodec.FeatureDim && bins.sum == w.toLong * h)) &&
          viaVideo.exists(_.sameElements(MediaCodec.decode(avi)))
    }

  property("lowercase 'mjpg' and 'dmb1' biCompression fourccs decode as MJPEG too") =
    Prop.forAll(Gen.oneOf("mjpg", "dmb1"), Gen.chooseNum(0L, 1000L)) { (fourcc, seed) =>
      val avi = graft.multimodal.Multimodal.aviContainer(
        jpegFrames(8, 8, 2, seed), 8, 8, 10, mjpeg = true)
      // biCompression sits at strf body +16
      val patched = patchTag(avi, "strf", 16, fourcc.getBytes("US-ASCII"))
      MediaCodec.aviMjpegFrames(patched).exists(_.size == 2) &&
        MediaCodec.decodeVideo(patched).isDefined
    }

  property("JDK BMP decoder agrees with the DIB unpack on every pixel") =
    Prop.forAll(frameDimGen, Gen.chooseNum(0L, 1000000L)) { case ((w, h), seed) =>
      val dib = dibFrames(w, h, 1, seed).head
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(graft.multimodal.Multimodal.bmpWrap(dib, w, h)))
      val stride = ((w * 3 + 3) / 4) * 4
      img != null && (0 until h).forall { y =>
        (0 until w).forall { x =>
          val row = (h - 1 - y) * stride
          val ours = ((dib(row + 3 * x + 2) & 0xff) << 16) |
            ((dib(row + 3 * x + 1) & 0xff) << 8) | (dib(row + 3 * x) & 0xff)
          (img.getRGB(x, y) & 0xffffff) == ours
        }
      }
    }
}
