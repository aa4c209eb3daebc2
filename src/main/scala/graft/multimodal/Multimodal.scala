package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY.md §2.3): media payloads travel as
  * opaque `binary` columns beside a typed metadata struct; decode /
  * feature-extraction / frame-sampling run as partition-local typed
  * transforms (`mapPartitions`), the JVM analogue of `mapInPandas` — batch
  * iteration per partition, stable output schema, no driver involvement.
  *
  * Byte decoding is REAL for all three modalities: raster images via
  * `javax.imageio` ([[MediaCodec.imageHistogram]]), 16-bit mono PCM WAV
  * audio via a from-scratch RIFF parser ([[MediaCodec.wavPcm16]]), and AVI
  * video via the same chunk-walker pattern in both common flavors —
  * uncompressed 24-bit DIB ([[MediaCodec.aviDibFrames]], pixel unpack
  * cross-checked against the JDK's own BMP decoder) and motion JPEG
  * ([[MediaCodec.aviMjpegFrames]], per-frame ImageIO decode).
  * [[MediaCodec.decodeStub]] remains only as the fallback for payloads in
  * none of those containers, so the generic pipeline stays total.
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

  /** REAL blob ingestion: reads a directory of media files through Spark's
    * built-in `binaryFile` source — (path, length, content) per file, the
    * actual entry point for image/audio/video corpora on a cluster (the
    * source supports predicate pushdown on path/length/modificationTime,
    * so a `length < N` filter prunes at the file listing, not after read). */
  def readBinaryFiles(spark: org.apache.spark.sql.SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir) // (path, modificationTime, length, content) — keep all four

  /** Wraps a text column as a fake media payload with typed metadata —
    * stands in for [[readBinaryFiles]] when the corpus has no real files. */
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
    // ImageIO wraps every read/write stream in a TEMP-FILE-backed cache by
    // default — disk churn on every row of a codec stage. Our payloads are
    // in-memory byte arrays, so the memory cache is strictly better; set
    // once per JVM on first codec use (object init runs per executor).
    javax.imageio.ImageIO.setUseCache(false)

    val FeatureDim = 16

    /** STUB decoder for modalities with no JVM codec in this environment
      * (audio/video): a real implementation would decode the payload here
      * (e.g. via a JNI codec). The deterministic stand-in is a normalized
      * 16-bin byte histogram — stable across runs and partitions so the
      * downstream pipeline is testable end-to-end. */
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

    /** REAL pure-JVM raster decode (`javax.imageio` ships PNG/BMP/GIF/JPEG
      * readers): decodes the payload and bins pixel luminance
      * (integer ITU-R 601: (299·R + 587·G + 114·B)/1000) into
      * [[FeatureDim]] counts. None when the payload is not a decodable
      * raster image. */
    def imageHistogram(content: Array[Byte]): Option[Array[Long]] = {
      // NonFatal, not just IOException: ImageIO plugin readers throw
      // RuntimeExceptions (CMMException, IndexOutOfBounds, IllegalArgument)
      // on corrupt image-like payloads, and decode() dispatches arbitrary
      // binary content here — a malformed payload must fall back to the
      // stub, not fail the Spark task
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val bins = new Array[Long](FeatureDim)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            bins(lum * FeatureDim / 256) += 1L
            x += 1
          }
          y += 1
        }
        Some(bins)
      }
    }

    /** 64-bit perceptual hash (the classic DCT pHash): decode → 32×32
      * block-averaged luminance (exact integer area mapping, pixel
      * replication when the source is smaller) → 2D orthonormal DCT-II →
      * the top-left 8×8 low-frequency block → bit k set iff its
      * coefficient exceeds the block's AC mean (DC excluded from the mean
      * and carried as bit 0 = 0). Two invariances fall out of the
      * construction and are spec-pinned: a uniform brightness shift only
      * moves the DC coefficient, and a positive contrast scale multiplies
      * every AC coefficient AND their mean by the same factor — neither
      * flips any bit (absent clipping). None for undecodable payloads.
      *
      * Row-local; the hash is 8 bytes per image, so the NEAR-DUP join
      * ([[imageNearDup]]) never moves pixels — the SimHash scale story. */
    def pHash64(content: Array[Byte]): Option[Long] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val N = 32
        val w = img.getWidth
        val h = img.getHeight
        // 32×32 block-averaged luminance (integer ITU-R 601 per pixel)
        val lum = Array.ofDim[Double](N, N)
        var ty = 0
        while (ty < N) {
          val y0 = ty * h / N
          val y1 = math.min(h, math.max(y0 + 1, (ty + 1) * h / N))
          var tx = 0
          while (tx < N) {
            val x0 = tx * w / N
            val x1 = math.min(w, math.max(x0 + 1, (tx + 1) * w / N))
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                  (rgb & 0xff) * 114) / 1000
                x += 1
              }
              y += 1
            }
            lum(ty)(tx) = sum.toDouble / ((y1 - y0) * (x1 - x0))
            tx += 1
          }
          ty += 1
        }
        // separable orthonormal DCT-II, but only the 8 output rows/cols
        // the hash reads — 8·32 dot products per axis, not 32·32
        val K = 8
        val cosT = Array.tabulate(K, N)((u, x) =>
          math.cos((2 * x + 1) * u * math.Pi / (2 * N)) *
            (if (u == 0) math.sqrt(1.0 / N) else math.sqrt(2.0 / N)))
        val rows = Array.ofDim[Double](K, N) // DCT along y, keep 8 u-rows
        var u = 0
        while (u < K) {
          var x = 0
          while (x < N) {
            var s = 0.0
            var y = 0
            while (y < N) { s += lum(y)(x) * cosT(u)(y); y += 1 }
            rows(u)(x) = s
            x += 1
          }
          u += 1
        }
        val block = Array.ofDim[Double](K, K)
        u = 0
        while (u < K) {
          var v = 0
          while (v < K) {
            var s = 0.0
            var x = 0
            while (x < N) { s += rows(u)(x) * cosT(v)(x); x += 1 }
            block(u)(v) = s
            v += 1
          }
          u += 1
        }
        var acSum = 0.0
        u = 0
        while (u < K) {
          var v = 0
          while (v < K) { if (u != 0 || v != 0) acSum += block(u)(v); v += 1 }
          u += 1
        }
        val mean = acSum / (K * K - 1)
        var bits = 0L
        u = 0
        while (u < K) {
          var v = 0
          while (v < K) {
            if ((u != 0 || v != 0) && block(u)(v) > mean)
              bits |= 1L << (u * K + v)
            v += 1
          }
          u += 1
        }
        Some(bits)
      }
    }

    /** 64-bit audio fingerprint — the WAV twin of [[pHash64]]: decode via
      * the from-scratch RIFF parser ([[wavPcm16]]) → 64 equal frames of
      * summed absolute amplitude (integer energies; short frames below 64
      * samples replicate, matching pHash's pixel replication) → 1D
      * orthonormal DCT-II over the energy envelope → bit k set iff
      * coefficient k exceeds the AC mean (DC excluded, bit 0 = 0). The
      * pHash invariance carries over exactly: a VOLUME scale multiplies
      * every energy, hence every AC coefficient and their mean, by the
      * same factor — bit-identical fingerprints (absent clipping),
      * spec-pinned. None for undecodable payloads. */
    def audioFingerprint64(content: Array[Byte]): Option[Long] =
      wavPcm16(content).map { case (_, samples) =>
        val N = 64
        val n = samples.length
        val energy = new Array[Double](N)
        var f = 0
        while (f < N) {
          val s0 = f * n / N
          val s1 = math.min(n, math.max(s0 + 1, (f + 1) * n / N))
          var sum = 0L
          var i = s0
          while (i < s1) { sum += math.abs(samples(i).toLong); i += 1 }
          energy(f) = sum.toDouble / (s1 - s0)
          f += 1
        }
        val coef = new Array[Double](N)
        var u = 0
        while (u < N) {
          var s = 0.0
          var x = 0
          while (x < N) {
            s += energy(x) * math.cos((2 * x + 1) * u * math.Pi / (2 * N))
            x += 1
          }
          coef(u) = s * (if (u == 0) math.sqrt(1.0 / N) else math.sqrt(2.0 / N))
          u += 1
        }
        var acSum = 0.0
        u = 1
        while (u < N) { acSum += coef(u); u += 1 }
        val mean = acSum / (N - 1)
        var bits = 0L
        u = 1
        while (u < N) { if (coef(u) > mean) bits |= 1L << u; u += 1 }
        bits
      }

    /** Normalized variant of [[imageHistogram]] in the feature-vector shape. */
    def decodeImage(content: Array[Byte]): Option[Array[Double]] =
      imageHistogram(content).map { bins =>
        val n = math.max(bins.sum, 1L).toDouble
        bins.map(_ / n)
      }

    /** REAL pure-JVM audio decode: a from-scratch RIFF/WAVE chunk walker for
      * 16-bit mono PCM (the canonical uncompressed layout — no codec
      * library needed, per-sample little-endian shorts straight from the
      * `data` chunk). Returns (sampleRate, samples), or None when the
      * payload is not such a WAV. Deliberately independent of
      * `javax.sound.sampled` so an encode via the JDK's WAVE writer and a
      * decode through this parser cross-check each other. */
    def wavPcm16(content: Array[Byte]): Option[(Int, Array[Short])] = {
      def le16(o: Int): Int = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
      def le32(o: Int): Int = le16(o) | (le16(o + 2) << 16)
      def tag(o: Int): String =
        new String(content, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (content.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var pcmMono16 = false
      var sampleRate = 0
      var out: Option[(Int, Array[Short])] = None
      var malformed = false
      while (out.isEmpty && !malformed && off + 8 <= content.length) {
        val sz = le32(off + 4)
        val body = off + 8
        // a corrupt size field (negative, or overflowing past the buffer)
        // must reject the payload, not spin the chunk walk forever or throw
        // out of the decode dispatch
        if (sz < 0) malformed = true
        else {
          tag(off) match {
            case "fmt " if body + 16 <= content.length =>
              // format 1 = integer PCM, 1 channel, 16 bits/sample
              pcmMono16 = le16(body) == 1 && le16(body + 2) == 1 && le16(body + 14) == 16
              sampleRate = le32(body + 4)
            case "data" if pcmMono16 =>
              val n = math.min(sz.toLong, (content.length - body).toLong).toInt / 2
              val samples = new Array[Short](n)
              var i = 0
              while (i < n) {
                samples(i) = ((content(body + 2 * i) & 0xff) | (content(body + 2 * i + 1) << 8)).toShort
                i += 1
              }
              out = Some((sampleRate, samples))
            case _ =>
          }
          val next = body.toLong + sz.toLong + (sz & 1) // RIFF chunks are word-aligned
          if (next > Int.MaxValue) malformed = true else off = next.toInt
        }
      }
      if (malformed) None else out
    }

    /** Amplitude histogram over decoded PCM samples: [[FeatureDim]] equal
      * bins over the signed 16-bit range (bin = (sample + 32768) / 4096). */
    def audioHistogram(content: Array[Byte]): Option[(Int, Array[Long])] =
      wavPcm16(content).map { case (sr, samples) =>
        val bins = new Array[Long](FeatureDim)
        var i = 0
        while (i < samples.length) {
          bins((samples(i) + 32768) >> 12) += 1L
          i += 1
        }
        (sr, bins)
      }

    /** Normalized variant of [[audioHistogram]] in the feature-vector shape. */
    def decodeAudio(content: Array[Byte]): Option[Array[Double]] =
      audioHistogram(content).map { case (_, bins) =>
        val n = math.max(bins.sum, 1L).toDouble
        bins.map(_ / n)
      }

    /** Dispatch: real image decode when the payload parses as a raster
      * image, real PCM decode when it parses as a 16-bit mono WAV, real
      * frame decode when it parses as an uncompressed-DIB AVI, deterministic
      * stub only for payloads in none of those containers (the three RIFF
      * form tags — WAVE, 'AVI ' — and ImageIO's magic sniffing are
      * mutually exclusive, so dispatch order cannot misroute). */
    def decode(content: Array[Byte]): Array[Double] =
      decodeImage(content)
        .orElse(decodeAudio(content))
        .orElse(decodeVideo(content))
        .getOrElse(decodeStub(content))

    /** REAL pure-JVM video container decode: a from-scratch RIFF/AVI chunk
      * walker for uncompressed 24-bit bottom-up DIB frames (BI_RGB — raw
      * BGR rows straight out of the `movi` list, no codec library needed;
      * same walker pattern as [[wavPcm16]], recursing into LIST chunks).
      * Returns (width, height, frames as raw DIB byte blocks), or None when
      * the payload is not such an AVI. Deliberately independent of ImageIO
      * so the per-frame pixel unpack and the JDK's BMP decoder can
      * cross-check each other (see [[Multimodal.decodedVideoHistogram]]). */
    /** biCompression fourcc for motion-JPEG ('MJPG' little-endian). */
    private[multimodal] val FourccMjpg = 0x47504a4d

    /** Shared RIFF/'AVI ' walk: (width, height, biBitCount, biCompression,
      * frame chunks), or None when not a structurally valid AVI. */
    private def parseAvi(content: Array[Byte]): Option[(Int, Int, Int, Int, Vector[Array[Byte]])] = {
      def le16(o: Int): Int = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
      def le32(o: Int): Int = le16(o) | (le16(o + 2) << 16)
      def tag(o: Int): String =
        new String(content, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (content.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
      var width = 0
      var height = 0
      var bitCount = 0
      var compression = -1
      var sawVidsStrf = false
      var lastStrhType = ""
      // AVI streams are numbered in strl (strh) order; movi chunk tags carry
      // that number as their 2-digit prefix. Frames are collected ONLY for
      // the video stream's index — without this, a multi-stream AVI would
      // interleave every stream's chunks under one geometry. A second video
      // stream rejects the payload (fail-loud, not silent frame mixing).
      var strhSeen = 0
      var vidsStreamIdx = -1
      val frames = Vector.newBuilder[Array[Byte]]
      var malformed = false
      // walk chunks in [from, to); LIST recursion is depth-capped so a
      // nesting bomb in a hostile payload rejects instead of overflowing
      def walk(from: Int, to: Int, depth: Int): Unit = {
        if (depth > 8) { malformed = true; return }
        var off = from
        while (!malformed && off + 8 <= to) {
          val sz = le32(off + 4)
          val body = off + 8
          // corrupt size fields (negative, or past the buffer) reject the
          // payload, same policy as the WAV walker
          if (sz < 0 || body.toLong + sz.toLong > content.length) malformed = true
          else {
            tag(off) match {
              case "LIST" if sz >= 4 => walk(body + 4, body + sz, depth + 1)
              case "strh" if sz >= 4 =>
                lastStrhType = tag(body) // 'vids' / 'auds' / 'txts' / ...
                if (lastStrhType == "vids") {
                  if (vidsStreamIdx >= 0) malformed = true // second video stream
                  else vidsStreamIdx = strhSeen
                }
                strhSeen += 1
              case "strf" if sz >= 40 && lastStrhType == "vids" =>
                // BITMAPINFOHEADER: biWidth/biHeight at +4/+8, biBitCount at
                // +14, biCompression at +16 (0 = BI_RGB, 'MJPG' = motion
                // JPEG). Gated on the preceding strh being the VIDEO stream
                // — an audio strf (WAVEFORMATEXTENSIBLE is also ≥ 40 bytes)
                // must not overwrite the frame geometry.
                width = le32(body + 4)
                height = le32(body + 8)
                bitCount = le16(body + 14)
                compression = le32(body + 16)
                sawVidsStrf = true
              case t if t.length == 4 && t(0).isDigit && t(1).isDigit &&
                  (t.endsWith("db") || t.endsWith("dc")) =>
                if ((t(0) - '0') * 10 + (t(1) - '0') == vidsStreamIdx)
                  frames += java.util.Arrays.copyOfRange(content, body, body + sz)
              case _ => // avih/idx1/JUNK: structure only, not needed here
            }
            val next = body.toLong + sz.toLong + (sz & 1) // word-aligned
            if (next > Int.MaxValue) malformed = true else off = next.toInt
          }
        }
      }
      walk(12, content.length, 0)
      val fs = frames.result()
      if (malformed || !sawVidsStrf || width <= 0 || height <= 0 || fs.isEmpty) None
      else Some((width, height, bitCount, compression, fs))
    }

    /** MJPEG biCompression fourccs seen in the wild: canonical 'MJPG', its
      * lowercase form (fourccs are case-insensitive in practice), and
      * 'dmb1' (Matrox/QuickTime MJPEG-A). */
    private def isMjpegFourcc(compression: Int): Boolean =
      compression == FourccMjpg ||
        compression == 0x67706a6d /* 'mjpg' */ ||
        compression == 0x31626d64 /* 'dmb1' */

    /** Geometry bound: a hostile strf can claim dimensions whose DIB
      * stride·height overflows — compare by DIVISION (multiplying the two
      * Longs can itself wrap past the Int.MaxValue check for dimensions
      * near Int.MaxValue), so every downstream pixel loop can index with
      * plain Ints. */
    private def dibGeometryFits(w: Int, h: Int): Boolean = {
      val strideL = (w.toLong * 3 + 3) / 4 * 4
      strideL <= Int.MaxValue && strideL <= Int.MaxValue / h
    }

    def aviDibFrames(content: Array[Byte]): Option[(Int, Int, Vector[Array[Byte]])] =
      parseAvi(content).collect {
        case (w, h, 24, 0, fs) if dibGeometryFits(w, h) => (w, h, fs)
      }

    /** Motion-JPEG AVI: each `movi` frame chunk is a standalone JPEG blob
      * (the common camera/capture flavor). Geometry comes from the JPEGs
      * themselves at decode time, so only the container fields are read
      * here. */
    def aviMjpegFrames(content: Array[Byte]): Option[Vector[Array[Byte]]] =
      parseAvi(content).collect { case (_, _, _, c, fs) if isMjpegFourcc(c) => fs }

    /** Per-frame luminance histograms over ALREADY-PARSED DIB frames (same
      * integer ITU-R 601 binning as [[imageHistogram]]); DIB rows are
      * bottom-up BGR padded to 4-byte boundaries. None when a frame is
      * shorter than the stride·height geometry demands — callers must check
      * BEFORE touching frame bytes. */
    def frameHistograms(w: Int, h: Int, frames: Vector[Array[Byte]]): Option[Vector[Array[Long]]] = {
      // public entry point: re-validate geometry here, not just in
      // aviDibFrames — a direct caller with hostile w/h must get None, not
      // overflowed indices
      if (w <= 0 || h <= 0 || !dibGeometryFits(w, h)) return None
      val stride = ((w * 3 + 3) / 4) * 4
      if (frames.exists(_.length < stride.toLong * h)) None
      else Some(frames.map { fb =>
        val bins = new Array[Long](FeatureDim)
        var y = 0
        while (y < h) {
          val row = (h - 1 - y) * stride
          var x = 0
          while (x < w) {
            val b = fb(row + 3 * x) & 0xff
            val g = fb(row + 3 * x + 1) & 0xff
            val r = fb(row + 3 * x + 2) & 0xff
            val lum = (r * 299 + g * 587 + b * 114) / 1000
            bins(lum * FeatureDim / 256) += 1L
            x += 1
          }
          y += 1
        }
        bins
      })
    }

    /** [[frameHistograms]] over a raw AVI payload. */
    def videoFrameHistograms(content: Array[Byte]): Option[Vector[Array[Long]]] =
      aviDibFrames(content).flatMap { case (w, h, frames) => frameHistograms(w, h, frames) }

    /** Per-frame JPEG decode shared by [[mjpegFrameHistograms]] and
      * [[decodeVideo]]: None when ANY frame fails to decode — a
      * half-readable clip must not silently shrink. */
    private def mjpegHistsOf(frames: Vector[Array[Byte]]): Option[Vector[Array[Long]]] = {
      val hists = frames.map(imageHistogram)
      if (hists.exists(_.isEmpty)) None else Some(hists.map(_.get))
    }

    /** Per-frame luminance histograms for a motion-JPEG AVI: each frame is
      * a standalone JPEG decoded through [[imageHistogram]] (ImageIO ships
      * the JPEG reader). */
    def mjpegFrameHistograms(content: Array[Byte]): Option[Vector[Array[Long]]] =
      aviMjpegFrames(content).flatMap(mjpegHistsOf)

    /** Normalized all-frames feature vector over either supported video
      * container flavor — ONE container walk, dispatched on the strf's
      * (bitCount, compression). */
    def decodeVideo(content: Array[Byte]): Option[Array[Double]] =
      parseAvi(content).flatMap {
        case (w, h, 24, 0, fs) if dibGeometryFits(w, h) => frameHistograms(w, h, fs)
        case (_, _, _, c, fs) if isMjpegFourcc(c) => mjpegHistsOf(fs)
        case _ => None
      }.map { hists =>
        val agg = new Array[Double](FeatureDim)
        hists.foreach { h =>
          var i = 0
          while (i < FeatureDim) { agg(i) += h(i); i += 1 }
        }
        val n = math.max(agg.sum, 1.0)
        agg.map(_ / n)
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
        val feats = MediaCodec.decode(r.content)
        MediaFeature(r.id, r.meta.modality, feats.length, feats)
      }
    }
  }

  case class IdPng(id: Long, png: Array[Byte])
  case class IdBinCount(id: Long, bin: Int, n: Long)

  /** Deterministic 8×8 RGB PNG per row — pixel i (row-major) carries
    * (id·31 + i) mod 256 on all three channels, a REAL `ImageIO` encode per
    * row, partition-local. Stands in for binary image payloads the test
    * corpus lacks; because the pixel function is pure arithmetic on the id,
    * the decoded histogram is exactly re-derivable by any SQL engine, which
    * makes the full encode→decode codec path oracle-checkable. */
  def encodeDemoPng(df: DataFrame, idCol: String): Dataset[IdPng] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < 64) {
          val v = (((id * 31 + i) % 256 + 256) % 256).toInt
          img.setRGB(i % 8, i / 8, (v << 16) | (v << 8) | v)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        IdPng(id, bos.toByteArray)
      }
    }
  }

  /** Decode-side histogram over real image payloads: one (id, bin, n) row
    * per luminance bin, zero bins included so the output shape is fixed.
    * Fail-loud on undecodable payloads — this path is for images, not the
    * stubbed modalities. */
  def decodedHistogram(media: Dataset[IdPng]): Dataset[IdBinCount] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val bins = MediaCodec.imageHistogram(r.png).getOrElse(
        throw new IllegalStateException(s"payload for id ${r.id} is not a decodable image"))
      bins.iterator.zipWithIndex.map { case (n, b) => IdBinCount(r.id, b, n) }.toSeq
    }
  }

  /** Per-image perceptual hashes: (id, phash) with undecodable payloads
    * DROPPED (a NULL hash can never near-dup; callers wanting fail-loud
    * use [[MediaCodec.pHash64]] directly). Row-local decode + hash;
    * 8 bytes per image leave this stage. */
  def imagePHashes(media: Dataset[IdPng]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap(r => MediaCodec.pHash64(r.png).map(h => (r.id, h)))
      .toDF("id", "phash")
  }

  /** Per-clip audio fingerprints: (id, afp) with undecodable payloads
    * dropped — the WAV twin of [[imagePHashes]]. */
  def audioFingerprints(media: Dataset[IdWav]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap(r => MediaCodec.audioFingerprint64(r.wav).map(h => (r.id, h)))
      .toDF("id", "afp")
  }

  /** Visual/auditory near-dup candidate pairs over 64-bit perceptual
    * hashes (works on any long hash column — pHash, audio fingerprint):
    * 4×16-bit banding (any pair within Hamming 3 shares one clean band by
    * pigeonhole — the SimHash recall dial, documented not hidden), then a
    * row-local `bit_count(a ^ b)` confirm at `maxHamming`. The join moves
    * only (id, hash) — pixels/samples never shuffle. Returns
    * (id_a, id_b, hamming), each pair once. */
  def imageNearDup(
      hashes: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 10): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64, "maxHamming must be in [0, 64]")
    val bands = hashes
      .filter(col(hashCol).isNotNull)
      .select(col(idCol).as("__id"), col(hashCol).cast("long").as("__h"),
        explode(sequence(lit(0), lit(3))).as("__band"))
      .withColumn("__key", expr("shiftright(__h, cast(__band * 16 as int)) & 65535L"))
    val a = bands.select(col("__band"), col("__key"),
      col("__id").as("id_a"), col("__h").as("__ha"))
    val b = bands.select(col("__band"), col("__key"),
      col("__id").as("id_b"), col("__h").as("__hb"))
    a.join(b, Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__ha"), col("__hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(__ha ^ __hb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Per-frame perceptual hashes over real AVI payloads: one
    * (id, frame_idx, fhash) row per decodable frame (each DIB frame rides
    * the BMP wrap through the SAME [[MediaCodec.pHash64]] the image path
    * uses); clips that don't parse are dropped. Row-local decode —
    * 8 bytes per frame leave this stage. */
  def videoPHashes(media: Dataset[IdAvi]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      MediaCodec.aviDibFrames(r.avi) match {
        case Some((w, h, frames)) =>
          frames.iterator.zipWithIndex.flatMap { case (dib, fi) =>
            MediaCodec.pHash64(bmpWrap(dib, w, h)).map(hh => (r.id, fi, hh))
          }.toSeq
        case None => Seq.empty[(Long, Int, Long)]
      }
    }.toDF("id", "frame_idx", "fhash")
  }

  /** Visual near-dup over VIDEO clips from their per-frame hash sets: two
    * clips are candidates when they share any exact frame hash (one
    * identical-looking frame), and confirm at `minShareMicro` of the
    * smaller clip's distinct frame hashes —
    * `share_micro = (n_shared · 1e6) div min(nA, nB)`. A frame hash
    * appearing in more than `maxFrameDf` clips is dropped from pairing
    * (the winnow df-cap convention: an intro card shared by half the
    * corpus is Σfreq² poison and carries no pair evidence). Returns
    * (id_a, id_b, n_shared, share_micro), each pair once. */
  def videoNearDup(
      frames: DataFrame,
      idCol: String,
      hashCol: String,
      minShareMicro: Long = 500000L,
      maxFrameDf: Int = 1000): DataFrame = {
    require(minShareMicro >= 0 && minShareMicro <= 1000000L,
      "minShareMicro must be in [0, 1e6]")
    require(maxFrameDf >= 2, "maxFrameDf must be >= 2 (pairs need 2 docs)")
    val dh = frames.select(col(idCol).as("__id"), col(hashCol).as("__h")).distinct()
    val sizes = dh.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val kept = dh.join(
      dh.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxFrameDf).select(col("__h")), Seq("__h"))
    val shared = kept.select(col("__h"), col("__id").as("id_a"))
      .join(kept.select(col("__h"), col("__id").as("id_b")), Seq("__h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("__id").as("id_a"), col("__n").as("__na")), Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("__n").as("__nb")), Seq("id_b"))
      .withColumn("share_micro",
        expr("(n_shared * 1000000L) div least(__na, __nb)"))
      .filter(col("share_micro") >= minShareMicro)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("share_micro"))
  }

  case class IdWav(id: Long, wav: Array[Byte])
  case class IdAudioBin(id: Long, sampleRate: Int, bin: Int, n: Long)

  /** Samples per demo waveform — small enough that the whole clip is one
    * in-memory payload, large enough that every histogram bin can be hit. */
  val DemoWavSamples = 100

  /** Canonical 44-byte RIFF/WAVE header for 16-bit mono PCM. Must stay
    * byte-identical to what the JDK's WAVE writer emits for the same
    * format — [[encodeDemoWav]] asserts that equality once per partition,
    * so a divergence fails the job instead of silently shipping a
    * non-canonical container. */
  def wavHeader(nSamples: Int, sampleRate: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val b = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    b.putInt(36 + dataLen)
    b.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    b.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    b.putInt(16)            // fmt chunk size
    b.putShort(1)           // PCM
    b.putShort(1)           // mono
    b.putInt(sampleRate)
    b.putInt(sampleRate * 2) // byte rate
    b.putShort(2)           // block align
    b.putShort(16)          // bits per sample
    b.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    b.putInt(dataLen)
    b.array()
  }

  /** The JDK's own WAVE container encode (`javax.sound.sampled`) of a raw
    * 16-bit mono PCM buffer — the reference encoder [[encodeDemoWav]]
    * cross-checks against. Not used per row: `AudioSystem.write` walks the
    * synchronized provider registry on every call, which contends across
    * executor threads at corpus scale (measured superlinear: 20× wall time
    * for 10× rows at 32 threads). */
  def jdkWav(pcm: Array[Byte], sampleRate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic 16-bit mono PCM WAV per row: sample i carries the signed
    * value ((id·37 + i·13) mod 65536) − 32768 at 16 kHz. The sample function
    * is pure integer arithmetic on the id, so the decoded amplitude
    * histogram is exactly re-derivable by any SQL engine — which makes the
    * encode→decode container round-trip oracle-checkable the same way
    * [[encodeDemoPng]] does for images.
    *
    * Container bytes are hand-rolled ([[wavHeader]] + samples) for
    * throughput, but the FIRST row of every partition is also encoded with
    * the JDK's own WAVE writer ([[jdkWav]]) and the two must be
    * byte-identical — the real-codec evidence survives without paying the
    * `AudioSystem` provider-registry lock on every row (which measured
    * superlinear under 32 threads: 20× wall for 10× rows). */
  def encodeDemoWav(df: DataFrame, idCol: String): Dataset[IdWav] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      val header = wavHeader(DemoWavSamples, 16000)
      var jdkChecked = false
      ids.map { id =>
        val pcm = new Array[Byte](DemoWavSamples * 2)
        var i = 0
        while (i < DemoWavSamples) {
          // double-mod keeps the remainder non-negative for negative ids
          // (Scala % is sign-following), same pattern as encodeDemoPng
          val v = ((((id * 37 + i * 13) % 65536 + 65536) % 65536) - 32768).toInt
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val wav = new Array[Byte](header.length + pcm.length)
        System.arraycopy(header, 0, wav, 0, header.length)
        System.arraycopy(pcm, 0, wav, header.length, pcm.length)
        if (!jdkChecked) {
          val viaJdk = jdkWav(pcm, 16000)
          if (!java.util.Arrays.equals(viaJdk, wav))
            throw new IllegalStateException(
              "hand-rolled WAV container diverges from the JDK WAVE writer " +
                s"(jdk ${viaJdk.length} bytes vs ${wav.length})")
          jdkChecked = true
        }
        IdWav(id, wav)
      }
    }
  }

  /** Decode-side amplitude histogram over real WAV payloads via the
    * from-scratch RIFF parser (NOT the JDK API that encoded them): one
    * (id, sampleRate, bin, n) row per bin, zero bins included so the output
    * shape is fixed; the parsed sample rate pins the header fields.
    * Fail-loud on undecodable payloads — this path is for PCM WAVs. */
  def decodedAudioHistogram(media: Dataset[IdWav]): Dataset[IdAudioBin] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val (sr, bins) = MediaCodec.audioHistogram(r.wav).getOrElse(
        throw new IllegalStateException(s"payload for id ${r.id} is not a 16-bit mono PCM WAV"))
      bins.iterator.zipWithIndex.map { case (n, b) => IdAudioBin(r.id, sr, b, n) }.toSeq
    }
  }

  case class IdAvi(id: Long, avi: Array[Byte])
  case class IdFrameBin(id: Long, frameIdx: Int, bin: Int, n: Long)

  /** Demo video shape: 4 frames of 8×8 24-bit pixels — small enough that a
    * clip is one in-memory payload, and an 8-pixel row is 24 bytes, already
    * 4-byte aligned, so the DIB stride equals the raw row width. */
  val DemoAviFrames = 4
  val DemoAviSide = 8

  /** Canonical RIFF/'AVI ' container: LIST hdrl (avih main header + LIST
    * strl with a 'vids' strh and a BITMAPINFOHEADER strf), LIST movi of
    * frame chunks, and a standard idx1 index (offsets relative to the
    * 'movi' fourcc, keyframe flag set — players require it; the walker
    * ignores it). All fields little-endian, chunks word-aligned. With
    * `mjpeg = false` frames are uncompressed 24-bit DIB ('DIB ' handler,
    * BI_RGB, '00db' chunks); with `mjpeg = true` each frame is a standalone
    * JPEG blob ('MJPG' handler and compression, '00dc' chunks). */
  def aviContainer(
      frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
      mjpeg: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty && fps > 0)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val handler = if (mjpeg) "MJPG" else "DIB "
    val compression = if (mjpeg) MediaCodec.FourccMjpg else 0
    val chunkTag = if (mjpeg) "00dc" else "00db"
    val frameSize = frames.head.length
    val avihSz = 56; val strhSz = 56; val strfSz = 40
    val strlList = 4 + 8 + strhSz + 8 + strfSz
    val hdrlList = 4 + 8 + avihSz + 8 + strlList
    val moviList = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val idx1Sz = frames.size * 16
    val riffSize = 4 + (8 + hdrlList) + (8 + moviList) + (8 + idx1Sz)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = { buf.put(s.getBytes(ascii)); () }
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlList); fourcc("hdrl")
    fourcc("avih"); buf.putInt(avihSz)
    buf.putInt(1000000 / fps)   // dwMicroSecPerFrame
    buf.putInt(frameSize * fps) // dwMaxBytesPerSec
    buf.putInt(0)               // dwPaddingGranularity
    buf.putInt(0x10)            // dwFlags = AVIF_HASINDEX
    buf.putInt(frames.size)     // dwTotalFrames
    buf.putInt(0)               // dwInitialFrames
    buf.putInt(1)               // dwStreams
    buf.putInt(frameSize)       // dwSuggestedBufferSize
    buf.putInt(w); buf.putInt(h)
    var k = 0; while (k < 4) { buf.putInt(0); k += 1 } // dwReserved[4]
    fourcc("LIST"); buf.putInt(strlList); fourcc("strl")
    fourcc("strh"); buf.putInt(strhSz)
    fourcc("vids"); fourcc(handler)
    buf.putInt(0)                     // dwFlags
    buf.putShort(0); buf.putShort(0)  // wPriority, wLanguage
    buf.putInt(0)                     // dwInitialFrames
    buf.putInt(1)                     // dwScale
    buf.putInt(fps)                   // dwRate (rate/scale = fps)
    buf.putInt(0)                     // dwStart
    buf.putInt(frames.size)           // dwLength (in frames)
    buf.putInt(frameSize)             // dwSuggestedBufferSize
    buf.putInt(-1)                    // dwQuality (driver default)
    buf.putInt(0)                     // dwSampleSize (0: one sample = one frame)
    buf.putShort(0); buf.putShort(0)  // rcFrame left, top
    buf.putShort(w.toShort); buf.putShort(h.toShort) // rcFrame right, bottom
    fourcc("strf"); buf.putInt(strfSz)
    buf.putInt(40)                    // biSize
    buf.putInt(w); buf.putInt(h)      // biWidth, biHeight (bottom-up)
    buf.putShort(1); buf.putShort(24) // biPlanes, biBitCount
    buf.putInt(compression)           // biCompression: BI_RGB or 'MJPG'
    buf.putInt(frameSize)             // biSizeImage
    buf.putInt(0); buf.putInt(0)      // biXPelsPerMeter, biYPelsPerMeter
    buf.putInt(0); buf.putInt(0)      // biClrUsed, biClrImportant
    fourcc("LIST"); buf.putInt(moviList)
    val moviStart = buf.position()
    fourcc("movi")
    val offsets = frames.map { f =>
      val off = buf.position() - moviStart
      fourcc(chunkTag); buf.putInt(f.length); buf.put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
      off
    }
    fourcc("idx1"); buf.putInt(idx1Sz)
    frames.indices.foreach { i =>
      fourcc(chunkTag)
      buf.putInt(0x10) // AVIIF_KEYFRAME
      buf.putInt(offsets(i))
      buf.putInt(frames(i).length)
    }
    buf.array()
  }

  /** Minimal BMP file wrap of a DIB frame (14-byte BITMAPFILEHEADER + the
    * same BITMAPINFOHEADER the AVI strf carries) — lets the JDK's own BMP
    * reader decode an AVI frame, which is how [[decodedVideoHistogram]]
    * cross-checks the from-scratch pixel unpack. */
  def bmpWrap(dib: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val buf = java.nio.ByteBuffer.allocate(54 + dib.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("BM".getBytes(ascii))
    buf.putInt(54 + dib.length)       // bfSize
    buf.putInt(0)                     // bfReserved
    buf.putInt(54)                    // bfOffBits
    buf.putInt(40)                    // biSize
    buf.putInt(w); buf.putInt(h)
    buf.putShort(1); buf.putShort(24)
    buf.putInt(0)                     // BI_RGB
    buf.putInt(dib.length)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    buf.put(dib)
    buf.array()
  }

  /** Deterministic uncompressed AVI per row: frame f, pixel i (row-major,
    * top-down) carries gray value ((id·31 + f·7 + i) mod 256) on all three
    * channels — same arithmetic family as [[encodeDemoPng]], extended by a
    * frame term, so every decoded per-frame histogram is exactly
    * re-derivable by any SQL engine and the full container round-trip is
    * oracle-checkable. Container bytes come from the from-scratch
    * [[aviContainer]] writer; the decode side re-verifies the pixel unpack
    * against the JDK's BMP decoder once per partition. */
  def encodeDemoAvi(df: DataFrame, idCol: String): Dataset[IdAvi] = {
    import df.sparkSession.implicits._
    val side = DemoAviSide
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val frames = (0 until DemoAviFrames).map { f =>
          val dib = new Array[Byte](side * side * 3) // stride = 3·side, 4-aligned for side=8
          var i = 0
          while (i < side * side) {
            val v = (((id * 31 + f * 7 + i) % 256 + 256) % 256).toInt
            val x = i % side
            val y = i / side
            val o = (side - 1 - y) * side * 3 + 3 * x // bottom-up rows
            dib(o) = v.toByte; dib(o + 1) = v.toByte; dib(o + 2) = v.toByte
            i += 1
          }
          dib
        }
        IdAvi(id, aviContainer(frames, side, side, fps = 10))
      }
    }
  }

  /** Decode-side per-frame luminance histogram over real AVI payloads via
    * the from-scratch RIFF walker: one (id, frameIdx, bin, n) row per frame
    * and bin, zero bins included so the output shape is fixed. The FIRST
    * frame of every partition is also decoded through the JDK's BMP reader
    * (via [[bmpWrap]]) and compared pixel-for-pixel with our DIB unpack —
    * the independent-decoder evidence, paid once per partition like the
    * WAV writer cross-check. Fail-loud on undecodable payloads. */
  def decodedVideoHistogram(media: Dataset[IdAvi]): Dataset[IdFrameBin] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      var jdkChecked = false
      rows.flatMap { r =>
        // ONE container walk per row: parse, validate frame geometry, THEN
        // cross-check and bin — so a truncated frame fails loud with the id
        // instead of an out-of-bounds read inside the cross-check loop
        val (w, h, frames) = MediaCodec.aviDibFrames(r.avi).getOrElse(
          throw new IllegalStateException(
            s"payload for id ${r.id} is not an uncompressed-DIB AVI"))
        val hists = MediaCodec.frameHistograms(w, h, frames).getOrElse(
          throw new IllegalStateException(s"truncated DIB frame in payload for id ${r.id}"))
        if (!jdkChecked) {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bmpWrap(frames.head, w, h)))
          if (img == null)
            throw new IllegalStateException("JDK BMP reader rejected an AVI DIB frame")
          val stride = ((w * 3 + 3) / 4) * 4
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val row = (h - 1 - y) * stride
              val ours = ((frames.head(row + 3 * x + 2) & 0xff) << 16) |
                ((frames.head(row + 3 * x + 1) & 0xff) << 8) |
                (frames.head(row + 3 * x) & 0xff)
              val jdk = img.getRGB(x, y) & 0xffffff
              if (ours != jdk)
                throw new IllegalStateException(
                  s"DIB unpack diverges from the JDK BMP decode at ($x,$y): ours=$ours jdk=$jdk")
              x += 1
            }
            y += 1
          }
          jdkChecked = true
        }
        hists.iterator.zipWithIndex.flatMap { case (bins, f) =>
          bins.iterator.zipWithIndex.map { case (n, b) => IdFrameBin(r.id, f, b, n) }
        }.toSeq
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
