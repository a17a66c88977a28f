package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal columns (north-star extension): image/audio/video as
  * opaque BINARY columns with typed metadata, processed in partition
  * batches.
  *
  * The Spark-side plumbing is real and tested — schema, partitioning,
  * batch shape (`mapPartitions` over a typed Dataset = the Scala
  * analogue of batch-UDF processing: one iterator per partition, so
  * per-batch setup like a decoder init happens once per partition, not
  * per row). IMAGE decode/resize/feature-extract are REAL
  * (`javax.imageio`, [[ImageCodec]] — PNG/JPEG/BMP/GIF dimensions,
  * pixel resampling, luminance histograms) and so is AUDIO
  * (`javax.sound.sampled`, [[AudioCodec]] — WAV/AIFF/AU format +
  * duration decode, PCM amplitude histograms, frame decimation);
  * only VIDEO, whose codec the JDK does not ship, uses
  * [[FakeCodec]]'s deterministic header scheme behind the same
  * dispatch seam.
  *
  * Scale: assets are heavy rows — partitioning is by (modality,
  * asset_id range) so one partition holds a bounded byte volume;
  * feature extraction emits small fixed-width vectors, so the
  * downstream (similarity search over [[Similarity]]) never reshuffles
  * bytes.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque bytes. */
  final case class MediaMeta(width: Int, height: Int, durationMs: Long, codec: String)
  final case class MediaAsset(assetId: Long, modality: String, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(assetId: Long, modality: String, feature: Array[Float])
  final case class Frame(assetId: Long, frameNo: Int, content: Array[Byte])

  /** Real image codec over `javax.imageio` (JDK-built-in readers: PNG,
    * JPEG, BMP, GIF, WBMP — zero added dependencies). Bytes are
    * dispatched here by content magic; non-image modalities (no video/
    * audio codec ships in the JDK) fall back to [[FakeCodec]]'s
    * deterministic header scheme, honestly marked. */
  object ImageCodec {
    ImageIO.setUseCache(false) // no temp-file cache on executor threads

    /** Container format by magic bytes — cheap dispatch without
      * touching ImageIO for non-image payloads. */
    def detectFormat(bytes: Array[Byte]): Option[String] = {
      def b(i: Int): Int = bytes(i) & 0xff
      if (bytes.length < 8) None
      else if (b(0) == 0x89 && b(1) == 0x50 && b(2) == 0x4e && b(3) == 0x47) Some("png")
      else if (b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) Some("jpeg")
      else if (b(0) == 'B' && b(1) == 'M') Some("bmp")
      else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') Some("gif")
      else None
    }

    def isImage(bytes: Array[Byte]): Boolean = detectFormat(bytes).isDefined

    private def read(bytes: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) throw new IllegalArgumentException("undecodable image bytes")
      img
    }

    /** Decode real dimensions from the container. Duration stays 0 —
      * still images have none. */
    def decodeMeta(bytes: Array[Byte]): MediaMeta = {
      val fmt = detectFormat(bytes).getOrElse("unknown")
      val img = read(bytes)
      MediaMeta(img.getWidth, img.getHeight, 0L, fmt)
    }

    /** Real pixel resample: scaled redraw at (w/factor, h/factor),
      * re-encoded as PNG (lossless, deterministic across JDKs for the
      * same pixel data). */
    def resize(bytes: Array[Byte], factor: Int): Array[Byte] = {
      val src = read(bytes)
      val (w, h) = (math.max(src.getWidth / factor, 1), math.max(src.getHeight / factor, 1))
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try g.drawImage(src, 0, 0, w, h, null) finally g.dispose()
      val out = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", out)
      out.toByteArray
    }

    /** 64-bit average hash (aHash) — the standard cheap perceptual
      * image fingerprint: decode, resample to 8×8 luminance, set bit j
      * when pixel j is brighter than the mean. Robust to re-encoding,
      * resizing and small pixel edits (they barely move 8×8 block
      * means), which is exactly what byte-level dedup
      * ([[binaryMeta]]'s md5) cannot see: the same photo saved twice
      * at different sizes has different bytes but the same aHash. */
    def aHash(bytes: Array[Byte]): Long = {
      val src = read(bytes)
      val dst = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try g.drawImage(src, 0, 0, 8, 8, null) finally g.dispose()
      val lum = new Array[Int](64)
      var j = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val rgb = dst.getRGB(x, y)
          lum(j) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          j += 1; x += 1
        }
        y += 1
      }
      val mean = lum.sum / 64
      var h = 0L
      var i = 0
      while (i < 64) { if (lum(i) > mean) h |= (1L << i); i += 1 }
      h
    }

    /** Normalized 32-bin LUMINANCE histogram over decoded pixels — the
      * pixel-space analogue of [[FakeCodec.features]]'s byte histogram,
      * same output contract (32 floats, sums to 1). */
    def features(bytes: Array[Byte]): Array[Float] = {
      val img = read(bytes)
      val hist = new Array[Float](32)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          hist(lum >> 3) += 1f
          x += 1
        }
        y += 1
      }
      val n = math.max(img.getWidth * img.getHeight, 1).toFloat
      hist.map(_ / n)
    }
  }

  /** Real audio codec over `javax.sound.sampled` (JDK-built-in
    * readers: WAV, AIFF/AIFC, AU — zero added dependencies). The
    * MediaMeta mapping for audio is (width=sample rate Hz,
    * height=channels, durationMs=frames/frameRate): the two spatial
    * fields carry the two integral format dimensions an audio asset
    * has. */
  object AudioCodec {

    /** Container format by magic bytes — cheap dispatch without
      * touching AudioSystem for non-audio payloads. */
    def detectFormat(bytes: Array[Byte]): Option[String] = {
      def tag(i: Int, s: String): Boolean =
        s.indices.forall(j => bytes(i + j) == s.charAt(j).toByte)
      if (bytes.length < 12) None
      else if (tag(0, "RIFF") && tag(8, "WAVE")) Some("wav")
      else if (tag(0, "FORM") && (tag(8, "AIFF") || tag(8, "AIFC"))) Some("aiff")
      else if (tag(0, ".snd")) Some("au")
      else None
    }

    def isAudio(bytes: Array[Byte]): Boolean = detectFormat(bytes).isDefined

    private def stream(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream =
      javax.sound.sampled.AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))

    /** Decode the real format header: sample rate, channels, duration
      * from the frame count. */
    def decodeMeta(bytes: Array[Byte]): MediaMeta = {
      val in = stream(bytes)
      try {
        val fmt = in.getFormat
        val durMs =
          if (fmt.getFrameRate > 0 && in.getFrameLength >= 0)
            (in.getFrameLength * 1000.0 / fmt.getFrameRate).toLong
          else 0L
        MediaMeta(fmt.getSampleRate.toInt, fmt.getChannels, durMs,
          detectFormat(bytes).getOrElse("audio"))
      } finally in.close()
    }

    /** Normalized 32-bin AMPLITUDE histogram over decoded PCM samples
      * (8- or 16-bit) — the audio analogue of [[ImageCodec.features]]'s
      * luminance histogram, same output contract (32 floats, sums
      * to 1). */
    def features(bytes: Array[Byte]): Array[Float] = {
      val in = stream(bytes)
      try {
        val fmt = in.getFormat
        val pcm = in.readAllBytes()
        val hist = new Array[Float](32)
        var n = 0
        if (fmt.getSampleSizeInBits <= 8) {
          var i = 0
          while (i < pcm.length) { hist((pcm(i) & 0xff) >> 3) += 1f; n += 1; i += 1 }
        } else {
          val big = fmt.isBigEndian
          var i = 0
          while (i + 1 < pcm.length) {
            val s =
              if (big) (pcm(i) << 8) | (pcm(i + 1) & 0xff)
              else (pcm(i + 1) << 8) | (pcm(i) & 0xff)
            hist(math.min(math.abs(s), 32767) >> 10) += 1f
            n += 1; i += 2
          }
        }
        hist.map(_ / math.max(n, 1).toFloat)
      } finally in.close()
    }

    /** 64-bit audio envelope hash — the audio analogue of
      * [[ImageCodec.aHash]]: decode PCM, split the sample sequence
      * into 65 equal buckets, take each bucket's mean ABSOLUTE
      * amplitude, set bit i when bucket i+1 is strictly louder than
      * bucket i. Means are compared by exact integer
      * cross-multiplication (sum·count vs sum·count — no division),
      * so the hash is bit-deterministic; sign-of-delta is invariant
      * under volume scaling and survives frame decimation (bucket
      * means barely move). An envelope hash fingerprints
      * amplitude-STRUCTURED audio (speech, music dynamics); for
      * constant-envelope tones adjacent buckets tie toward 0 bits —
      * still deterministic, just low-information. */
    def aHash(bytes: Array[Byte]): Long = {
      val in = stream(bytes)
      try {
        val fmt = in.getFormat
        val pcm = in.readAllBytes()
        val sums = new Array[Long](65)
        val cnts = new Array[Long](65)
        if (fmt.getSampleSizeInBits <= 8) {
          val n = pcm.length
          var i = 0
          while (i < n) {
            val b = math.min((i.toLong * 65 / math.max(n, 1)).toInt, 64)
            sums(b) += math.abs((pcm(i) & 0xff) - 128); cnts(b) += 1; i += 1
          }
        } else {
          val big = fmt.isBigEndian
          val n = pcm.length / 2
          var i = 0
          while (i < n) {
            val lo = pcm(2 * i + (if (big) 1 else 0)) & 0xff
            val hi = pcm(2 * i + (if (big) 0 else 1))
            val s = (hi << 8) | lo
            val b = math.min((i.toLong * 65 / math.max(n, 1)).toInt, 64)
            sums(b) += math.abs(s); cnts(b) += 1; i += 1
          }
        }
        var h = 0L
        var i = 0
        while (i < 64) {
          if (cnts(i) > 0 && cnts(i + 1) > 0 &&
              sums(i + 1) * cnts(i) > sums(i) * cnts(i + 1)) h |= (1L << i)
          i += 1
        }
        h
      } finally in.close()
    }

    /** Real frame decimation: keep every `factor`-th PCM frame and
      * re-encode as WAV at sampleRate/factor (the time axis is
      * preserved — the audio analogue of pixel resampling). */
    def resample(bytes: Array[Byte], factor: Int): Array[Byte] = {
      val in = stream(bytes)
      try {
        val fmt = in.getFormat
        val fs = fmt.getFrameSize
        val pcm = in.readAllBytes()
        val out = new ByteArrayOutputStream()
        var f = 0
        while (f * fs + fs <= pcm.length) {
          if (f % factor == 0) out.write(pcm, f * fs, fs)
          f += 1
        }
        val dec = out.toByteArray
        val decFmt = new javax.sound.sampled.AudioFormat(
          fmt.getEncoding, fmt.getSampleRate / factor, fmt.getSampleSizeInBits,
          fmt.getChannels, fmt.getFrameSize, fmt.getFrameRate / factor, fmt.isBigEndian)
        val encoded = new ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new ByteArrayInputStream(dec), decFmt, dec.length / fs),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, encoded)
        encoded.toByteArray
      } finally in.close()
    }
  }

  /** Real MP4/MOV CONTAINER parser — plain big-endian box structure
    * ([size:4][type:4], size==1 → 64-bit extended size): `moov/mvhd`
    * carries timescale + duration, `moov/trak/tkhd` the presentation
    * width/height as 16.16 fixed-point, and the `stbl` sample tables
    * locate every frame's bytes ([[extractSamples]]). Frame PIXEL
    * decode is real for MJPEG tracks ([[jpegFrames]] — each sample is
    * a standalone JPEG the JDK decodes); inter-frame codecs
    * (H.264/H.265/VP9) have no JVM decoder and stay behind
    * [[FakeCodec]]. ISO/IEC 14496-12 box layout, parsed defensively —
    * any structural surprise throws and the caller's containment falls
    * back per asset. */
  object VideoCodec {

    def isVideo(bytes: Array[Byte]): Boolean =
      bytes.length >= 12 &&
        bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p'

    private def u32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def u64(b: Array[Byte], i: Int): Long =
      (u32(b, i) << 32) | u32(b, i + 4)

    /** Walk the boxes in [from, to); invoke `f` with each (type,
      * payloadStart, payloadEnd). */
    private def walk(b: Array[Byte], from: Long, to: Long)(
        f: (String, Long, Long) => Unit): Unit = {
      var p = from
      while (p + 8 <= to) {
        val size0 = u32(b, p.toInt)
        val typ = new String(b, p.toInt + 4, 4, "ISO-8859-1")
        val (size, hdr) =
          if (size0 == 1 && p + 16 <= to) (u64(b, p.toInt + 8), 16L)
          else if (size0 == 0) (to - p, 8L) // box runs to end-of-enclosure
          else (size0, 8L)
        if (size < hdr || p + size > to)
          throw new IllegalArgumentException(s"mp4: malformed box $typ at $p")
        f(typ, p + hdr, p + size)
        p += size
      }
    }

    /** mvhd (version 0/1): timescale + duration → durationMs; tkhd of
      * the first track with a nonzero presentation size → width/height
      * (16.16 fixed-point, integer part). */
    def decodeMeta(bytes: Array[Byte]): MediaMeta = {
      var timescale = 0L; var duration = 0L
      var width = 0; var height = 0
      walk(bytes, 0L, bytes.length.toLong) {
        case ("moov", s, e) =>
          walk(bytes, s, e) {
            case ("mvhd", ms, _) =>
              val v = bytes(ms.toInt) & 0xff
              if (v == 1) { timescale = u32(bytes, ms.toInt + 20); duration = u64(bytes, ms.toInt + 24) }
              else { timescale = u32(bytes, ms.toInt + 12); duration = u32(bytes, ms.toInt + 16) }
            case ("trak", ts, te) =>
              walk(bytes, ts, te) {
                case ("tkhd", ks, ke) if width == 0 =>
                  // width/height are the LAST 8 payload bytes (after
                  // the version-dependent times and the 36-byte matrix)
                  val w = (u32(bytes, ke.toInt - 8) >> 16).toInt
                  val h = (u32(bytes, ke.toInt - 4) >> 16).toInt
                  if (w > 0 && h > 0) { width = w; height = h }
                  // silence the unused-variable warning on ks
                  val _ = ks
                case _ =>
              }
            case _ =>
          }
        case _ =>
      }
      if (timescale <= 0) throw new IllegalArgumentException("mp4: no mvhd timescale")
      MediaMeta(width, height, duration * 1000 / timescale, "mp4")
    }

    /** Sample-table walk (`moov/trak/mdia/minf/stbl`): the codec
      * fourcc from `stsd` and every sample's byte payload located via
      * `stsz` (sizes) × `stsc` (samples per chunk) × `stco`/`co64`
      * (chunk offsets). This is the REAL frame-extraction machinery —
      * for MJPEG tracks each sample is one complete JPEG image. */
    def extractSamples(bytes: Array[Byte]): (String, Seq[Array[Byte]]) = {
      var fourcc: String = null
      var sizes: Array[Long] = null
      var chunkOffsets: Array[Long] = null
      var stscRuns: Array[(Long, Long)] = null // (firstChunk, samplesPerChunk)
      def parseStbl(s: Long, e: Long): Unit = walk(bytes, s, e) {
        case ("stsd", ps, pe) if fourcc == null && pe - ps >= 16 =>
          fourcc = new String(bytes, ps.toInt + 12, 4, "ISO-8859-1")
        case ("stsz", ps, _) if sizes == null =>
          val fixed = u32(bytes, ps.toInt + 4)
          val n = u32(bytes, ps.toInt + 8).toInt
          sizes =
            if (fixed != 0) Array.fill(n)(fixed)
            else Array.tabulate(n)(i => u32(bytes, ps.toInt + 12 + 4 * i))
        case ("stco", ps, _) if chunkOffsets == null =>
          val n = u32(bytes, ps.toInt + 4).toInt
          chunkOffsets = Array.tabulate(n)(i => u32(bytes, ps.toInt + 8 + 4 * i))
        case ("co64", ps, _) if chunkOffsets == null =>
          val n = u32(bytes, ps.toInt + 4).toInt
          chunkOffsets = Array.tabulate(n)(i => u64(bytes, ps.toInt + 8 + 8 * i))
        case ("stsc", ps, _) if stscRuns == null =>
          val n = u32(bytes, ps.toInt + 4).toInt
          stscRuns = Array.tabulate(n)(i =>
            (u32(bytes, ps.toInt + 8 + 12 * i), u32(bytes, ps.toInt + 12 + 12 * i)))
        case _ =>
      }
      walk(bytes, 0L, bytes.length.toLong) {
        case ("moov", s, e) => walk(bytes, s, e) {
          case ("trak", ts, te) if sizes == null => walk(bytes, ts, te) {
            case ("mdia", ms, me) => walk(bytes, ms, me) {
              case ("minf", ns, ne) => walk(bytes, ns, ne) {
                case ("stbl", ss, se) => parseStbl(ss, se)
                case _ => }
              case _ => }
            case _ => }
          case _ => }
        case _ =>
      }
      if (fourcc == null || sizes == null || chunkOffsets == null || stscRuns == null)
        throw new IllegalArgumentException("mp4: incomplete sample table")
      // chunk c (1-based) uses the stsc run with the largest firstChunk <= c
      def samplesPerChunk(c: Long): Long =
        stscRuns.filter(_._1 <= c).maxByOption(_._1).map(_._2).getOrElse(0L)
      val out = Seq.newBuilder[Array[Byte]]
      var sample = 0
      var ci = 0
      while (ci < chunkOffsets.length && sample < sizes.length) {
        var off = chunkOffsets(ci)
        var k = 0L
        val spc = samplesPerChunk(ci + 1L)
        while (k < spc && sample < sizes.length) {
          val sz = sizes(sample)
          if (off < 0 || off + sz > bytes.length)
            throw new IllegalArgumentException(s"mp4: sample $sample out of range")
          out += java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
          off += sz; sample += 1; k += 1
        }
        ci += 1
      }
      (fourcc, out.result())
    }

    private val jpegFourccs = Set("jpeg", "JPEG", "mjpa", "mjpb")

    /** REAL pixel-frame decode for the one video codec the JVM can
      * decode without new dependencies: MJPEG-in-MP4, where every
      * sample is a standalone JPEG ([[ImageCodec]]-decodable). Any
      * other codec fourcc throws — callers contain per asset and fall
      * back to the header scheme, so the fake path now covers ONLY
      * codecs the JVM genuinely cannot decode. */
    def jpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
      val (fourcc, samples) = extractSamples(bytes)
      if (!jpegFourccs.contains(fourcc))
        throw new IllegalArgumentException(s"mp4: no JVM decoder for codec '$fourcc'")
      samples.foreach { s =>
        if (s.length < 2 || (s(0) & 0xff) != 0xff || (s(1) & 0xff) != 0xd8)
          throw new IllegalArgumentException("mp4: jpeg sample without SOI marker")
      }
      samples
    }
  }

  /** Deterministic header codec for synthetic fixtures and for the
    * paths no JDK codec can serve: inter-frame video codecs
    * (H.264/H.265/VP9 — container metadata and MJPEG frames are real
    * via [[VideoCodec]]) and unrecognized byte payloads. Real images,
    * real audio, and MJPEG video never reach this path — the real
    * codecs claim them by magic bytes in
    * [[decodeAll]]/[[extractFeatures]]/[[resizeAll]]/[[sampleFrames]]. */
  object FakeCodec {
    /** "Decode" = parse fake 8-byte header: [w:2][h:2][durMs:4]. */
    def decodeMeta(bytes: Array[Byte], codec: String): MediaMeta = {
      def u16(i: Int): Int =
        if (bytes.length < i + 2) 0 else ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
      def u32(i: Int): Long =
        if (bytes.length < i + 4) 0L else (u16(i).toLong << 16) | u16(i + 2)
      MediaMeta(u16(0), u16(2), u32(4), codec)
    }

    /** "Resize" = deterministic byte downsample keeping every k-th
      * byte after the header (real impl: pixel resample). */
    def resize(bytes: Array[Byte], factor: Int): Array[Byte] =
      bytes.take(8) ++ bytes.drop(8).grouped(factor).map(_.head).toArray

    /** Feature extraction = normalized 32-bin byte histogram. (This
      * one is a real, if crude, content feature — not a stub.) */
    def features(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](32)
      var i = 8
      while (i < bytes.length) { hist((bytes(i) & 0xff) >> 3) += 1f; i += 1 }
      val n = math.max(bytes.length - 8, 1).toFloat
      hist.map(_ / n)
    }

    /** Frame sampling = fixed-size byte blocks at a stride (real impl:
      * keyframe extraction). */
    def sampleFrames(bytes: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
      bytes.drop(8).grouped(frameSize * stride).map(_.take(frameSize)).toSeq
  }

  /** Batch-shaped decode: one codec "session" per partition iterator —
    * the exact batch contract a heavyweight decoder needs. Real image
    * bytes (PNG/JPEG/BMP/GIF magic) decode through [[ImageCodec]];
    * everything else through the header scheme. */
  def decodeAll(assets: Dataset[MediaAsset]): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition (per-batch) setup: ImageIO readers are resolved
      // once per JVM; heavier codecs would init here
      it.map { a =>
        // per-row containment: a truncated/corrupt image (or a fake
        // header whose first bytes collide with a magic, e.g. width
        // 0x424D == 'BM') must degrade to the header codec, not abort
        // the job — one bad asset in 100 TB is a certainty
        val meta = attempt(a, _ => ImageCodec.decodeMeta(a.content),
          _ => AudioCodec.decodeMeta(a.content),
          () => FakeCodec.decodeMeta(a.content, a.meta.codec),
          realVideo = Some((x: MediaAsset) => VideoCodec.decodeMeta(x.content)))
        a.copy(meta = meta)
      }
    }
  }

  /** Try the real codec the magic bytes claim (image → [[ImageCodec]],
    * audio → [[AudioCodec]], video container → [[VideoCodec]] where the
    * caller supplies a metadata-only path); contain any decode failure
    * and fall back to the deterministic header codec. */
  private def attempt[T](a: MediaAsset, realImage: MediaAsset => T,
      realAudio: MediaAsset => T, fake: () => T,
      realVideo: Option[MediaAsset => T] = None): T =
    if (ImageCodec.isImage(a.content))
      try realImage(a) catch { case _: Exception => fake() }
    else if (AudioCodec.isAudio(a.content))
      try realAudio(a) catch { case _: Exception => fake() }
    else if (realVideo.isDefined && VideoCodec.isVideo(a.content))
      try realVideo.get(a) catch { case _: Exception => fake() }
    else fake()

  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      // MJPEG video gets REAL pixel features (first decoded frame);
      // other video codecs throw inside jpegFrames and contain to the
      // byte-histogram fallback
      val f = attempt(a, x => ImageCodec.features(x.content),
        x => AudioCodec.features(x.content),
        () => FakeCodec.features(a.content),
        realVideo = Some((x: MediaAsset) =>
          ImageCodec.features(VideoCodec.jpegFrames(x.content).head)))
      MediaFeatures(a.assetId, a.modality, f)
    })
  }

  def resizeAll(assets: Dataset[MediaAsset], factor: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val c = attempt(a, x => ImageCodec.resize(x.content, factor),
        x => AudioCodec.resample(x.content, factor),
        () => FakeCodec.resize(a.content, factor))
      a.copy(content = c)
    })
  }

  /** Frame sampling fans out one video row to many frame rows —
    * flatMap inside the partition iterator keeps it pipelined.
    *
    * MJPEG-in-MP4 assets yield REAL frames: every `stride`-th sample
    * from the container's sample table, each a standalone decodable
    * JPEG (`frameSize` does not apply — a real frame carries its own
    * size). Codecs the JVM cannot decode contain per asset to the
    * fixed-size byte-block scheme. */
  def sampleFrames(assets: Dataset[MediaAsset], frameSize: Int, stride: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.modality == "video").mapPartitions(_.flatMap { a =>
      val frames =
        if (VideoCodec.isVideo(a.content))
          try VideoCodec.jpegFrames(a.content).grouped(stride).map(_.head).toSeq
          catch { case _: Exception => FakeCodec.sampleFrames(a.content, frameSize, stride) }
        else FakeCodec.sampleFrames(a.content, frameSize, stride)
      frames.zipWithIndex.map { case (f, i) => Frame(a.assetId, i, f) }
    })
  }

  /** Persist assets partitioned by modality (heavy-row layout rule). */
  def writeAssets(assets: Dataset[MediaAsset], path: String): Unit =
    assets.write.mode("overwrite").partitionBy("modality").parquet(path)

  /** Perceptual image near-dup pairs — the multimodal twin of the
    * text MinHash/SimHash stack: each decodable image collapses to
    * its 64-bit [[ImageCodec.aHash]], the hash splits into 4×16-bit
    * BANDS, candidates come from an equi self-join per band
    * (pigeonhole: hamming ≤ 3 ⇒ some band is bit-identical, the
    * [[Dedup.simhashNearDup]] guarantee), and only candidates pay the
    * exact popcount verify. Undecodable bytes are skipped — a
    * perceptual hash of garbage is noise, and exact dedup
    * ([[binaryMeta]] md5) already covers byte-identical blobs.
    *
    * Scale: one decode pass (heavy, embarrassingly parallel) reduces
    * every image to 16 bytes of hash state; everything after is the
    * LSH bucket-join shape — never image×image, and the verify is
    * integer popcount on (id, id, hash) rows, no pixel data in any
    * shuffle. */
  def imageNearDups(assets: Dataset[MediaAsset], maxHamming: Int = 3): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    hammingNearDups(assets
      .mapPartitions(_.flatMap { a =>
        if (!ImageCodec.isImage(a.content)) None
        else try Some((a.assetId, ImageCodec.aHash(a.content)))
        catch { case _: Exception => None }
      })
      .toDF("asset_id", "h"), maxHamming)
  }

  /** Perceptual AUDIO near-dup pairs — the same banded-hamming
    * machinery over [[AudioCodec.aHash]] envelope fingerprints:
    * re-encoded, volume-scaled or decimated copies of a recording
    * collide; undecodable bytes are skipped exactly like the image
    * path. */
  def audioNearDups(assets: Dataset[MediaAsset], maxHamming: Int = 3): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    hammingNearDups(assets
      .mapPartitions(_.flatMap { a =>
        if (!AudioCodec.isAudio(a.content)) None
        else try Some((a.assetId, AudioCodec.aHash(a.content)))
        catch { case _: Exception => None }
      })
      .toDF("asset_id", "h"), maxHamming)
  }

  /** Perceptual VIDEO near-dup pairs — the trio-completing twin of
    * [[imageNearDups]]/[[audioNearDups]]: each MJPEG video collapses
    * to the [[ImageCodec.aHash]] of its first DECODED frame (via the
    * real [[VideoCodec.jpegFrames]] sample-table walk), so re-muxed,
    * frame-resampled, or re-encoded copies of the same footage collide
    * on their shared opening frame. Containers the JVM cannot
    * pixel-decode are skipped exactly like undecodable images —
    * byte-identical blobs are already [[binaryMeta]] md5 territory. */
  def videoNearDups(assets: Dataset[MediaAsset], maxHamming: Int = 3): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    hammingNearDups(assets
      .mapPartitions(_.flatMap { a =>
        if (!VideoCodec.isVideo(a.content)) None
        else try {
          val frames = VideoCodec.jpegFrames(a.content)
          if (frames.isEmpty) None
          else Some((a.assetId, ImageCodec.aHash(frames.head)))
        } catch { case _: Exception => None }
      })
      .toDF("asset_id", "h"), maxHamming)
  }

  /** Banded-hamming near-dup join over any (asset_id, h) 64-bit
    * fingerprint frame: 4×16-bit bands, equi self-join per band
    * (pigeonhole: hamming ≤ 3 ⇒ some band bit-identical), exact
    * popcount verify on candidates only. For `maxHamming` > 3 the
    * candidate stage is best-effort (a pair is found iff SOME band is
    * clean — the standard LSH recall trade); exactness holds at ≤ 3. */
  private def hammingNearDups(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val banded = hashes.select(col("asset_id"), col("h"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band_no"),
            expr(s"(h >> ${b * 16}) & 65535").as("band_val"))): _*)).as("b"))
      .select(col("asset_id"), col("h"), col("b.band_no"), col("b.band_val"))
    val a = banded.select(col("band_no"), col("band_val"),
      col("asset_id").as("asset_a"), col("h").as("h_a"))
    val b = banded.select(col("band_no"), col("band_val"),
      col("asset_id").as("asset_b"), col("h").as("h_b"))
    a.join(b, Seq("band_no", "band_val"))
      .filter(col("asset_a") < col("asset_b"))
      .select(col("asset_a"), col("asset_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("asset_a"), col("asset_b"))
  }

  /** Oracle-checked BINARY-column query over the testdata: documents'
    * text treated as opaque bytes — octet length, first byte, and
    * fingerprint survive the string→binary→metadata round trip
    * identically in both engines. */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"),
        md5(col("text").cast("binary")).as("content_md5"))
      .orderBy(col("doc_id"))

  def binaryMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
      |  md5(text) AS content_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin
}
