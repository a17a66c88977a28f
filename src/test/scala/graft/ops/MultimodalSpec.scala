package graft.ops

import graft.SparkTestBase
import graft.ops.Multimodal._
import org.apache.spark.sql.functions.col

/** Multimodal plumbing tests: schema, partition layout, batch shape,
  * fan-out, and determinism of the fake codec (so a future real codec
  * swap only has to preserve signatures).
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def header(w: Int, h: Int, durMs: Long): Array[Byte] = Array[Byte](
    ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
    ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
    ((durMs >> 24) & 0xff).toByte, ((durMs >> 16) & 0xff).toByte,
    ((durMs >> 8) & 0xff).toByte, (durMs & 0xff).toByte)

  private def asset(id: Long, modality: String, w: Int, h: Int, dur: Long, payload: Int): MediaAsset =
    MediaAsset(id, modality, header(w, h, dur) ++ Array.tabulate(payload)(i => ((i * 37 + id) % 256).toByte),
      MediaMeta(0, 0, 0L, if (modality == "image") "fakepng" else "fakemp4"))

  private val assets = Seq(
    asset(1, "image", 640, 480, 0L, 1000),
    asset(2, "image", 1920, 1080, 0L, 2000),
    asset(3, "video", 1280, 720, 90000L, 4000),
    asset(4, "audio", 0, 0, 30000L, 500))

  test("decode fills typed metadata from bytes") {
    val out = decodeAll(assets.toDS()).collect().sortBy(_.assetId)
    assert(out(0).meta == MediaMeta(640, 480, 0L, "fakepng"))
    assert(out(2).meta == MediaMeta(1280, 720, 90000L, "fakemp4"))
  }

  private def realImage(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7) % 256 << 16) | ((y * 11) % 256 << 8) | ((x + y) % 256))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("REAL codec: png/bmp bytes decode to true dimensions through the batch path") {
    val real = Seq(
      MediaAsset(10, "image", realImage(64, 48, "png"), MediaMeta(0, 0, 0, "?")),
      MediaAsset(11, "image", realImage(31, 17, "bmp"), MediaMeta(0, 0, 0, "?")))
    val out = decodeAll(real.toDS()).collect().sortBy(_.assetId)
    assert(out(0).meta == MediaMeta(64, 48, 0L, "png"))
    assert(out(1).meta == MediaMeta(31, 17, 0L, "bmp"))
  }

  test("REAL codec: corrupt magic-matching bytes fall back to the header codec, not a crash") {
    // PNG magic + garbage: ImageIO fails to decode; the batch path must
    // contain the failure per-row and degrade to the header scheme
    val corrupt = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47) ++ Array.fill[Byte](64)(7)
    val assets = Seq(MediaAsset(20, "image", corrupt, MediaMeta(0, 0, 0, "c")))
    val out = decodeAll(assets.toDS()).collect()(0)
    // header parse of the garbage bytes — deterministic, job survives
    assert(out.meta.codec == "c" && out.assetId == 20)
    assert(extractFeatures(assets.toDS()).collect()(0).feature.length == 32)
  }

  test("REAL codec: resize resamples pixels (decoded dims shrink by factor)") {
    val real = Seq(MediaAsset(12, "image", realImage(64, 48, "png"), MediaMeta(0, 0, 0, "?")))
    val resized = resizeAll(real.toDS(), 4).collect()(0)
    val meta = Multimodal.ImageCodec.decodeMeta(resized.content)
    assert(meta.width == 16 && meta.height == 12)
  }

  test("REAL codec: luminance histogram is normalized and content-sensitive") {
    val a = Multimodal.ImageCodec.features(realImage(40, 40, "png"))
    assert(a.length == 32 && math.abs(a.sum - 1.0f) < 1e-3)
    // a uniformly black image concentrates all mass in bin 0
    val black = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val b = Multimodal.ImageCodec.features(black)
    assert(b(0) == 1.0f && a(0) < 1.0f)
  }

  /** A real 16-bit mono PCM WAV: `freq` Hz sine at 8 kHz sample rate,
    * `ms` milliseconds. */
  private def realWav(freq: Double, ms: Int): Array[Byte] = {
    val rate = 8000f
    val n = (rate * ms / 1000).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * 12000).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("REAL audio codec: wav bytes decode format, channels, duration through the batch path") {
    val wav = realWav(440.0, 500)
    assert(AudioCodec.detectFormat(wav).contains("wav"))
    val out = decodeAll(Seq(
        MediaAsset(10, "audio", wav, MediaMeta(0, 0, 0L, "pcm")))
      .toDS()).collect()(0)
    assert(out.meta.width == 8000, "width carries the sample rate")
    assert(out.meta.height == 1, "height carries the channel count")
    assert(math.abs(out.meta.durationMs - 500L) <= 1, s"duration ${out.meta.durationMs}")
    assert(out.meta.codec == "wav")
  }

  test("REAL audio codec: amplitude histogram is normalized and content-sensitive") {
    val loud = AudioCodec.features(realWav(440.0, 200))
    val silence = AudioCodec.features {
      val rate = 8000f
      val n = 1600
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(new Array[Byte](n * 2)), fmt, n),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    assert(loud.length == 32 && silence.length == 32)
    assert(math.abs(loud.sum - 1f) < 1e-3 && math.abs(silence.sum - 1f) < 1e-3)
    assert(silence(0) == 1f, "silence concentrates in the zero-amplitude bin")
    assert(loud(0) < 0.5f, "a 12000-amplitude sine must spread across bins")
  }

  test("REAL audio codec: resample decimates frames and halves the decoded duration's rate") {
    val wav = realWav(440.0, 400)
    val half = AudioCodec.resample(wav, 2)
    val meta = AudioCodec.decodeMeta(half)
    assert(meta.width == 4000, "sample rate halves")
    assert(math.abs(meta.durationMs - 400L) <= 2,
      s"time axis preserved, got ${meta.durationMs} ms")
    // corrupt audio-magic bytes degrade to the header codec, not a crash
    val corrupt = "RIFF????WAVEgarbage-not-a-real-wave-chunk".getBytes ++ Array.fill(64)(7.toByte)
    assert(AudioCodec.isAudio(corrupt))
    val out = decodeAll(Seq(
        MediaAsset(11, "audio", corrupt, MediaMeta(0, 0, 0L, "pcm")))
      .toDS()).collect()(0)
    assert(out.meta.codec == "pcm", "fallback keeps the caller-declared codec")
  }

  /** Minimal valid MP4: ftyp + moov{mvhd v0, trak{tkhd v0}} with the
    * exact ISO/IEC 14496-12 box layout. */
  private def realMp4(w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] = {
    def u32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload
    val ftyp = box("ftyp", "isom".getBytes ++ u32(512) ++ "isomiso2".getBytes)
    // mvhd v0: ver/flags, creation, modification, timescale, duration,
    // rate, volume+reserved, reserved, matrix, predefined, nextTrackId
    val mvhd = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++
      u32(timescale.toLong) ++ u32(duration.toLong) ++ u32(0x00010000L) ++
      u32(0x01000000L) ++ new Array[Byte](8) ++ new Array[Byte](36) ++
      new Array[Byte](24) ++ u32(2))
    // tkhd v0: ver/flags, creation, modification, trackId, reserved,
    // duration, reserved(8), layer/alt/volume/reserved(8), matrix,
    // width/height as 16.16
    val tkhd = box("tkhd", u32(7) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++
      u32(duration.toLong) ++ new Array[Byte](8) ++ new Array[Byte](8) ++
      new Array[Byte](36) ++ u32(w.toLong << 16) ++ u32(h.toLong << 16))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  test("REAL video container parser: mp4 box walk yields true dims and duration") {
    val mp4 = realMp4(w = 640, h = 360, timescale = 600, duration = 3000)
    assert(VideoCodec.isVideo(mp4))
    val out = decodeAll(Seq(
        MediaAsset(20, "video", mp4, MediaMeta(0, 0, 0L, "h264")))
      .toDS()).collect()(0)
    assert(out.meta.width == 640 && out.meta.height == 360)
    assert(out.meta.durationMs == 5000L, s"3000/600 s, got ${out.meta.durationMs}")
    assert(out.meta.codec == "mp4")
    // truncated/garbage moov degrades to the header codec per asset
    val corrupt = mp4.take(20) ++ Array.fill(32)(0x41.toByte)
    val bad = decodeAll(Seq(
        MediaAsset(21, "video", corrupt, MediaMeta(0, 0, 0L, "h264")))
      .toDS()).collect()(0)
    assert(bad.meta.codec == "h264", "fallback keeps the caller-declared codec")
  }

  test("feature extraction: fixed width, normalized, deterministic") {
    val f = extractFeatures(assets.toDS()).collect().sortBy(_.assetId)
    assert(f.forall(_.feature.length == 32))
    f.foreach(x => assert(math.abs(x.feature.sum - 1.0f) < 1e-3))
    val f2 = extractFeatures(assets.toDS()).collect().sortBy(_.assetId)
    assert(f.zip(f2).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("resize shrinks payload, preserves header") {
    val r = resizeAll(assets.toDS(), 4).collect().sortBy(_.assetId)
    assert(r(0).content.length == 8 + 250)
    assert(r(0).content.take(8).sameElements(assets(0).content.take(8)))
  }

  test("frame sampling fans out video only, ordered frames") {
    val frames = sampleFrames(assets.toDS(), frameSize = 100, stride = 4).collect()
    assert(frames.forall(_.assetId == 3))
    assert(frames.map(_.frameNo).sorted.sameElements(frames.map(_.frameNo)))
    assert(frames.head.content.length == 100)
    assert(frames.length == 10) // 4000 bytes / (100*4)
  }

  test("write partitions by modality; binary survives parquet round trip") {
    val path = tmpDir("assets")
    writeAssets(assets.toDS(), path)
    assert(new java.io.File(s"$path/modality=image").exists())
    assert(new java.io.File(s"$path/modality=video").exists())
    val back = spark.read.parquet(path)
    assert(back.count() == 4)
    val img1 = back.filter(col("assetId") === 1).select("content").collect()(0).getAs[Array[Byte]](0)
    assert(img1.sameElements(assets(0).content))
  }

  // ---------------- perceptual hash near-dup ----------------

  /** A structured gradient image with an optional small perturbation
    * — near-dup variants differ in a handful of pixels. */
  private def gradientImage(w: Int, h: Int, perturb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / w + y * 255 / h) / 2
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    for (i <- 0 until perturb) img.setRGB(i % w, (i * 13) % h, 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("aHash is deterministic, resize-robust, and separates distinct content") {
    val base = gradientImage(64, 64, 0)
    val h1 = Multimodal.ImageCodec.aHash(base)
    assert(h1 == Multimodal.ImageCodec.aHash(gradientImage(64, 64, 0)))
    // the same content re-encoded at half size hashes nearby
    val resized = Multimodal.ImageCodec.resize(base, 2)
    val h2 = Multimodal.ImageCodec.aHash(resized)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 3,
      s"resize moved the hash ${java.lang.Long.bitCount(h1 ^ h2)} bits")
    // inverted content is far away
    val inv = {
      val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = 255 - (x * 255 / 64 + y * 255 / 64) / 2
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    assert(java.lang.Long.bitCount(h1 ^ Multimodal.ImageCodec.aHash(inv)) > 20)
  }

  /** Amplitude-modulated WAV: 440 Hz carrier, per-millisecond envelope
    * from `env` — the amplitude STRUCTURE the audio hash fingerprints. */
  private def amWav(ms: Int, env: Int => Double): Array[Byte] = {
    val rate = 8000f
    val n = (rate * ms / 1000).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val t = (i * 1000.0 / rate).toInt
      val s = (math.sin(2 * math.Pi * 440.0 * i / rate) * 12000 * env(t)).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audio aHash: volume-invariant, decimation-robust, envelope-sensitive") {
    // carrier-phase sampling adds a few % of noise per ~6 ms bucket, so
    // near-tie delta bits can flip between re-quantized variants — the
    // thresholds below allow that noise band while still separating
    // envelopes (the near-dup join's contract is hamming distance, not
    // bit-exactness)
    val ramp = amWav(400, t => t / 400.0)
    val h = Multimodal.AudioCodec.aHash(ramp)
    // rising envelope: the vast majority of delta bits point up
    assert(java.lang.Long.bitCount(h) >= 44, f"rising ramp too flat: $h%016x")
    // re-quantized volume scaling flips only near-tie bits
    val quiet = amWav(400, t => t / 400.0 * 0.25)
    assert(java.lang.Long.bitCount(h ^ Multimodal.AudioCodec.aHash(quiet)) <= 10)
    // frame decimation preserves the envelope buckets
    val deci = Multimodal.AudioCodec.resample(ramp, 2)
    assert(java.lang.Long.bitCount(h ^ Multimodal.AudioCodec.aHash(deci)) <= 10)
    // the reversed envelope is far
    val fall = amWav(400, t => 1.0 - t / 400.0)
    assert(java.lang.Long.bitCount(h ^ Multimodal.AudioCodec.aHash(fall)) > 25)
  }

  test("audioNearDups pairs decimated/volume-scaled copies, skips distinct envelopes") {
    val ramp = amWav(400, t => t / 400.0)
    val assets = Seq(
      MediaAsset(1, "audio", ramp, MediaMeta(0, 0, 0, "?")),
      MediaAsset(2, "audio", Multimodal.AudioCodec.resample(ramp, 2), MediaMeta(0, 0, 0, "?")),
      MediaAsset(3, "audio", amWav(400, t => t / 400.0 * 0.5), MediaMeta(0, 0, 0, "?")),
      MediaAsset(4, "audio", amWav(400, t => 1.0 - t / 400.0), MediaMeta(0, 0, 0, "?")),
      MediaAsset(5, "audio", Array[Byte]('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E'),
        MediaMeta(0, 0, 0, "?")))
    // threshold sized to the re-quantization noise band (see aHash test)
    val pairs = audioNearDups(assets.toDS(), maxHamming = 10).collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"))).toSet
    assert(pairs.contains((1L, 2L)), s"decimated copy not found: $pairs")
    assert(pairs.contains((1L, 3L)), s"volume-scaled copy not found: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"reversed envelope matched: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), s"corrupt wav leaked: $pairs")
  }

  test("imageNearDups finds perturbed/rescaled variants, not distinct images or junk") {
    val base = gradientImage(64, 64, 0)
    val variants = Seq(
      MediaAsset(1, "image", base, MediaMeta(0, 0, 0, "?")),
      MediaAsset(2, "image", gradientImage(64, 64, 4), MediaMeta(0, 0, 0, "?")),
      MediaAsset(3, "image", Multimodal.ImageCodec.resize(base, 2), MediaMeta(0, 0, 0, "?")),
      // different real content: vertical bars
      MediaAsset(4, "image", {
        val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 64; x <- 0 until 64)
          img.setRGB(x, y, if ((x / 8) % 2 == 0) 0xffffff else 0)
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        out.toByteArray
      }, MediaMeta(0, 0, 0, "?")),
      // undecodable bytes must be skipped, not crash the join
      MediaAsset(5, "image", Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2, 3),
        MediaMeta(0, 0, 0, "?")))
    val pairs = imageNearDups(variants.toDS()).collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"))).toSet
    assert(pairs.contains((1L, 2L)), s"perturbed copy not found: $pairs")
    assert(pairs.contains((1L, 3L)), s"rescaled copy not found: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"distinct image matched: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      s"undecodable bytes leaked into the join: $pairs")
  }

  /** MJPEG-in-MP4: ftyp + mdat carrying whole JPEG samples + moov with
    * the complete stbl sample table (stsd/stsz/stsc/stco) locating
    * them — the layout QuickTime MJPEG files actually use. */
  private def mjpegMp4(jpegs: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    def u32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload
    val ftyp = box("ftyp", "isom".getBytes ++ u32(512) ++ "isomiso2".getBytes)
    val mdatPayloadOff = ftyp.length + 8L
    val mdat = box("mdat", jpegs.flatten.toArray)
    val mvhd = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++
      u32(600L) ++ u32(1800L) ++ u32(0x00010000L) ++ u32(0x01000000L) ++
      new Array[Byte](8) ++ new Array[Byte](36) ++ new Array[Byte](24) ++ u32(2))
    val tkhd = box("tkhd", u32(7) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++
      u32(1800L) ++ new Array[Byte](8) ++ new Array[Byte](8) ++
      new Array[Byte](36) ++ u32(w.toLong << 16) ++ u32(h.toLong << 16))
    // stsd: 1 entry of 16 bytes — size, fourcc 'jpeg', reserved(6)+dref(2)
    val stsd = box("stsd", u32(0) ++ u32(1) ++
      (u32(16) ++ "jpeg".getBytes("ISO-8859-1") ++ new Array[Byte](8)))
    val stsz = box("stsz", u32(0) ++ u32(0) ++ u32(jpegs.size.toLong) ++
      jpegs.flatMap(j => u32(j.length.toLong)).toArray)
    val stsc = box("stsc", u32(0) ++ u32(1) ++
      (u32(1) ++ u32(jpegs.size.toLong) ++ u32(1)))
    val stco = box("stco", u32(0) ++ u32(1) ++ u32(mdatPayloadOff))
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco)
    val trak = box("trak", tkhd ++ box("mdia", box("minf", stbl)))
    ftyp ++ mdat ++ box("moov", mvhd ++ trak)
  }

  test("REAL video frames: mjpeg sample table yields byte-exact, pixel-decodable JPEGs") {
    val jpegs = Seq(realImage(32, 24, "jpg"), realImage(32, 24, "jpg").map(b => b),
      realImage(48, 36, "jpg"))
    val mp4 = mjpegMp4(jpegs, 32, 24)
    assert(VideoCodec.isVideo(mp4))

    // container metadata still parses (mvhd/tkhd path untouched)
    val meta = VideoCodec.decodeMeta(mp4)
    assert(meta.width == 32 && meta.height == 24 && meta.durationMs == 3000L)

    // every sample extracted byte-exactly, and each really decodes to
    // pixels through the JDK image codec
    val frames = VideoCodec.jpegFrames(mp4)
    assert(frames.size == 3)
    frames.zip(jpegs).foreach { case (f, j) => assert(f.sameElements(j)) }
    assert(ImageCodec.decodeMeta(frames(2)) == MediaMeta(48, 36, 0L, "jpeg"))

    // a non-MJPEG fourcc refuses pixel decode instead of faking it
    val avc1 = mjpegMp4(jpegs, 32, 24)
    val idx = avc1.indexOfSlice("jpeg".getBytes("ISO-8859-1"),
      avc1.indexOfSlice("stsd".getBytes("ISO-8859-1")))
    "avc1".getBytes("ISO-8859-1").copyToArray(avc1, idx)
    assertThrows[IllegalArgumentException](VideoCodec.jpegFrames(avc1))
  }

  test("sampleFrames: mjpeg assets emit real frames at the stride; other codecs fall back") {
    val jpegs = Seq(realImage(16, 16, "jpg"), realImage(20, 16, "jpg"),
      realImage(24, 16, "jpg"), realImage(28, 16, "jpg"))
    val mjpeg = MediaAsset(30, "video", mjpegMp4(jpegs, 16, 16), MediaMeta(0, 0, 0, "mjpeg"))
    val fake = asset(31, "video", 1280, 720, 1000L, 600)
    val frames = sampleFrames(Seq(mjpeg, fake).toDS(), frameSize = 64, stride = 2)
      .collect().groupBy(_.assetId)

    val real = frames(30L).sortBy(_.frameNo)
    assert(real.length == 2, "stride 2 over 4 samples keeps frames 0 and 2")
    assert(real(0).content.sameElements(jpegs(0)))
    assert(real(1).content.sameElements(jpegs(2)))
    assert(ImageCodec.decodeMeta(real(1).content).width == 24)

    // the fake-codec path still serves fixture bytes (no mp4 magic)
    assert(frames(31L).forall(_.content.length <= 64))
  }

  test("videoNearDups pairs re-muxed/resampled footage, skips distinct or undecodable videos") {
    val a = realImage(64, 64, "jpg")
    val b = realImage(64, 48, "jpg")
    val bars = { // visually distinct footage: vertical bars
      val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64)
        img.setRGB(x, y, if ((x / 8) % 2 == 0) 0xffffff else 0)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val assets = Seq(
      MediaAsset(1, "video", mjpegMp4(Seq(a, b, a), 64, 64), MediaMeta(0, 0, 0, "mjpeg")),
      // stride-2 remux of the same footage: shares the opening frame
      MediaAsset(2, "video", mjpegMp4(Seq(a, a), 64, 64), MediaMeta(0, 0, 0, "mjpeg")),
      MediaAsset(3, "video", mjpegMp4(Seq(bars, a), 64, 64), MediaMeta(0, 0, 0, "mjpeg")),
      // undecodable codec and junk bytes must be skipped, not crash
      MediaAsset(4, "video", realMp4(640, 360, 600, 3000), MediaMeta(0, 0, 0, "h264")),
      MediaAsset(5, "video", Array[Byte](0, 0, 0, 8, 'f', 't', 'y', 'p'), MediaMeta(0, 0, 0, "?")))
    val pairs = videoNearDups(assets.toDS()).collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"))).toSet
    assert(pairs == Set((1L, 2L)),
      s"only the shared-opening-frame remux may pair: $pairs")
  }

  test("extractFeatures: mjpeg video gets pixel features, not a byte histogram") {
    val jpegs = Seq(realImage(40, 30, "jpg"))
    val mjpeg = MediaAsset(40, "video", mjpegMp4(jpegs, 40, 30), MediaMeta(0, 0, 0, "mjpeg"))
    val f = extractFeatures(Seq(mjpeg).toDS()).collect().head
    assert(f.feature.sameElements(ImageCodec.features(jpegs.head)),
      "video features must come from the DECODED first frame")
  }
}
