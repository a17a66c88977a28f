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
}
