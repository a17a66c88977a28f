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
