package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star extension): image/audio/video as
  * opaque BINARY columns with typed metadata, processed in partition
  * batches.
  *
  * The Spark-side plumbing is real and tested — schema, partitioning,
  * batch shape (`mapPartitions` over a typed Dataset = the Scala
  * analogue of batch-UDF processing: one iterator per partition, so
  * per-batch setup like a decoder init happens once per partition, not
  * per row). The DECODE STEP IS A DETERMINISTIC FAKE — the container
  * ships no image/audio codecs — marked [STUB] below; swapping
  * `FakeCodec` for a real codec changes no plumbing.
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

  /** [STUB] Deterministic fake codec. A real implementation would wrap
    * javax.imageio / ffmpeg here; everything downstream is agnostic. */
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
    * the exact batch contract a heavyweight decoder needs. */
  def decodeAll(assets: Dataset[MediaAsset]): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition (per-batch) setup would init the real codec here
      it.map(a => a.copy(meta = FakeCodec.decodeMeta(a.content, a.meta.codec)))
    }
  }

  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a =>
      MediaFeatures(a.assetId, a.modality, FakeCodec.features(a.content))))
  }

  def resizeAll(assets: Dataset[MediaAsset], factor: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a => a.copy(content = FakeCodec.resize(a.content, factor))))
  }

  /** Frame sampling fans out one video row to many frame rows —
    * flatMap inside the partition iterator keeps it pipelined. */
  def sampleFrames(assets: Dataset[MediaAsset], frameSize: Int, stride: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.modality == "video").mapPartitions(_.flatMap(a =>
      FakeCodec.sampleFrames(a.content, frameSize, stride).zipWithIndex
        .map { case (f, i) => Frame(a.assetId, i, f) }))
  }

  /** Persist assets partitioned by modality (heavy-row layout rule). */
  def writeAssets(assets: Dataset[MediaAsset], path: String): Unit =
    assets.write.mode("overwrite").partitionBy("modality").parquet(path)

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
