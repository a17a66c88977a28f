package graft.streaming

import graft.SparkTestBase
import graft.streaming.StreamCdc._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming FastCDC storage dedup: chunk fingerprints deduplicate
  * against persistent keyed state; first occurrence is stored, later
  * occurrences reference it — across batches, restarts, and sources.
  * The savings rollup equals the batch distinct-fp rule exactly. */
class StreamCdcSpec extends SparkTestBase {
  import spark.implicits._

  private def synthRecord(words: Int, seed: Int): String = {
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash")
    val rnd = new scala.util.Random(seed)
    Array.fill(words)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
  }

  test("first-occurrence chunk verdicts: dedup across batches and restarts, " +
      "rollup equals the batch distinct-fp rule") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = tmpDir("cdc_ckpt")
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(String, String, String)]
      val out = verdicts(spark, mem.toDF().toDF("source", "key", "json"))

      val outDir = tmpDir("cdc_out")
      def readOut() = spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "source STRING, key STRING, fp BIGINT, len BIGINT, isNew BOOLEAN"))
        .json(outDir)
      def runAvailable(expectRows: Long): Unit = {
        // no TTL state ⇒ AvailableNow self-terminates; waiting for real
        // termination (instead of polling + stop) keeps every sink and
        // state commit intact, so a restart never replays a batch
        val q = out.writeStream.format("json")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(120000)
        if (q.isActive) q.stop()
        assert(readOut().count() == expectRows,
          s"expected $expectRows verdict rows, got ${readOut().count()}")
      }

      val doc = synthRecord(120, 11) // several chunks
      val other = synthRecord(120, 23)
      val nDoc = graft.functions.FastCdc.chunkBytes(doc.getBytes("UTF-8")).length
      val nOther = graft.functions.FastCdc.chunkBytes(other.getBytes("UTF-8")).length
      assert(nDoc >= 3 && nOther >= 3)

      // batch 1: the same content arrives twice (two objects)
      mem.addData(("clicks", "o1", doc), ("clicks", "o2", doc))
      runAvailable(2L * nDoc)
      val r1 = readOut()
      assert(r1.count() == 2L * nDoc)
      assert(r1.filter(col("isNew")).count() == nDoc,
        "each fingerprint is stored exactly once within the batch")

      // restart over the same checkpoint: the content re-arrives from a
      // DIFFERENT source, plus genuinely new content
      mem.addData(("tweets", "o3", doc), ("logs", "o4", other))
      runAvailable(3L * nDoc + nOther)
      val r2 = readOut()
      assert(r2.filter(col("isNew")).count() == nDoc + nOther,
        "state survives restart: re-arrived chunks reference, never re-store")
      assert(r2.filter(col("source") === "tweets" && col("isNew")).count() == 0)

      // rollup equals the batch rule: stored bytes = one copy per fp
      final case class Sv(source: String, nChunks: Long, totalBytes: Long,
        storedBytes: Long, savedPpm: Long)
      val savings = savingsOf(r2).collect().map(r => Sv(r.getString(0),
        r.getAs[Long]("n_chunks"), r.getAs[Long]("total_bytes"),
        r.getAs[Long]("stored_bytes"), r.getAs[Long]("saved_ppm"))).toSeq
      val totalStored = savings.map(_.storedBytes).sum
      val batchRule = r2.select(col("fp"), col("len")).distinct()
        .agg(sum(col("len"))).collect().head.getLong(0)
      assert(totalStored == batchRule,
        s"stream-stored bytes ($totalStored) must equal the batch distinct-fp rule ($batchRule)")
      val clicks = savings.find(_.source == "clicks").get
      assert(clicks.savedPpm >= 500000L,
        s"the doubled batch-1 content must save >= 50%: $clicks")
      val tweets = savings.find(_.source == "tweets").get
      assert(tweets.storedBytes == 0L, "tweets re-sent known content: zero stored bytes")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
