package graft.streaming

import graft.SparkTestBase
import graft.streaming.TtlDedup._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** transformWithState TTL dedup: first record per id passes, repeats
  * (same batch or after a restart, within TTL) are dropped. Requires
  * the RocksDB state store provider; runs AvailableNow batches over a
  * shared checkpoint so state durability across restarts is exercised
  * too (a ProcessingTime trigger plus TTL maintenance never idles, so
  * processAllAvailable-style tests would hang). */
class TtlDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("first-seen dedup drops same-batch and cross-restart repeats") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = tmpDir("ttl_ckpt")
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Keyed]
      val deduped = firstSeen(spark, mem.toDS(), java.time.Duration.ofHours(1))

      val outDir = tmpDir("ttl_out")
      def readOut() = spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, payload STRING"))
        .json(outDir).as[Keyed].collect().sortBy(k => (k.id, k.payload))
      // TTL maintenance keeps scheduling batches even under
      // AvailableNow, so the query may never self-terminate — poll for
      // the expected output, then stop explicitly.
      def runAvailable(expectRows: Int): Unit = {
        val q = deduped.writeStream.format("json")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        val deadline = System.currentTimeMillis() + 90000
        while (System.currentTimeMillis() < deadline &&
          (q.isActive && readOut().length < expectRows)) Thread.sleep(1000)
        q.stop()
      }

      mem.addData(Keyed(1, "a"), Keyed(1, "a-dup"), Keyed(2, "b"))
      runAvailable(expectRows = 2)
      val r1 = readOut()
      assert(r1.map(_.id).toSeq == Seq(1L, 2L), r1.mkString(","))
      // exactly ONE of id 1's duplicates survived (which one is
      // shuffle-order dependent within a batch)
      assert(Set("a", "a-dup").contains(r1.find(_.id == 1L).get.payload))

      // redelivery of id 1 after a RESTART (same checkpoint): state
      // must survive and still drop it, while new id 3 passes
      mem.addData(Keyed(1, "a-redelivery"), Keyed(3, "c"))
      runAvailable(expectRows = 3)
      val r2 = readOut()
      assert(r2.map(_.id).toSeq == Seq(1L, 2L, 3L), r2.mkString(","))
      assert(!r2.exists(_.payload == "a-redelivery"))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
