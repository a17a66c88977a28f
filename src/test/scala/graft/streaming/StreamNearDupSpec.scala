package graft.streaming

import graft.SparkTestBase
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** End-to-end STREAMING near-dedup: each micro-batch is checked
  * against a persisted corpus band index via
  * [[Dedup.incrementalNearDups]] inside foreachBatch, and the batch's
  * own bands are appended to the index so later batches can match
  * EARLIER batches — the unbounded-corpus near-dedup loop (the
  * near-dup analogue of [[TtlDedup]]'s exact streaming dedup).
  *
  * At scale: the index is an append-only (doc_id, band_no, band_val)
  * table hash-distributed on the band key; each batch pays O(batch)
  * signature work + one equi join into it — never a corpus rescan.
  */
class StreamNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(id: Long, tokens: Seq[String]): (Long, String) = (id, tokens.mkString(" "))

  test("micro-batches near-dedup against a growing corpus index") {
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 40).map(i => s"tok$i")

    val corpusDocs = Seq(
      doc(1L, base),
      doc(2L, (100 to 140).map(i => s"other$i"))).toDF("doc_id", "text")
    val root = tmpDir("streamdedup")
    val indexPath = s"$root/band_index"
    val corpusPath = s"$root/corpus"
    // bootstrap the persisted corpus + index
    corpusDocs.write.mode("overwrite").parquet(corpusPath)
    Dedup.bandIndexOf(corpusDocs).write.mode("overwrite").parquet(indexPath)

    val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val index = s.read.parquet(indexPath)
          val corpus = s.read.parquet(corpusPath)
          val matches = Dedup.incrementalNearDups(s, index, corpus, batch, 0.5)
            .select(col("new_doc"), col("corpus_doc")).collect()
          hits.synchronized { hits ++= matches.map(r => (r.getLong(0), r.getLong(1))) }
          // append this batch into corpus + index so FUTURE batches
          // can match it (batch becomes corpus)
          batch.write.mode("append").parquet(corpusPath)
          Dedup.bandIndexOf(batch).write.mode("append").parquet(indexPath)
        }
      }
      .start()

    // batch 1: near-copy of corpus doc 1 + a novel doc
    mem.addData(doc(100L, base.drop(2)), doc(101L, (200 to 240).map(i => s"new$i")))
    q.processAllAvailable()
    // batch 2: near-copy of BATCH-1's novel doc 101 (tests index growth)
    mem.addData(doc(200L, (200 to 238).map(i => s"new$i")))
    q.processAllAvailable()
    q.stop()

    val got = hits.toSet
    assert(got.contains((100L, 1L)), s"batch-vs-corpus near-dup missed: $got")
    assert(got.contains((200L, 101L)), s"batch-vs-EARLIER-batch near-dup missed: $got")
    assert(!got.exists(_._1 == 101L), s"novel doc falsely matched: $got")
    // corpus grew by every batch doc
    assert(spark.read.parquet(corpusPath).count() == 5)
  }
}
