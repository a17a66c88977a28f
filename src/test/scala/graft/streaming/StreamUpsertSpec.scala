package graft.streaming

import graft.SparkTestBase
import graft.lake.{Catalog, Layout}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Change(source: String, key: String, v: Long, seq: Long)

/** Streaming CDC apply: per micro-batch, the change stream merges into
  * the lake atomically; within-batch versions collapse to the latest
  * per key, the live view is framing-invariant, and redelivery does
  * not change state. */
class StreamUpsertSpec extends SparkTestBase {

  private def liveView(layout: Layout): Seq[String] =
    Catalog.loadLakeSnapshot(spark, layout)
      .select("source", "key", "v").collect().map(_.toString).sorted.toSeq

  test("CDC apply: within-batch collapse, cross-batch supersede, " +
      "framing-invariant final state, idempotent redelivery") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val changes = Seq(
      Change("clicks", "k1", 10L, 1), Change("clicks", "k2", 20L, 2),
      Change("clicks", "k1", 11L, 3), // supersedes k1 within/across batches
      Change("logs", "k3", 30L, 4),
      Change("clicks", "k2", 21L, 5),
      Change("logs", "k3", 31L, 6))

    def runWith(framing: Seq[Seq[Change]], tag: String): Seq[String] = {
      val layout = Layout(tmpDir(s"su-$tag"))
      val mem = MemoryStream[Change]
      val q = StreamUpsert.start(mem.toDF(), layout,
        keyCols = Seq("key"), seqCol = "seq", tmpDir(s"su-ckpt-$tag"))
      framing.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      liveView(layout)
    }

    val oneBatch = runWith(Seq(changes), "one")
    assert(oneBatch == Seq("[clicks,k1,11]", "[clicks,k2,21]", "[logs,k3,31]"),
      s"latest version per key wins: $oneBatch")
    val threeBatches = runWith(changes.grouped(2).toSeq, "three")
    assert(threeBatches == oneBatch, "final state must be framing-invariant")

    // redelivery: re-applying the last batch leaves the state unchanged
    val layout = Layout(tmpDir("su-redeliver"))
    StreamUpsert.applyBatch(layout, changes.take(4).toDF(), Seq("key"), "seq")
    val before = liveView(layout)
    StreamUpsert.applyBatch(layout, changes.take(4).toDF(), Seq("key"), "seq")
    assert(liveView(layout) == before, "at-least-once redelivery is state-idempotent")
    // the redelivery superseded the first application through DVs
    // (a new log version, same live state)
    assert(Catalog.dvFilesAsOf(spark, layout).nonEmpty)
  }

  test("the batch marker makes redelivery exactly-once: no duplicate log commit") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("su-marker"))
    val ckpt = tmpDir("su-marker-ckpt")
    val batch = Seq(Change("clicks", "k1", 10L, 1)).toDF()
    def commits(): Int = new java.io.File(s"${layout.catalogDir}/_log")
      .listFiles().count(_.getName.endsWith(".commit"))
    assert(StreamUpsert.applyBatchOnce(layout, batch, Seq("key"), "seq", ckpt, 7L))
    val n1 = commits()
    assert(n1 == 1)
    // redelivery of the same batch id: marker found, nothing committed
    assert(!StreamUpsert.applyBatchOnce(layout, batch, Seq("key"), "seq", ckpt, 7L))
    assert(commits() == n1, "a marked batch must not commit again")
    assert(liveView(layout) == Seq("[clicks,k1,10]"))
    // a NEW batch id still applies
    assert(StreamUpsert.applyBatchOnce(layout,
      Seq(Change("clicks", "k1", 11L, 2)).toDF(), Seq("key"), "seq", ckpt, 8L))
    assert(liveView(layout) == Seq("[clicks,k1,11]"))
  }
}
