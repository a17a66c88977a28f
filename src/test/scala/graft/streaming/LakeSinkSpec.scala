package graft.streaming

import graft.SparkTestBase
import graft.lake.{Catalog, Layout}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The first-class `graft-lake` streaming SINK ([[LakeSinkProvider]]):
  * short-name format resolution, one atomic version per micro-batch,
  * checkpointed restart without re-apply, marker-keyed exactly-once
  * under redelivery, upsert mode, and loud option refusals. */
class LakeSinkSpec extends SparkTestBase {

  private def liveView(layout: Layout): Seq[String] =
    Catalog.loadLakeSnapshot(spark, layout)
      .select("source", "key", "v").collect().map(_.toString).sorted.toSeq

  private def commits(layout: Layout): Int =
    new java.io.File(s"${layout.catalogDir}/_log")
      .listFiles().count(_.getName.endsWith(".commit"))

  test("append mode via format(\"graft-lake\"): each micro-batch is ONE " +
      "atomic version, CDF shows batch boundaries, restart from the " +
      "checkpoint re-applies nothing") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val layout = Layout(tmpDir("lsink-append"))
    val ckpt = tmpDir("lsink-append-ckpt")
    val mem = MemoryStream[Change]
    def start() = mem.toDF().writeStream.format("graft-lake")
      .option("root", layout.root)
      .option("checkpointLocation", ckpt)
      .start()

    val q = start()
    mem.addData(Change("clicks", "k1", 10L, 1), Change("logs", "k3", 30L, 2))
    q.processAllAvailable()
    val v1 = Catalog.headVersion(spark, layout)
    assert(v1 == 1L, "first batch = one commit (two sources, ONE version)")
    mem.addData(Change("clicks", "k2", 20L, 3))
    q.processAllAvailable()
    q.stop()
    assert(Catalog.headVersion(spark, layout) == v1 + 1)
    assert(liveView(layout) ==
      Seq("[clicks,k1,10]", "[clicks,k2,20]", "[logs,k3,30]"))
    // CDF: each batch is exactly one version
    val versions = Catalog.lakeChangesBetween(spark, layout, 0L)
      .select("_commit_version").distinct().collect().map(_.getLong(0)).sorted
    assert(versions.toSeq == Seq(v1, v1 + 1))

    // restart from the checkpoint: no new data, no new version
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(Catalog.headVersion(spark, layout) == v1 + 1,
      "a restart must not re-apply committed batches")
    assert(liveView(layout).size == 3)
  }

  test("redelivered batch id is SKIPPED by the marker (no duplicate log " +
      "version); a new batch id applies") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("lsink-redeliver"))
    val ckpt = tmpDir("lsink-redeliver-ckpt")
    val sink = new LakeSinkProvider().createSink(spark.sqlContext,
      Map("root" -> layout.root, "checkpointLocation" -> ckpt),
      Seq.empty, OutputMode.Append())
    val batch = Seq(Change("clicks", "k1", 10L, 1)).toDF()
    sink.addBatch(7L, batch)
    val n1 = commits(layout)
    assert(n1 == 1)
    sink.addBatch(7L, batch) // the engine redelivers after a crash
    assert(commits(layout) == n1, "a marked batch must not commit again")
    assert(liveView(layout) == Seq("[clicks,k1,10]"))
    sink.addBatch(8L, Seq(Change("clicks", "k2", 20L, 2)).toDF())
    assert(commits(layout) == n1 + 1)
    assert(liveView(layout) == Seq("[clicks,k1,10]", "[clicks,k2,20]"))
  }

  test("upsert mode: within-batch collapse by seqCol, cross-batch " +
      "supersede, one DV+append version per batch") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val layout = Layout(tmpDir("lsink-upsert"))
    val mem = MemoryStream[Change]
    val q = mem.toDF().writeStream.format("graft-lake")
      .option("root", layout.root)
      .option("checkpointLocation", tmpDir("lsink-upsert-ckpt"))
      .option("mode", "upsert")
      .option("keys", "key").option("seqCol", "seq")
      .start()
    mem.addData(Change("clicks", "k1", 10L, 1), Change("clicks", "k1", 11L, 2),
      Change("logs", "k3", 30L, 3))
    q.processAllAvailable()
    assert(liveView(layout) == Seq("[clicks,k1,11]", "[logs,k3,30]"),
      "within-batch collapse to the latest seq per key")
    val vAfter1 = Catalog.headVersion(spark, layout)
    mem.addData(Change("clicks", "k1", 12L, 4))
    q.processAllAvailable()
    q.stop()
    assert(Catalog.headVersion(spark, layout) == vAfter1 + 1)
    assert(liveView(layout) == Seq("[clicks,k1,12]", "[logs,k3,30]"),
      "cross-batch supersede through the merge")
  }

  test("Complete mode = one atomic REPLACE per batch: the lake mirrors a " +
      "streaming aggregate exactly; the CDF shows retract+insert versions") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val layout = Layout(tmpDir("lsink-complete"))
    val mem = MemoryStream[Change]
    val agg = mem.toDF().groupBy("source", "key")
      .agg(org.apache.spark.sql.functions.sum("v").as("v"))
    val q = agg.writeStream.format("graft-lake").outputMode("complete")
      .option("root", layout.root)
      .option("checkpointLocation", tmpDir("lsink-complete-ckpt"))
      .start()
    mem.addData(Change("clicks", "k1", 10L, 1), Change("clicks", "k1", 5L, 2))
    q.processAllAvailable()
    assert(liveView(layout) == Seq("[clicks,k1,15]"))
    val v1 = Catalog.headVersion(spark, layout)
    mem.addData(Change("clicks", "k1", 1L, 3), Change("logs", "k3", 30L, 4))
    q.processAllAvailable()
    q.stop()
    assert(liveView(layout) == Seq("[clicks,k1,16]", "[logs,k3,30]"),
      "the lake IS the aggregate after every batch")
    assert(Catalog.headVersion(spark, layout) == v1 + 1,
      "one Complete batch = one atomic replace version")
    // time travel below the replace still shows the previous result
    assert(Catalog.loadLakeSnapshot(spark, layout, v1)
      .select("v").head.getLong(0) == 15L)
    // the CDF retracts the superseded aggregate row exactly once
    val ch = Catalog.lakeChangesBetween(spark, layout, v1)
      .select("key", "v", "_change_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(ch == Set(("k1", 15L, "delete"), ("k1", 16L, "insert"),
      ("k3", 30L, "insert")), ch.toString)
  }

  test("option refusals: missing root/checkpoint/keys, a bogus mode, " +
      "Update-without-upsert, and Complete-with-upsert fail loud at " +
      "sink construction") {
    val provider = new LakeSinkProvider()
    def mk(opts: Map[String, String],
        om: OutputMode = OutputMode.Append()) =
      provider.createSink(spark.sqlContext, opts, Seq.empty, om)
    intercept[IllegalArgumentException](mk(Map("checkpointLocation" -> "/x")))
    intercept[IllegalArgumentException](mk(Map("root" -> "/x")))
    intercept[IllegalArgumentException](mk(Map("root" -> "/x",
      "checkpointLocation" -> "/c", "mode" -> "upsert")))
    intercept[IllegalArgumentException](mk(Map("root" -> "/x",
      "checkpointLocation" -> "/c", "mode" -> "replace")))
    // Update re-emits changed keys: appending would duplicate them
    intercept[IllegalArgumentException](mk(Map("root" -> "/x",
      "checkpointLocation" -> "/c"), OutputMode.Update()))
    // Complete replaces wholesale: keyed upsert contradicts it
    intercept[IllegalArgumentException](mk(Map("root" -> "/x",
      "checkpointLocation" -> "/c", "mode" -> "upsert", "keys" -> "k",
      "seqCol" -> "s"), OutputMode.Complete()))
  }
}
