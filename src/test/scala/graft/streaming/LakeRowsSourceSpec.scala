package graft.streaming

import graft.SparkTestBase
import graft.lake.{Catalog, Layout}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-12: the PLAIN-ROWS streaming read of the lake
  * (`readStream.format("graft-lake")` — the same format name as the
  * sink, the Delta streaming-table idiom): appends arrive as payload
  * rows exactly once across batches and restarts; a range containing
  * deletes refuses loud unless `ignoreDeletes=true`; admission
  * control + `Trigger.AvailableNow` drain in capped batches. */
class LakeRowsSourceSpec extends SparkTestBase {

  private val received =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
  private val batchSizes =
    new java.util.concurrent.ConcurrentLinkedQueue[Int]()

  private def startStream(layout: Layout, ckpt: String,
      extra: Map[String, String] = Map.empty,
      trigger: Option[Trigger] = None) = {
    var r = spark.readStream.format("graft-lake").option("root", layout.root)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    var w = r.load().writeStream.option("checkpointLocation", ckpt)
    trigger.foreach(t => w = w.trigger(t))
    w.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select("key", "v").collect()
        if (rows.nonEmpty) batchSizes.add(rows.length)
        rows.foreach(r => received.add((r.getString(0), r.getLong(1))))
        ()
      }
      .start()
  }

  test("appends stream as payload rows exactly once across batches and " +
      "restarts; the schema carries NO feed columns") {
    val layout = Layout(tmpDir("rowsrc"))
    val ckpt = tmpDir("rowsrc-ckpt")
    val s = spark
    import s.implicits._
    received.clear(); batchSizes.clear()
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L)).toDF("source", "key", "v"))

    val src = spark.readStream.format("graft-lake")
      .option("root", layout.root).load()
    assert(!src.columns.contains("_change_type") &&
      !src.columns.contains("_commit_version"),
      s"plain rows only: ${src.columns.toSeq}")

    val q1 = startStream(layout, ckpt)
    q1.processAllAvailable()
    assert(received.toArray(Array.empty[(String, Long)]).sorted.toSeq ==
      Seq(("k1", 10L), ("k2", 20L)))
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k3", 30L)).toDF("source", "key", "v"))
    q1.processAllAvailable()
    q1.stop()
    assert(received.size == 3)

    // restart: nothing redelivered, the next commit arrives
    received.clear()
    val q2 = startStream(layout, ckpt)
    q2.processAllAvailable()
    assert(received.isEmpty, s"no redelivery: $received")
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k4", 40L)).toDF("source", "key", "v"))
    q2.processAllAvailable()
    q2.stop()
    assert(received.toArray(Array.empty[(String, Long)]).toSeq ==
      Seq(("k4", 40L)))
  }

  test("a range containing row-level deletes REFUSES loud (the Delta " +
      "source contract); ignoreDeletes=true serves the inserts only") {
    val layout = Layout(tmpDir("rowsrc-del"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L)).toDF("source", "key", "v"))
    Catalog.deleteLakeWhere(spark, layout, col("key") === "k2")

    received.clear(); batchSizes.clear()
    val q1 = startStream(layout, tmpDir("rowsrc-del-ckpt1"))
    val e = intercept[Exception](q1.processAllAvailable())
    q1.stop()
    assert(e.getMessage.contains("ignoreDeletes"), e.getMessage)

    received.clear()
    val q2 = startStream(layout, tmpDir("rowsrc-del-ckpt2"),
      Map("ignoreDeletes" -> "true"))
    q2.processAllAvailable()
    q2.stop()
    // inserts only — the delete retraction is declared irrelevant
    assert(received.toArray(Array.empty[(String, Long)]).sorted.toSeq ==
      Seq(("k1", 10L), ("k2", 20L)))
  }

  test("an ERASE in range refuses too (review catch: the content-" +
      "changing rewrite commits no DV, and the CDF stays silent by " +
      "legal design — an append-only stream must still not silently " +
      "keep erased rows downstream)") {
    val layout = Layout(tmpDir("rowsrc-erase"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L)).toDF("source", "key", "v"))
    // the erase rewrite leg's commit shape: rewritten adds + removes +
    // the "erase" note, NO DV
    val live = Catalog.lakeFilesAsOf(spark, layout)
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L)).toDF("source", "key", "v"),
      removes = live, note = Some("erase"))
    assert(Catalog.lakeHasDeletesBetween(spark, layout, 1L, 2L))
    received.clear()
    val q = startStream(layout, tmpDir("rowsrc-erase-ckpt"))
    val e = intercept[Exception](q.processAllAvailable())
    q.stop()
    assert(e.getMessage.contains("ignoreDeletes"), e.getMessage)
  }

  test("a crafted 'table' option cannot escape the _tables namespace") {
    val layout = Layout(tmpDir("rowsrc-traverse"))
    val e = intercept[Exception] {
      spark.readStream.format("graft-lake")
        .option("root", layout.root).option("table", "../..")
        .load()
    }
    assert(e.getMessage.contains("not a valid graft table name") ||
      Option(e.getCause).exists(_.getMessage
        .contains("not a valid graft table name")), e.getMessage)
  }

  test("option 'table' addresses a CREATED table's own layout: the " +
      "sink writes its log, SQL reads it, the rows source streams it — " +
      "the root lake untouched") {
    val s = spark
    import s.implicits._
    val root = tmpDir("rowsrc-table")
    val cat = s"grs_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.events (key STRING, v BIGINT, source STRING)")

    // stream INTO the created table by name
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String, Long)]
    mem.addData(("clicks", "k1", 10L), ("clicks", "k2", 20L))
    val q = mem.toDF().toDF("source", "key", "v")
      .writeStream.format("graft-lake")
      .option("root", root).option("table", "events")
      .option("checkpointLocation", tmpDir("rowsrc-table-ckpt"))
      .start()
    q.processAllAvailable(); q.stop()

    assert(spark.sql(s"SELECT count(*) FROM $cat.events").head.getLong(0) == 2L)
    assert(!graft.lake.Catalog.lakeTableExists(spark,
      graft.lake.Layout(root)), "the root lake must stay untouched")

    // stream OUT of it by name
    received.clear()
    val q2 = startStream(graft.lake.Layout(root), tmpDir("rowsrc-table-out"),
      Map("table" -> "events"))
    q2.processAllAvailable(); q2.stop()
    assert(received.toArray(Array.empty[(String, Long)]).sorted.toSeq ==
      Seq(("k1", 10L), ("k2", 20L)))
  }

  test("admission control + Trigger.AvailableNow: a capped drain serves " +
      "the whole backlog in version-bounded batches, then stops") {
    val layout = Layout(tmpDir("rowsrc-drain"))
    val s = spark
    import s.implicits._
    (1 to 4).foreach { i =>
      Catalog.commitLake(spark, layout,
        Seq(("clicks", s"k$i", i * 10L)).toDF("source", "key", "v"))
    }
    received.clear(); batchSizes.clear()
    val q = startStream(layout, tmpDir("rowsrc-drain-ckpt"),
      Map("maxVersionsPerTrigger" -> "1"),
      Some(Trigger.AvailableNow()))
    q.awaitTermination(120000)
    assert(received.toArray(Array.empty[(String, Long)]).sorted.toSeq ==
      (1 to 4).map(i => (s"k$i", i * 10L)),
      s"the WHOLE backlog drains (no one-shot truncation): $received")
    assert(batchSizes.size == 4,
      s"one version per batch under the cap: $batchSizes")
  }

  test("a cross-table transaction streams LOSSLESSLY (round 13): the " +
      "stream does not advance past an unresolved leg, and after the " +
      "bind it emits the leg's rows exactly once — even though a later " +
      "plain append already sat above them") {
    val s = spark
    import s.implicits._
    val root = tmpDir("rowsrc-txn")
    val a = Layout(s"$root/_tables/t_a")
    val b = Layout(s"$root/_tables/t_b")
    val ckpt = tmpDir("rowsrc-txn-ckpt")
    received.clear(); batchSizes.clear()
    Catalog.commitLake(spark, a,
      Seq(("clicks", "k1", 10L)).toDF("source", "key", "v"))
    Catalog.commitLake(spark, b,
      Seq(("clicks", "x1", 1L)).toDF("source", "key", "v"))
    val q = startStream(a, ckpt)
    q.processAllAvailable()
    assert(received.size == 1)
    // a txn whose writer "crashes" before the bind, then a PLAIN
    // append above it — the trap shape: a cursor at the raw head
    // would pass the leg and lose its rows when the bind lands
    intercept[RuntimeException] {
      Catalog.commitLakeTransactionImpl(spark,
        Seq(a -> Seq(("clicks", "txk", 100L)).toDF("source", "key", "v"),
          b -> Seq(("clicks", "txx", 2L)).toDF("source", "key", "v")),
        None, beforeBind = () => throw new RuntimeException("crash"))
    }
    Catalog.commitLake(spark, a,
      Seq(("clicks", "k2", 20L)).toDF("source", "key", "v"))
    q.processAllAvailable()
    assert(received.size == 1,
      s"the stream must NOT advance past the unresolved leg: $received")
    // the bind finally lands (late writer)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val id = Catalog.pendingTransactions(spark, a).head._2
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$root/_txn/$id.txn"), false)
    try out.write("commit".getBytes("UTF-8")) finally out.close()
    q.processAllAvailable()
    q.stop()
    val all = received.toArray(Array.empty[(String, Long)]).sorted.toSeq
    assert(all == Seq(("k1", 10L), ("k2", 20L), ("txk", 100L)),
      s"leg + later append each exactly once, in one resume: $all")
  }
}
