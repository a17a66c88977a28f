package graft.streaming

import graft.SparkTestBase
import graft.lake.{Catalog, Layout}
import org.apache.spark.sql.functions._

/** Streaming change-feed source ([[LakeCdfSourceProvider]]): readStream
  * over the manifest log delivers row-level changes exactly once across
  * batches AND restarts (offsets = committed versions), appends and
  * DV-deletes/upserts arrive with their change type, and rewrites emit
  * nothing. */
class LakeCdfSourceSpec extends SparkTestBase {

  private val received =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String, Long)]()

  private def startStream(layout: Layout, ckpt: String) =
    spark.readStream
      // the SHORT name, resolved through META-INF/services — pins the
      // DataSourceRegister wiring alongside the sink's ("graft-lake")
      .format("graft-lake-cdf")
      .option("root", layout.root)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("key", "v", "_change_type", "_commit_version").collect()
          .foreach(r => received.add(
            (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))))
        ()
      }
      .start()

  test("changes stream exactly once across micro-batches and restarts; " +
      "deletes carry content; rewrites emit nothing") {
    val layout = Layout(tmpDir("cdfsrc"))
    val ckpt = tmpDir("cdfsrc-ckpt")
    val s = spark
    import s.implicits._
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L)).toDF("source", "key", "v"))

    val q1 = startStream(layout, ckpt)
    q1.processAllAvailable()
    assert(received.size == 2, s"seed inserts delivered: $received")

    val v2 = Catalog.deleteLakeWhere(spark, layout, col("key") === "k2")
    val v3 = Catalog.upsertLakeByKey(spark, layout,
      Seq(("clicks", "k1", 11L)).toDF("source", "key", "v"), keyCols = Seq("key"))
    q1.processAllAvailable()
    q1.stop()

    val sorted = received.toArray(Array.empty[(String, Long, String, Long)])
      .sortBy(t => (t._4, t._3, t._1)).toSeq
    assert(sorted == Seq(
      ("k1", 10L, "insert", v1), ("k2", 20L, "insert", v1),
      ("k2", 20L, "delete", v2),
      ("k1", 10L, "delete", v3), ("k1", 11L, "insert", v3)),
      s"stream must equal the batch feed: $sorted")

    // a rewrite while the stream is DOWN: the restarted stream skips it
    // (no logical change) but picks up the next real commit — and never
    // redelivers anything already committed to the checkpoint
    assert(Catalog.materializeLakeDeletes(spark, layout) > 0)
    received.clear()
    val q2 = startStream(layout, ckpt)
    q2.processAllAvailable()
    assert(received.isEmpty, s"no redelivery, no rewrite rows: $received")
    val v5 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k9", 90L)).toDF("source", "key", "v"))
    q2.processAllAvailable()
    q2.stop()
    assert(received.toArray(Array.empty[(String, Long, String, Long)]).toSeq ==
      Seq(("k9", 90L, "insert", v5)), s"only the new commit arrives: $received")
  }

  test("a TYPE WIDENING after stream start refuses loud (no silent " +
      "narrow-cast corruption); a restart adopts the wide schema and " +
      "reads the long values exactly") {
    val layout = Layout(tmpDir("cdfsrc-widen"))
    val ckpt = tmpDir("cdfsrc-widen-ckpt")
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10)).toDF("source", "key", "v")) // INT column
    val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    def start() = spark.readStream
      .format(classOf[LakeCdfSourceProvider].getName)
      .option("root", layout.root)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select(col("v").cast("long")).collect()
          .foreach(r => got.add(r.getLong(0)))
        ()
      }
      .start()
    val q1 = start()
    q1.processAllAvailable()
    assert(got.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSeq == Seq(10L))

    // widen mid-stream and land a value only long can hold: the
    // running query (declared schema: int) must FAIL LOUD, not wrap
    Catalog.commitLakeWidenColumn(spark, layout, "v", "bigint")
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k2", 5000000000L)).toDF("source", "key", "v"))
    val e = intercept[Exception] { q1.processAllAvailable() }
    assert(e.getMessage.contains("widened") ||
      (e.getCause != null && e.getCause.getMessage.contains("widened")),
      s"expected the widening refusal, got: ${e.getMessage}")
    q1.stop()

    // restart: the new run declares the WIDE schema and delivers the
    // missed commit exactly once, value intact
    got.clear()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(got.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSeq == Seq(5000000000L),
      s"restart must deliver only the missed commit, wide: $got")
  }

  test("a RENAME after stream start refuses loud (silently nulling the " +
      "renamed column's data would be the narrow-cast corruption class); " +
      "a restart adopts the new name and delivers the missed commit") {
    val layout = Layout(tmpDir("cdfsrc-rn"))
    val ckpt = tmpDir("cdfsrc-rn-ckpt")
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L)).toDF("source", "key", "amount"))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    def start(valueCol: String) = spark.readStream
      .format("graft-lake-cdf")
      .option("root", layout.root)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select(col("key"), col(valueCol)).collect()
          .foreach(r => got.add((r.getString(0), r.getLong(1))))
        ()
      }
      .start()
    val q1 = start("amount")
    q1.processAllAvailable()
    assert(got.toArray(Array.empty[(String, Long)]).toSeq == Seq(("k1", 10L)))

    Catalog.commitLakeRenameColumn(spark, layout, "amount", "cents")
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k2", 20L)).toDF("source", "key", "cents"))
    val e = intercept[Exception] { q1.processAllAvailable() }
    assert(e.getMessage.contains("renamed") ||
      (e.getCause != null && e.getCause.getMessage.contains("renamed")),
      s"expected the rename refusal, got: ${e.getMessage}")
    q1.stop()

    got.clear()
    val q2 = start("cents")
    q2.processAllAvailable()
    q2.stop()
    assert(got.toArray(Array.empty[(String, Long)]).toSeq == Seq(("k2", 20L)),
      s"restart must deliver only the missed commit under the new name: $got")
  }

  test("Trigger.AvailableNow drains the backlog and STOPS (the batch-job-" +
      "over-a-stream idiom), honoring the rate limit's batch slicing") {
    val layout = Layout(tmpDir("cdfsrc-avail"))
    val s = spark
    import s.implicits._
    val versions = (1 to 4).map(i => Catalog.commitLake(spark, layout,
      Seq(("clicks", s"k$i", i.toLong)).toDF("source", "key", "v")))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream
      .format("graft-lake-cdf")
      .option("root", layout.root)
      .option("maxVersionsPerTrigger", "2")
      .load()
      .writeStream
      .option("checkpointLocation", tmpDir("cdfsrc-avail-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = df.select("_commit_version").collect().map(_.getLong(0))
        if (vs.nonEmpty) { nBatches.incrementAndGet()
          vs.foreach(v => got.add(java.lang.Long.valueOf(v))) }
        ()
      }
      .start()
    // AvailableNow terminates on its own once the backlog is drained
    assert(q.awaitTermination(120000), "AvailableNow must stop by itself")
    assert(got.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSeq.sorted ==
      versions.sorted, s"the whole backlog, exactly once: $got")
    assert(nBatches.get() >= 2,
      s"rate limit must slice the drain into multiple batches: ${nBatches.get()}")
  }

  test("startingVersion skips already-consumed history") {
    val layout = Layout(tmpDir("cdfsrc-sv"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "old", 1L)).toDF("source", "key", "v"))
    val vSkip = Catalog.headVersion(spark, layout)
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "new", 2L)).toDF("source", "key", "v"))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = spark.readStream
      .format(classOf[LakeCdfSourceProvider].getName)
      .option("root", layout.root)
      .option("startingVersion", vSkip.toString)
      .load()
      .writeStream
      .option("checkpointLocation", tmpDir("cdfsrc-sv-ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("key").collect().foreach(r => got.add(r.getString(0)))
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(got.toArray(Array.empty[String]).toSeq == Seq("new"),
      s"history at or below startingVersion must be skipped: $got")
  }

  test("maxVersionsPerTrigger slices a backlog into bounded micro-batches " +
      "(never more than k versions per batch), delivers everything exactly " +
      "once, and a restarted stream paces from the checkpoint, not behind it") {
    val layout = Layout(tmpDir("cdfsrc-rate"))
    val s = spark
    import s.implicits._
    val versions = (1 to 5).map(i => Catalog.commitLake(spark, layout,
      Seq(("clicks", s"k$i", i.toLong)).toDF("source", "key", "v")))
    val ckpt = tmpDir("cdfsrc-rate-ckpt")
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    def start() = spark.readStream
      .format("graft-lake-cdf")
      .option("root", layout.root)
      .option("maxVersionsPerTrigger", "2")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = df.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        if (vs.nonEmpty) batches.add(vs)
        ()
      }
      .start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    val got1 = batches.toArray(Array.empty[Seq[Long]]).toSeq
    assert(got1.forall(vs => vs.max - vs.min < 2),
      s"a batch spanned more than 2 versions: $got1")
    assert(got1.size >= 3, s"5 versions at k=2 need >= 3 batches: $got1")
    assert(got1.flatten.sorted == versions.sorted,
      s"every version delivered exactly once: $got1")

    // restart with a fresh backlog: pacing resumes from the checkpoint
    // (the recovery getBatch re-syncs the rate-limit base — nothing is
    // redelivered, nothing skipped) and the new commits stay bounded
    batches.clear()
    val more = (6 to 9).map(i => Catalog.commitLake(spark, layout,
      Seq(("clicks", s"k$i", i.toLong)).toDF("source", "key", "v")))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val got2 = batches.toArray(Array.empty[Seq[Long]]).toSeq
    assert(got2.flatten.sorted == more.sorted,
      s"exactly the new commits, once each: $got2")
    assert(got2.forall(vs => vs.max - vs.min < 2) && got2.size >= 2,
      s"restart pacing still bounded: $got2")
  }

  test("round-14 startingTimestamp: the stream starts after the AS-OF " +
      "version at the timestamp (Delta parity); a timestamp in PRUNED " +
      "history refuses loud; startingVersion+startingTimestamp " +
      "together refuse") {
    val layout = Layout(tmpDir("cdfsrc-ts"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L)).toDF("source", "key", "v"))
    Thread.sleep(30)
    val tMid = System.currentTimeMillis()
    Thread.sleep(30)
    val v2 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k2", 20L)).toDF("source", "key", "v"))
    received.clear()
    val q = spark.readStream.format("graft-lake-cdf")
      .option("root", layout.root)
      .option("startingTimestamp", tMid.toString)
      .load().writeStream
      .option("checkpointLocation", tmpDir("cdfsrc-ts-ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("key", "v", "_change_type", "_commit_version").collect()
          .foreach(r => received.add(
            (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))))
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(received.toArray(Array.empty[(String, Long, String, Long)]).toSeq
      == Seq(("k2", 20L, "insert", v2)),
      s"only history after the as-of point streams: $received")

    // both options together: ambiguous, refuse at source creation
    val both = intercept[Exception] {
      val qb = spark.readStream.format("graft-lake-cdf")
        .option("root", layout.root)
        .option("startingVersion", "0")
        .option("startingTimestamp", tMid.toString)
        .load().writeStream
        .option("checkpointLocation", tmpDir("cdfsrc-both-ckpt"))
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .start()
      try qb.processAllAvailable() finally qb.stop()
    }
    assert(both.getMessage.contains("not both") ||
      Option(both.getCause).exists(_.getMessage.contains("not both")))

    // PRUNED history: fold + prune, then ask for a timestamp below the
    // oldest retained commit time — loud, never a silent start-at-fold
    Catalog.checkpoint(spark, layout)
    Catalog.pruneLog(spark, layout)
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k3", 30L)).toDF("source", "key", "v"))
    val pruned = intercept[Exception] {
      val qp = spark.readStream.format("graft-lake-cdf")
        .option("root", layout.root)
        .option("startingTimestamp", (tMid - 3600000L).toString)
        .load().writeStream
        .option("checkpointLocation", tmpDir("cdfsrc-pruned-ckpt"))
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .start()
      try qp.processAllAvailable() finally qp.stop()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(m =>
        m.contains("not timestamp-addressable")) || mentions(t.getCause))
    assert(mentions(pruned), s"pruned-history refusal must be loud: $pruned")
  }

  test("round-14 (review catch): startingTimestamp is resolved " +
      "LAZILY, so a checkpointed stream RESTARTS cleanly even after " +
      "log maintenance pruned history below its original timestamp — " +
      "an eager re-resolve would brick the restart forever") {
    val layout = Layout(tmpDir("cdfsrc-ts-restart"))
    val ckpt = tmpDir("cdfsrc-ts-restart-ckpt")
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L)).toDF("source", "key", "v"))
    Thread.sleep(30)
    val t0 = System.currentTimeMillis()
    Thread.sleep(30)
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k2", 20L)).toDF("source", "key", "v"))
    received.clear()
    def run(): Unit = {
      val q = spark.readStream.format("graft-lake-cdf")
        .option("root", layout.root)
        .option("startingTimestamp", t0.toString)
        .load().writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("key").collect().foreach(r =>
            received.add((r.getString(0), 0L, "", 0L)))
          ()
        }.start()
      q.processAllAvailable(); q.stop()
    }
    run()
    assert(received.size == 1) // k2 only (after the as-of point)
    // maintenance makes t0 un-addressable: fold + prune the history,
    // then append fresh commits
    Catalog.checkpoint(spark, layout)
    Catalog.pruneLog(spark, layout)
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k3", 30L)).toDF("source", "key", "v"))
    intercept[Exception] { // t0 IS pruned now (the fixture really bites)
      Catalog.versionAtTimestamp(spark, layout, t0)
    }
    // the restart recovers its cursor from the offset log and must
    // NEVER consult the timestamp again
    run()
    assert(received.toArray(Array.empty[(String, Long, String, Long)])
      .map(_._1).sorted.toSeq == Seq("k2", "k3"),
      s"restart continues exactly: $received")
  }
}
