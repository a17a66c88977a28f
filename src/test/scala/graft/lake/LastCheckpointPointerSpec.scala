package graft.lake

import graft.SparkTestBase

/** Round-14: the `_last_checkpoint` pointer — Delta's answer to the
  * object-store LIST cost of a cold log read. On non-local schemes
  * [[Catalog]] reads the pointer, reads the named checkpoint
  * directly, and probes the DENSE commit tail forward (point lookups)
  * instead of LISTing the whole `_log` dir; the listing remains the
  * authority whenever the pointer is missing, torn, stale, or names a
  * missing checkpoint. [[CountingLocalFs]] proves which path ran. */
class LastCheckpointPointerSpec extends SparkTestBase {

  private def oneRow(k: Long) = {
    val s = spark
    import s.implicits._
    Seq(("clicks", k, k * 10)).toDF("source", "k", "v")
  }

  private def newLayout(name: String): Layout = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.countfs.impl", classOf[CountingLocalFs].getName)
    // the adaptive router would LIST these tiny fixtures (listing wins
    // until ~100k retained names — ListCostProbe's measurement); force
    // the probe path so its machinery is what this spec exercises
    spark.sparkContext.hadoopConfiguration.set("graft.log.probeThreshold", "1")
    Layout("countfs:" + tmpDir(name))
  }

  private def localLogDir(layout: Layout): java.io.File =
    new java.io.File(
      new java.net.URI("file://" +
        layout.catalogDir.stripPrefix("countfs:")).getPath + "/_log")

  private def keys(layout: Layout): Set[Long] =
    Catalog.loadLakeSnapshot(spark, layout)
      .select("k").collect().map(_.getLong(0)).toSet

  test("pointer-guided cold read on an object-store scheme: ZERO _log " +
      "LISTs, O(tail) point lookups, content identical to the " +
      "authoritative listing path") {
    val layout = newLayout("ptr-probe")
    (0 until 12).foreach(k => Catalog.commitLake(spark, layout, oneRow(k.toLong)))
    Catalog.checkpoint(spark, layout)
    Catalog.pruneLog(spark, layout)
    (12 until 16).foreach(k => Catalog.commitLake(spark, layout, oneRow(k.toLong)))
    assert(new java.io.File(localLogDir(layout), "_last_checkpoint").exists(),
      "checkpoint() writes the pointer")
    // ONE log read (headVersion = exactly one readLog): the walk is
    // O(tail) point lookups — ≤ 3 stats per tail seq (.commit/.done/
    // .checkpoint) + the fold + the head miss, NEVER O(history)
    CountingLocalFs.reset()
    Catalog.headVersion(spark, layout)
    assert(CountingLocalFs.logLists.get == 0,
      s"no _log LIST on the pointer path (got ${CountingLocalFs.logLists.get})")
    val oneRead = CountingLocalFs.logStats.get
    assert(oneRead > 0 && oneRead <= 3 * 4 + 4,
      s"point lookups bounded by the tail for one log read: $oneRead")
    CountingLocalFs.reset()
    val viaProbe = keys(layout)
    assert(CountingLocalFs.logLists.get == 0,
      s"a full snapshot read stays LIST-free too " +
        s"(got ${CountingLocalFs.logLists.get})")
    // authority: delete the pointer — the full listing serves the
    // exact same state
    assert(new java.io.File(localLogDir(layout), "_last_checkpoint").delete())
    CountingLocalFs.reset()
    val viaList = keys(layout)
    assert(CountingLocalFs.logLists.get > 0, "listing fallback engaged")
    assert(viaProbe == viaList && viaProbe == (0L until 16L).toSet)
  }

  test("pointer anomalies all fall back to the listing, never to a " +
      "wrong state: torn content, a pointer at a MISSING checkpoint, " +
      "and a STALE pointer (older valid fold) each serve the full " +
      "correct state") {
    val layout = newLayout("ptr-anomaly")
    (0 until 6).foreach(k => Catalog.commitLake(spark, layout, oneRow(k.toLong)))
    val cp1 = Catalog.checkpoint(spark, layout).get
    (6 until 10).foreach(k => Catalog.commitLake(spark, layout, oneRow(k.toLong)))
    val cp2 = Catalog.checkpoint(spark, layout).get
    (10 until 12).foreach(k => Catalog.commitLake(spark, layout, oneRow(k.toLong)))
    val all = (0L until 12L).toSet
    val ptr = new java.io.File(localLogDir(layout), "_last_checkpoint")
    def writePtr(s: String): Unit =
      java.nio.file.Files.write(ptr.toPath, s.getBytes("UTF-8"))
    writePtr("garbage")
    assert(keys(layout) == all, "torn pointer → listing authority")
    writePtr("99999 500")
    assert(keys(layout) == all, "pointer at a missing checkpoint → listing")
    writePtr(s"$cp2") // no size hint: routes to the listing, stays correct
    assert(keys(layout) == all, "hint-less pointer → listing")
    // STALE pointer (an older but still-present fold): the probe walks
    // the longer tail over the older fold — a lossless replay that
    // parses to the identical state a listing would serve
    writePtr(s"$cp1 500")
    CountingLocalFs.reset()
    assert(keys(layout) == all, "stale pointer → correct state via probe")
    assert(CountingLocalFs.logLists.get == 0,
      "the stale-pointer read stayed on the probe path")
    assert(cp2 > cp1) // the fixture really has two folds
    // TORN newest fold AT the pointer (the crash-mid-write shape):
    // the probe must decline on VALIDITY, not mere existence — were
    // it existence-only, the downstream parse would find no valid
    // fold among the probed names and silently serve a tail-only
    // truncated state (review catch). The listing authority falls
    // back to the older valid fold and serves everything.
    writePtr(s"$cp2 500")
    val cp2File = new java.io.File(localLogDir(layout),
      f"$cp2%020d.checkpoint")
    val fullBody = java.nio.file.Files.readAllBytes(cp2File.toPath)
    java.nio.file.Files.write(cp2File.toPath,
      fullBody.dropRight(10)) // strip the #end terminator
    assert(keys(layout) == all, "torn fold at the pointer → listing")
    java.nio.file.Files.write(cp2File.toPath, fullBody)
  }

  test("round-14 (review catch): a concurrent fold+prune storm never " +
      "regresses the pointer below a prune horizon — the fold/prune " +
      "mutex serializes pointer writes with the deletes, so the " +
      "probe-served state stays exact throughout") {
    val layout = newLayout("ptr-race")
    (0 until 10).foreach(k =>
      Catalog.commitLake(spark, layout, oneRow(k.toLong)))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val folders = (1 to 2).map { _ =>
      new Thread(() => {
        try while (!stop.get()) {
          Catalog.checkpoint(spark, layout)
          Catalog.pruneLog(spark, layout)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    folders.foreach(_.start())
    (10 until 40).foreach { k =>
      Catalog.commitLake(spark, layout, oneRow(k.toLong))
      if (k % 7 == 0) {
        // mid-storm probe reads: every one must serve the full state
        assert(keys(layout) == (0L to k.toLong).toSet,
          s"probe state exact under the storm at $k")
      }
    }
    stop.set(true); folders.foreach(_.join(120000))
    assert(errs.isEmpty, errs.toString)
    assert(keys(layout) == (0L until 40L).toSet)
    // pointer names a VALID fold and never exceeds the head
    val ptr = new java.io.File(localLogDir(layout), "_last_checkpoint")
    val seq = new String(java.nio.file.Files.readAllBytes(ptr.toPath),
      "UTF-8").trim.split(' ').head.toLong
    assert(seq <= Catalog.headVersion(spark, layout))
  }

  test("pruneLog advances the pointer BEFORE deleting (the probe-" +
      "safety order), recreates a deleted pointer, and drops " +
      "superseded checkpoints keeping the latest two — with time " +
      "travel below the folds intact") {
    val layout = newLayout("ptr-prune")
    val versionAfter = scala.collection.mutable.Map[Int, Long]()
    (0 until 18).foreach { k =>
      Catalog.commitLake(spark, layout, oneRow(k.toLong))
      versionAfter(k) = Catalog.headVersion(spark, layout)
      if (k % 5 == 4) {
        Catalog.checkpoint(spark, layout)
        Catalog.pruneLog(spark, layout)
      }
    }
    val logDir = localLogDir(layout)
    val cps = logDir.listFiles().map(_.getName).filter(_.endsWith(".checkpoint"))
    assert(cps.length <= 2, s"superseded checkpoints dropped: ${cps.toSeq}")
    // pointer tracks the latest fold even after manual deletion
    val ptr = new java.io.File(logDir, "_last_checkpoint")
    assert(ptr.delete())
    Catalog.pruneLog(spark, layout)
    val latest = cps.map(_.stripSuffix(".checkpoint").toLong).max
    assert(new String(java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8")
      .trim.split(' ').head.toLong == latest,
      "pruneLog recreates the pointer at its horizon")
    // time travel below the dropped folds still serves each era
    Seq(2, 7, 13).foreach { k =>
      val got = Catalog.loadLakeSnapshot(spark, layout, versionAfter(k))
        .select("k").collect().map(_.getLong(0)).toSet
      assert(got == (0L to k.toLong).toSet,
        s"time travel to post-append-$k through dropped folds: $got")
    }
  }
}
