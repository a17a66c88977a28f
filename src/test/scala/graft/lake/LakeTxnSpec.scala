package graft.lake

import graft.SparkTestBase
import org.apache.hadoop.fs.Path

/** Round-13: cross-table ATOMIC commit
  * ([[Catalog.commitLakeTransaction]]) — the reference recorder's
  * catalog-append + fan-out as one retried unit, generalized to N
  * created tables under one catalog root: readers see both legs or
  * neither, a crash between the claims and the bind recovers to a
  * permanent abort, and the single-name txn file arbitrates
  * bind-vs-abort races. */
class LakeTxnSpec extends SparkTestBase {

  private def twoTables(prefix: String): (String, Layout, Layout) = {
    val root = tmpDir(prefix)
    val a = Layout(s"$root/_tables/t_a")
    val b = Layout(s"$root/_tables/t_b")
    (root, a, b)
  }

  private def df(rows: Seq[(String, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("source", "k", "v")
  }

  private def keys(layout: Layout): Set[Long] =
    Catalog.loadLakeSnapshot(spark, layout) match {
      case d if d.columns.isEmpty => Set.empty
      case d => d.select("k").collect().map(_.getLong(0)).toSet
    }

  test("a two-table transaction is all-or-nothing: during the write " +
      "(legs claimed, bind not yet) BOTH tables serve the pre-txn " +
      "state; after the bind both serve the new one — no torn pair") {
    val (_, a, b) = twoTables("txn-atomic")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 2L, 20L))))
    var observedDuring: Option[(Set[Long], Set[Long])] = None
    val seqs = Catalog.commitLakeTransactionImpl(spark,
      Seq(a -> df(Seq(("s", 100L, 1L))), b -> df(Seq(("s", 200L, 2L)))),
      None, beforeBind = () => {
        observedDuring = Some((keys(a), keys(b)))
        // both legs are pending and observable as such
        assert(Catalog.pendingTransactions(spark, a).size == 1)
        assert(Catalog.pendingTransactions(spark, b).size == 1)
      })
    assert(seqs.size == 2 && seqs.forall(_ > 0))
    assert(observedDuring.contains((Set(1L), Set(2L))),
      s"a reader mid-transaction must see NEITHER leg: $observedDuring")
    // after the bind, WITHOUT any further commit (the memo-freshness
    // trap: the log listing did not change when the bind landed)
    assert(keys(a) == Set(1L, 100L))
    assert(keys(b) == Set(2L, 200L))
    assert(Catalog.pendingTransactions(spark, a).isEmpty)
  }

  test("crash between the claims and the bind: nothing is visible, " +
      "resolveTransactions aborts PERMANENTLY, a retry of the whole " +
      "transaction works, and numbering continued over the dead seqs") {
    val (_, a, b) = twoTables("txn-crash")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 2L, 20L))))
    val boom = intercept[RuntimeException] {
      Catalog.commitLakeTransactionImpl(spark,
        Seq(a -> df(Seq(("s", 100L, 1L))), b -> df(Seq(("s", 200L, 2L)))),
        None, beforeBind = () => throw new RuntimeException("crash"))
    }
    assert(boom.getMessage == "crash")
    assert(keys(a) == Set(1L) && keys(b) == Set(2L))
    // recovery (any caller, any table of the pair)
    val settled = Catalog.resolveTransactions(spark, a, olderThanMs = 0L)
    assert(settled.size == 1)
    Catalog.resolveTransactions(spark, b, olderThanMs = 0L)
    assert(Catalog.pendingTransactions(spark, a).isEmpty)
    assert(Catalog.pendingTransactions(spark, b).isEmpty)
    assert(keys(a) == Set(1L) && keys(b) == Set(2L),
      "aborted legs are invisible forever")
    // the retry binds cleanly; dead seqs were consumed, not reused
    val seqs = Catalog.commitLakeTransaction(spark,
      Seq(a -> df(Seq(("s", 100L, 1L))), b -> df(Seq(("s", 200L, 2L)))))
    assert(keys(a) == Set(1L, 100L) && keys(b) == Set(2L, 200L))
    assert(seqs.forall(_ >= 3L), s"numbering continues above dead seqs: $seqs")
  }

  test("bind-vs-abort races arbitrate on the single txn file: a " +
      "recovery abort landing first makes the writer's bind FAIL LOUD " +
      "(never a half-visible transaction)") {
    val (_, a, b) = twoTables("txn-race")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 2L, 20L))))
    val e = intercept[java.io.IOException] {
      Catalog.commitLakeTransactionImpl(spark,
        Seq(a -> df(Seq(("s", 100L, 1L))), b -> df(Seq(("s", 200L, 2L)))),
        None, beforeBind = () =>
          // recovery fires in the window before the bind
          Catalog.resolveTransactions(spark, a, olderThanMs = 0L))
    }
    assert(e.getMessage.contains("aborted by recovery"), e.getMessage)
    assert(keys(a) == Set(1L) && keys(b) == Set(2L))
  }

  test("a checkpoint never folds past an unresolved txn leg; a LATE " +
      "bind (after the crash, before recovery) still surfaces the leg, " +
      "and the next checkpoint folds it") {
    val (root, a, b) = twoTables("txn-cp")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 2L, 20L))))
    intercept[RuntimeException] {
      Catalog.commitLakeTransactionImpl(spark,
        Seq(a -> df(Seq(("s", 100L, 1L))), b -> df(Seq(("s", 200L, 2L)))),
        None, beforeBind = () => throw new RuntimeException("crash"))
    }
    Catalog.commitLake(spark, a, df(Seq(("s", 3L, 30L)))) // above the leg
    val pending = Catalog.pendingTransactions(spark, a)
    assert(pending.size == 1)
    val legSeq = pending.head._1
    // fold: must cap BELOW the pending leg even though later commits exist
    val cp = Catalog.checkpoint(spark, a)
    assert(cp.exists(_ < legSeq), s"checkpoint $cp must stop below $legSeq")
    Catalog.pruneLog(spark, a)
    assert(keys(a) == Set(1L, 3L))
    // late bind (the writer's bind finally lands — simulated directly)
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val txnFile = new Path(s"$root/_txn/${pending.head._2}.txn")
    val out = fs.create(txnFile, false)
    try out.write("commit".getBytes("UTF-8")) finally out.close()
    assert(keys(a) == Set(1L, 3L, 100L), "the late-bound leg surfaces")
    assert(keys(b) == Set(2L, 200L))
    // and now the fold proceeds over it
    val cp2 = Catalog.checkpoint(spark, a)
    assert(cp2.exists(_ >= legSeq), s"post-bind checkpoint $cp2")
    Catalog.pruneLog(spark, a)
    assert(keys(a) == Set(1L, 3L, 100L))
  }

  test("review catches (round 13): incremental consumers cap at " +
      "resolvedHead below a pending leg, the change feed REFUSES a " +
      "range spanning one, RESTORE refuses while one is in flight, " +
      "and a late bind is then lossless end-to-end") {
    val (root, a, b) = twoTables("txn-cdf")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 2L, 20L))))
    val preHead = Catalog.headVersion(spark, a)
    intercept[RuntimeException] {
      Catalog.commitLakeTransactionImpl(spark,
        Seq(a -> df(Seq(("s", 100L, 1L))), b -> df(Seq(("s", 200L, 2L)))),
        None, beforeBind = () => throw new RuntimeException("crash"))
    }
    val legSeq = Catalog.pendingTransactions(spark, a).head._1
    // ANOTHER commit lands above the leg — the trap: a cursor at
    // headVersion would skip the leg forever once it binds
    Catalog.commitLake(spark, a, df(Seq(("s", 3L, 30L))))
    assert(Catalog.headVersion(spark, a) > legSeq,
      "headVersion counts the fact-less leg (RESTORE head+1 claim)")
    assert(Catalog.resolvedHead(spark, a) == legSeq - 1,
      "the incremental cursor cap stops BELOW the pending leg")
    val feedErr = intercept[java.io.IOException] {
      Catalog.lakeChangesBetween(spark, a, preHead)
    }
    assert(feedErr.getMessage.contains("UNRESOLVED cross-table"))
    // reading up to resolvedHead stays served
    assert(Catalog.lakeChangesBetween(spark, a, preHead,
      Catalog.resolvedHead(spark, a)).columns.nonEmpty)
    val restoreErr = intercept[java.io.IOException] {
      Catalog.restoreLake(spark, a, preHead)
    }
    assert(restoreErr.getMessage.contains("unresolved cross-table"))
    // late bind → the consumer that waited at resolvedHead now reads
    // the leg's rows exactly once
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(
      s"$root/_txn/${Catalog.pendingTransactions(spark, a).head._2}.txn"),
      false)
    try out.write("commit".getBytes("UTF-8")) finally out.close()
    val resolved = Catalog.resolvedHead(spark, a)
    assert(resolved == Catalog.headVersion(spark, a))
    val feed = Catalog.lakeChangesBetween(spark, a, preHead, resolved)
    assert(feed.filter(feed("k") === 100L).count() == 1,
      "the late-bound leg's insert is emitted exactly once")
  }

  test("review catches (round 13): an ABORTED leg's published bytes " +
      "are deleted by resolveTransactions (vacuum can never reach " +
      "them); history annotates the leg; TIMESTAMP AS OF skips it; " +
      "RESTORE works with the aborted leg as the newest record") {
    val (_, a, b) = twoTables("txn-leak")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 2L, 20L))))
    val v1 = Catalog.headVersion(spark, a)
    intercept[RuntimeException] {
      Catalog.commitLakeTransactionImpl(spark,
        Seq(a -> df(Seq(("s", 100L, 1L))), b -> df(Seq(("s", 200L, 2L)))),
        None, beforeBind = () => throw new RuntimeException("crash"))
    }
    val legSeq = Catalog.pendingTransactions(spark, a).head._1
    val fs = new Path(a.lakeDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def legBytes(l: Layout): Seq[String] = {
      val dir = new Path(s"${l.lakeDir}/source=s")
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith(f"c$legSeq%020d-")).toSeq
    }
    assert(legBytes(a).nonEmpty, "the leg published physical bytes")
    Catalog.resolveTransactions(spark, a, olderThanMs = 0L)
    Catalog.resolveTransactions(spark, b, olderThanMs = 0L)
    assert(legBytes(a).isEmpty,
      "abort cleanup deletes the leg's unreachable bytes")
    assert(legBytes(b).isEmpty)
    // history names the abort instead of showing a normal version
    val hist = Catalog.lakeHistory(spark, a).collect()
    val legRow = hist.find(_.getLong(0) == legSeq).get
    assert(legRow.getString(11).contains("abort"),
      s"history must mark the aborted leg: ${legRow.getString(11)}")
    // TIMESTAMP AS OF never resolves to the aborted seq
    assert(!Catalog.versionAtTimestamp(spark, a,
      System.currentTimeMillis()).contains(legSeq))
    // RESTORE with the aborted (fact-less) leg as the NEWEST record:
    // the head+1 claim must not retry forever against its taken id
    assert(Catalog.restoreLake(spark, a, v1) == -1L ||
      keys(a) == Set(1L))
    Catalog.commitLake(spark, a, df(Seq(("s", 9L, 90L))))
    assert(Catalog.restoreLake(spark, a, v1) > 0)
    assert(keys(a) == Set(1L))
  }

  test("txn-marker retention: vacuumTransactions reclaims a marker " +
      "only once NO table's log tail references it (checkpoint-folded " +
      "everywhere) — and never one inside the grace window") {
    val (root, a, b) = twoTables("txn-vacuum")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 2L, 20L))))
    Catalog.commitLakeTransaction(spark,
      Seq(a -> df(Seq(("s", 100L, 1L))), b -> df(Seq(("s", 200L, 2L)))))
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def markers(): Int =
      Option(fs.listStatus(new Path(s"$root/_txn")))
        .map(_.count(_.getPath.getName.endsWith(".txn"))).getOrElse(0)
    assert(markers() == 1)
    // grace protects a fresh marker outright
    assert(Catalog.vacuumTransactions(spark, Layout(root)) == 0L)
    // grace 0 but table a's tail still references it → kept
    assert(Catalog.vacuumTransactions(spark, Layout(root), 0L) == 0L)
    assert(markers() == 1)
    // fold ONE table only: still referenced by the other's tail
    assert(Catalog.checkpoint(spark, a).isDefined)
    Catalog.pruneLog(spark, a)
    assert(Catalog.vacuumTransactions(spark, Layout(root), 0L) == 0L)
    // fold both: the marker carries no information — reclaimed, and
    // every read stays exact (the folded facts are plain history)
    assert(Catalog.checkpoint(spark, b).isDefined)
    Catalog.pruneLog(spark, b)
    assert(Catalog.vacuumTransactions(spark, Layout(root), 0L) == 1L)
    assert(markers() == 0)
    assert(keys(a) == Set(1L, 100L) && keys(b) == Set(2L, 200L))
  }

  test("second-review pins (round 13): a marker referenced by a " +
      "FOLDED-but-unpruned record survives vacuumTransactions (the " +
      "timestamp surface still consults it), and checkpoint cleans an " +
      "aborted leg's bytes BEFORE the fold can orphan them") {
    // -- marker liveness across checkpoint-without-prune --
    val (root, a, b) = twoTables("txn-rev2")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 2L, 20L))))
    Catalog.commitLakeTransaction(spark,
      Seq(a -> df(Seq(("s", 100L, 1L))), b -> df(Seq(("s", 200L, 2L)))))
    assert(Catalog.checkpoint(spark, a).isDefined)
    assert(Catalog.checkpoint(spark, b).isDefined)
    // records folded but RETAINED: the marker must survive a
    // zero-grace vacuum, or TIMESTAMP AS OF would stop resolving the
    // served txn version
    assert(Catalog.vacuumTransactions(spark, Layout(root), 0L) == 0L)
    val now = System.currentTimeMillis()
    assert(Catalog.versionAtTimestamp(spark, a, now).isDefined)
    Catalog.pruneLog(spark, a); Catalog.pruneLog(spark, b)
    assert(Catalog.vacuumTransactions(spark, Layout(root), 0L) == 1L)

    // -- checkpoint-time byte cleanup of an aborted leg --
    val (_, c, d) = twoTables("txn-rev2b")
    Catalog.commitLake(spark, c, df(Seq(("s", 1L, 10L))))
    Catalog.commitLake(spark, d, df(Seq(("s", 2L, 20L))))
    intercept[RuntimeException] {
      Catalog.commitLakeTransactionImpl(spark,
        Seq(c -> df(Seq(("s", 100L, 1L))), d -> df(Seq(("s", 200L, 2L)))),
        None, beforeBind = () => throw new RuntimeException("crash"))
    }
    val legSeq = Catalog.pendingTransactions(spark, d).head._1
    // recovery runs on table c ONLY (the realistic partial-cron case);
    // the shared abort makes d's leg aborted too, but nothing cleaned
    // d's bytes yet
    Catalog.resolveTransactions(spark, c, olderThanMs = 0L)
    val fs = new Path(d.lakeDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def dLegBytes(): Int = {
      val dir = new Path(s"${d.lakeDir}/source=s")
      fs.listStatus(dir).map(_.getPath.getName)
        .count(_.startsWith(f"c$legSeq%020d-"))
    }
    assert(dLegBytes() > 0)
    // routine maintenance on d (no resolveTransactions call): the
    // checkpoint must reclaim the bytes before fold+prune drops the
    // record — the only pointer to them
    Catalog.commitLake(spark, d, df(Seq(("s", 3L, 30L))))
    assert(Catalog.checkpoint(spark, d).isDefined)
    Catalog.pruneLog(spark, d)
    assert(dLegBytes() == 0,
      "checkpoint must clean aborted-leg bytes before the fold")
    assert(keys(d) == Set(2L, 3L))
  }

  test("guardrails: same table twice refuses; tables under DIFFERENT " +
      "catalog roots refuse (no shared txn namespace)") {
    val (_, a, _) = twoTables("txn-guard-1")
    val (_, c, _) = twoTables("txn-guard-2")
    intercept[IllegalArgumentException] {
      Catalog.commitLakeTransaction(spark,
        Seq(a -> df(Seq(("s", 1L, 1L))), a -> df(Seq(("s", 2L, 2L)))))
    }
    val e = intercept[IllegalArgumentException] {
      Catalog.commitLakeTransaction(spark,
        Seq(a -> df(Seq(("s", 1L, 1L))), c -> df(Seq(("s", 2L, 2L)))))
    }
    assert(e.getMessage.contains("one shared catalog root"))
  }

  test("declared table stats flow through txn legs: a point predicate " +
      "file-skips over a transactionally-committed file") {
    val (_, a, b) = twoTables("txn-stats")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L))))
    // declared BEFORE the seed so both files carry k stats
    Catalog.commitLakeAlter(spark, a,
      setProps = Seq(Catalog.StatsColsProp -> "k"))
    Catalog.commitLake(spark, a, df(Seq(("s", 5L, 50L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 2L, 20L))))
    Catalog.commitLakeTransaction(spark,
      Seq(a -> df(Seq(("s", 100L, 1L))), b -> df(Seq(("s", 200L, 2L)))))
    val overlapping = Catalog.lakeFilesOverlapping(spark, a, "k", 100L, 100L)
    // kept: the stat-less seed (sound) + the txn leg; pruned: k=5
    assert(overlapping.size == 2 && Catalog.lakeFilesAsOf(spark, a).size == 3,
      s"min/max stats from the txn leg must prune the k=5 file: $overlapping")
  }
}
