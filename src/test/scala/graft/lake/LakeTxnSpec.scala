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
    val txnId = Catalog.pendingTransactions(spark, d).head._2
    val fs = new Path(d.lakeDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def dLegBytes(): Int = {
      val dir = new Path(s"${d.lakeDir}/source=s")
      fs.listStatus(dir).map(_.getPath.getName)
        .count(_.startsWith(f"c$legSeq%020d-"))
    }
    assert(dLegBytes() > 0)
    // recovery runs on table c ONLY (the realistic partial-cron case):
    // since round 14 the SIBLING SWEEP reclaims d's leg bytes in the
    // same call — no per-table resolve cadence needed
    Catalog.resolveTransactions(spark, c, olderThanMs = 0L)
    assert(dLegBytes() == 0,
      "c's resolve sweeps the sibling table's aborted-leg bytes")

    // -- checkpoint-time cleanup still backstops a resolver that died
    // BETWEEN the abort arbitration and its cleanup sweep --
    val (_, e, f) = twoTables("txn-rev2c")
    Catalog.commitLake(spark, e, df(Seq(("s", 1L, 10L))))
    Catalog.commitLake(spark, f, df(Seq(("s", 2L, 20L))))
    intercept[RuntimeException] {
      Catalog.commitLakeTransactionImpl(spark,
        Seq(e -> df(Seq(("s", 100L, 1L))), f -> df(Seq(("s", 200L, 2L)))),
        None, beforeBind = () => throw new RuntimeException("crash"))
    }
    val fLegSeq = Catalog.pendingTransactions(spark, f).head._1
    val fTxnId = Catalog.pendingTransactions(spark, f).head._2
    // the resolver's abort landed; its cleanup never ran (crash)
    val fTxnDir = new Path(s"${f.root.stripSuffix("/_tables/t_b")
      .replaceAll("/_tables/.*$", "")}/_txn")
    fs.mkdirs(fTxnDir)
    val out = fs.create(new Path(fTxnDir, s"$fTxnId.txn"), false)
    try out.write("abort".getBytes("UTF-8")) finally out.close()
    def fLegBytes(): Int = {
      val dir = new Path(s"${f.lakeDir}/source=s")
      fs.listStatus(dir).map(_.getPath.getName)
        .count(_.startsWith(f"c$fLegSeq%020d-"))
    }
    assert(fLegBytes() > 0)
    // routine maintenance on f (no resolveTransactions call): the
    // checkpoint must reclaim the bytes before fold+prune drops the
    // record — the only pointer to them
    Catalog.commitLake(spark, f, df(Seq(("s", 3L, 30L))))
    assert(Catalog.checkpoint(spark, f).isDefined)
    Catalog.pruneLog(spark, f)
    assert(fLegBytes() == 0,
      "checkpoint must clean aborted-leg bytes before the fold")
    assert(keys(f) == Set(2L, 3L))
    assert(txnId != fTxnId) // two independent fixtures, two txns
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

  test("round-14 MIXED-VERB transaction — the move shape ('delete " +
      "from A + insert into B'): a mid-txn reader sees NEITHER the DV " +
      "nor the insert; after the bind the row moved atomically; the " +
      "change feed emits the delete and the insert at their bound " +
      "versions") {
    val (_, a, b) = twoTables("txn-move")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L), ("s", 2L, 20L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 9L, 90L))))
    val bFrom = Catalog.headVersion(spark, b)
    val aFrom = Catalog.headVersion(spark, a)
    import org.apache.spark.sql.functions.col
    var during: Option[(Set[Long], Set[Long])] = None
    val seqs = Catalog.commitLakeTransactionLegsImpl(spark, Seq(
      Catalog.TxnLeg(a, deleteWhere = Some(col("k") === 1L)),
      Catalog.TxnLeg(b, batch = Some(df(Seq(("s", 1L, 10L)))))),
      None, beforeBind = () => { during = Some((keys(a), keys(b))) })
    assert(seqs.size == 2 && seqs.forall(_ > 0))
    assert(during.contains((Set(1L, 2L), Set(9L))),
      s"mid-txn: neither the DV nor the insert is visible: $during")
    assert(keys(a) == Set(2L), "the moved row left A atomically")
    assert(keys(b) == Set(9L, 1L), "and arrived in B atomically")
    // CDF: A emits the delete at its bound version, B the insert
    val aCh = Catalog.lakeChangesBetween(spark, a, aFrom).collect()
    assert(aCh.exists(r => r.getAs[String]("_change_type") == "delete" &&
      r.getAs[Long]("_commit_version") == seqs.head))
    val bCh = Catalog.lakeChangesBetween(spark, b, bFrom).collect()
    assert(bCh.exists(r => r.getAs[String]("_change_type") == "insert" &&
      r.getAs[Long]("_commit_version") == seqs(1) &&
      r.getAs[Long]("k") == 1L))
  }

  test("round-14 mixed-verb ABORT: a crash before the bind leaves " +
      "both the DV and the insert invisible forever; resolve cleans " +
      "the DV bytes AND — called on ONE table only — sweeps the " +
      "SIBLING leg's bytes too (advice-r13 sibling sweep)") {
    val (_, a, b) = twoTables("txn-move-abort")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L), ("s", 2L, 20L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 9L, 90L))))
    import org.apache.spark.sql.functions.col
    intercept[RuntimeException] {
      Catalog.commitLakeTransactionLegsImpl(spark, Seq(
        Catalog.TxnLeg(a, deleteWhere = Some(col("k") === 1L)),
        Catalog.TxnLeg(b, batch = Some(df(Seq(("s", 1L, 10L)))))),
        None, beforeBind = () => throw new RuntimeException("crash"))
    }
    assert(keys(a) == Set(1L, 2L), "the unbound DV must not delete")
    assert(keys(b) == Set(9L), "the unbound insert must not appear")
    val aLegSeq = Catalog.pendingTransactions(spark, a).head._1
    val bLegSeq = Catalog.pendingTransactions(spark, b).head._1
    val fs = new Path(a.lakeDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def legFiles(l: Layout, seq: Long): Seq[String] = {
      Seq(s"${l.lakeDir}/source=s", s"${l.lakeDir}/_dv").flatMap { d =>
        val p = new Path(d)
        if (!fs.exists(p)) Seq.empty
        else fs.listStatus(p).map(_.getPath.getName)
          .filter(_.startsWith(f"c$seq%020d-")).toSeq
      }
    }
    assert(legFiles(a, aLegSeq).nonEmpty, "A's DV leg published bytes")
    assert(legFiles(b, bLegSeq).nonEmpty, "B's insert leg published bytes")
    // resolve on A ONLY: the sibling sweep must reclaim B's leg too
    Catalog.resolveTransactions(spark, a, olderThanMs = 0L)
    assert(legFiles(a, aLegSeq).isEmpty, "A's aborted DV bytes reclaimed")
    assert(legFiles(b, bLegSeq).isEmpty,
      "B's aborted leg bytes reclaimed by A's resolve (sibling sweep)")
    assert(keys(a) == Set(1L, 2L) && keys(b) == Set(9L))
    // the whole transaction retries cleanly after the abort
    val seqs = Catalog.commitLakeTransactionLegs(spark, Seq(
      Catalog.TxnLeg(a, deleteWhere = Some(col("k") === 1L)),
      Catalog.TxnLeg(b, batch = Some(df(Seq(("s", 1L, 10L)))))))
    assert(seqs.forall(_ > 0) && keys(a) == Set(2L) && keys(b) == Set(9L, 1L))
  }

  test("round-14 guardrails: an empty leg refuses; a delete-leg " +
      "whose predicate matches NOTHING still binds (the txn is " +
      "atomic, not conditional); a combined append+delete leg on one " +
      "table works (CDC reconciliation shape)") {
    val (_, a, b) = twoTables("txn-mixed-guard")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 9L, 90L))))
    import org.apache.spark.sql.functions.col
    intercept[IllegalArgumentException] {
      Catalog.commitLakeTransactionLegs(spark, Seq(Catalog.TxnLeg(a)))
    }
    // no-match delete + insert: still atomic, still bound
    val s1 = Catalog.commitLakeTransactionLegs(spark, Seq(
      Catalog.TxnLeg(a, deleteWhere = Some(col("k") === 777L)),
      Catalog.TxnLeg(b, batch = Some(df(Seq(("s", 10L, 100L)))))))
    assert(s1.forall(_ > 0) && keys(a) == Set(1L) && keys(b) == Set(9L, 10L))
    // one leg carrying BOTH verbs: replace A's k=1 with k=5 while
    // appending k=11 to B
    val s2 = Catalog.commitLakeTransactionLegs(spark, Seq(
      Catalog.TxnLeg(a, batch = Some(df(Seq(("s", 5L, 50L)))),
        deleteWhere = Some(col("k") === 1L)),
      Catalog.TxnLeg(b, batch = Some(df(Seq(("s", 11L, 110L)))))))
    assert(s2.forall(_ > 0))
    assert(keys(a) == Set(5L) && keys(b) == Set(9L, 10L, 11L))
    assert(Catalog.pendingTransactions(spark, a).isEmpty)
  }

  test("round-14: a txn marker read MID-BIND (the name exists, the " +
      "body not yet streamed — the HDFS-shape claim window) is " +
      "RETRIED, not fatal: the reader resolves once the body lands; " +
      "persistent garbage still refuses loud after the retry budget") {
    val (_, a, b) = twoTables("txn-midbind")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 2L, 20L))))
    intercept[RuntimeException] {
      Catalog.commitLakeTransactionImpl(spark,
        Seq(a -> df(Seq(("s", 100L, 1L))), b -> df(Seq(("s", 200L, 2L)))),
        None, beforeBind = () => throw new RuntimeException("crash"))
    }
    val id = Catalog.pendingTransactions(spark, a).head._2
    val fs = new Path(a.lakeDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val marker = new Path(Catalog.txnDirOf(a), s"$id.txn")
    fs.mkdirs(Catalog.txnDirOf(a))
    // the mid-bind window, held open deliberately: the marker NAME is
    // visible with an empty body; "commit" streams in ~120 ms later
    val out = fs.create(marker, false)
    val late = new Thread(() => {
      Thread.sleep(120L)
      try out.write("commit".getBytes("UTF-8")) finally out.close()
    })
    late.start()
    try {
      // a reader polling now lands inside the window — it must WAIT
      // OUT the stream rather than die loud (round-14 regression: a
      // live stream's poll read '' mid-bind and terminated)
      assert(keys(a) == Set(1L, 100L), "resolved once the body landed")
      assert(keys(b) == Set(2L, 200L))
    } finally late.join(5000L)
    assert(Catalog.pendingTransactions(spark, a).isEmpty)

    // persistent garbage: a fully-written junk marker is TORN, loud
    val (_, c, d) = twoTables("txn-midbind-garbage")
    Catalog.commitLake(spark, c, df(Seq(("s", 1L, 10L))))
    Catalog.commitLake(spark, d, df(Seq(("s", 2L, 20L))))
    intercept[RuntimeException] {
      Catalog.commitLakeTransactionImpl(spark,
        Seq(c -> df(Seq(("s", 100L, 1L))), d -> df(Seq(("s", 200L, 2L)))),
        None, beforeBind = () => throw new RuntimeException("crash"))
    }
    val gid = Catalog.pendingTransactions(spark, c).head._2
    val gm = new Path(Catalog.txnDirOf(c), s"$gid.txn")
    val gout = fs.create(gm, false)
    try gout.write("banana".getBytes("UTF-8")) finally gout.close()
    val e = intercept[java.io.IOException](keys(c))
    assert(e.getMessage.contains("banana") &&
      e.getMessage.contains("after retries"), e.getMessage)
  }

  test("round-14 moveLakeRows: the atomic quarantine primitive — " +
      "matching rows leave A and land in B exactly once, the CDF " +
      "tells the truth on both ends, a no-match move is a no-op, and " +
      "the guardrails refuse same-table and cross-root moves") {
    import org.apache.spark.sql.functions.col
    val (_, a, b) = twoTables("txn-mvapi")
    Catalog.commitLake(spark, a, df(Seq(("s", 1L, 10L), ("s", 2L, 20L),
      ("s", 3L, 30L), ("s", 4L, 40L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 9L, 90L))))
    val aFrom = Catalog.headVersion(spark, a)
    val bFrom = Catalog.headVersion(spark, b)
    val (s1, s2) = Catalog.moveLakeRows(spark, a, b, col("k") % 2 === 0)
    assert(s1 > 0 && s2 > 0)
    assert(keys(a) == Set(1L, 3L) && keys(b) == Set(9L, 2L, 4L))
    val aCh = Catalog.lakeChangesBetween(spark, a, aFrom).collect()
    assert(aCh.count(_.getAs[String]("_change_type") == "delete") == 2)
    val bCh = Catalog.lakeChangesBetween(spark, b, bFrom).collect()
    assert(bCh.count(_.getAs[String]("_change_type") == "insert") == 2)
    // no-match: nothing claims, versions unchanged
    val head = (Catalog.headVersion(spark, a), Catalog.headVersion(spark, b))
    assert(Catalog.moveLakeRows(spark, a, b, col("k") === 777L) ==
      ((-1L, -1L)))
    assert((Catalog.headVersion(spark, a),
      Catalog.headVersion(spark, b)) == head)
    intercept[IllegalArgumentException] {
      Catalog.moveLakeRows(spark, a, a, col("k") === 1L)
    }
    val elsewhere = Layout(s"${tmpDir("txn-mv-otherroot")}/_tables/t_x")
    intercept[IllegalArgumentException] {
      Catalog.moveLakeRows(spark, a, elsewhere, col("k") === 1L)
    }
  }

  test("round-14 moveLakeRows EXACTNESS: a DELETE racing the pre-lock " +
      "window shrinks the insert batch and the deletion vector in " +
      "LOCKSTEP — the already-deleted row is neither resurrected into " +
      "B nor double-retracted from A") {
    import org.apache.spark.sql.functions.col
    val (_, a, b) = twoTables("txn-mvrace")
    Catalog.commitLake(spark, a, df(Seq(("s", 2L, 20L), ("s", 3L, 30L),
      ("s", 4L, 40L))))
    Catalog.commitLake(spark, b, df(Seq(("s", 9L, 90L))))
    val aFrom = Catalog.headVersion(spark, a)
    // the race: after the move's matched-row scan pinned {2, 4}, a
    // concurrent DELETE commits k=4 before the move takes its locks
    val (s1, s2) = Catalog.moveLakeRowsImpl(spark, a, b,
      col("k") % 2 === 0, None, 10 * 60 * 1000L, 60 * 1000L,
      beforeLocks = () =>
        Catalog.deleteLakeWhere(spark, a, col("k") === 4L))
    assert(s1 > 0 && s2 > 0)
    assert(keys(a) == Set(3L), "both evens left A (one by the racing " +
      "delete, one by the move)")
    assert(keys(b) == Set(9L, 2L),
      "ONLY the still-live row moved — k=4 was deleted, not moved, " +
        s"and must not resurrect into B: ${keys(b)}")
    // A's CDF across the window: k=4 deleted EXACTLY once (the racing
    // delete), k=2 exactly once (the move) — no double retraction
    val dels = Catalog.lakeChangesBetween(spark, a, aFrom).collect()
      .filter(_.getAs[String]("_change_type") == "delete")
      .map(_.getAs[Long]("k")).toSeq.sorted
    assert(dels == Seq(2L, 4L), s"each delete exactly once: $dels")
  }

  test("round-14 MOVE statement: SQL `MOVE a TO b WHERE …` runs the " +
      "atomic move, EXPLAIN plans it without moving anything, and a " +
      "non-graft target delegates") {
    val root = tmpDir("txn-mvsql")
    val cat = s"mv_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.ev (k BIGINT, v BIGINT, source STRING) " +
      "PARTITIONED BY (source)")
    spark.sql(s"CREATE TABLE $cat.quar (k BIGINT, v BIGINT, source STRING) " +
      "PARTITIONED BY (source)")
    (1 to 6).foreach(k =>
      spark.sql(s"INSERT INTO $cat.ev VALUES ($k, ${k * 10}, 's')"))
    // EXPLAIN is side-effect-free
    spark.sql(s"EXPLAIN MOVE $cat.ev TO $cat.quar WHERE k > 4").collect()
    assert(spark.sql(s"SELECT count(*) FROM $cat.quar").head.getLong(0) == 0L)
    val out = spark.sql(s"MOVE $cat.ev TO $cat.quar WHERE k > 4").head
    assert(out.getString(0) == "move" && out.getLong(1) > 0 &&
      out.getLong(2) > 0)
    assert(spark.sql(s"SELECT k FROM $cat.ev ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(spark.sql(s"SELECT k FROM $cat.quar ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(5L, 6L))
    // a foreign catalog's MOVE is not ours to execute
    spark.conf.set("spark.sql.catalog.fmove", "org.example.OtherCatalog")
    try {
      val e = intercept[Exception] {
        spark.sql("MOVE fmove.a TO fmove.b WHERE k = 1").collect()
      }
      assert(!e.getMessage.contains("no graft table"), e.getMessage)
    } finally spark.conf.unset("spark.sql.catalog.fmove")
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
