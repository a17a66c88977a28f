package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** RESTORE TABLE — metadata-only rewind of the lake's live content to
  * an earlier version, as a new commit ([[Catalog.restoreLake]]):
  * content identity with the target version, history above it intact,
  * re-add/re-remove chains through the event-ordered live-set folds,
  * vacuum safety, checkpoint round-trip, the change feed's refusal to
  * span a restore, and Mv's rebuild across one. */
class RestoreSpec extends SparkTestBase {

  private def snap(layout: Layout, v: Long = Long.MaxValue): Seq[(String, String, Long)] = {
    val df =
      if (v == Long.MaxValue) Catalog.loadLakeSnapshot(spark, layout)
      else Catalog.loadLakeSnapshot(spark, layout, v)
    df.select("source", "key", "v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
  }

  test("restore rewinds content to the target version, metadata-only: " +
      "no data file is written, history above stays readable, and the " +
      "restore is itself one more time-travelable version") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("restore-basic"))
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "a", 1L), ("clicks", "b", 2L), ("views", "c", 3L))
        .toDF("source", "key", "v"))
    val v2 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "d", 4L), ("views", "e", 5L)).toDF("source", "key", "v"))
    val at2 = snap(layout)
    val v3 = Catalog.deleteLakeWhere(spark, layout, col("key") === "b")
    val v4 = Catalog.upsertLakeByKey(spark, layout,
      Seq(("clicks", "a", 100L), ("clicks", "f", 6L)).toDF("source", "key", "v"),
      keyCols = Seq("key"))
    assert(v1 < v2 && v2 < v3 && v3 < v4)
    val at4 = snap(layout)
    assert(at4 != at2)

    val filesPre = Catalog.lakeFilesAsOf(spark, layout).toSet
    val r = Catalog.restoreLake(spark, layout, v2)
    assert(r > v4)
    // content identity with the target version
    assert(snap(layout) == at2)
    // metadata-only: the live set is a subset of what existed — no new
    // data file was written by the restore
    assert(Catalog.lakeFilesAsOf(spark, layout).forall(rel =>
      filesPre.contains(rel) || rel.contains(f"c$v1%020d") ||
        rel.contains(f"c$v2%020d")))
    // history above the target is untouched below the restore
    assert(snap(layout, v3) == at2.filterNot(_._2 == "b"))
    assert(snap(layout, v4) == at4)
    // the restore is a version too
    assert(snap(layout, r) == at2)
    // and it is attributed in the history with its note
    val hist = Catalog.lakeHistory(spark, layout)
      .select("version", "note").collect()
      .map(row => (row.getLong(0), row.getString(1))).toMap
    assert(hist(r) == s"restore $v2")

    // restoring again to the same version is a no-op
    assert(Catalog.restoreLake(spark, layout, v2) == -1L)

    // UN-restore: restore forward to the pre-restore head — content
    // returns, the DV committed at v3 re-applies, the upsert rows too
    val r2 = Catalog.restoreLake(spark, layout, v4)
    assert(r2 > r)
    assert(snap(layout) == at4)
    // the first restore's view is still served below the second
    assert(snap(layout, r) == at2)
    // new writes continue normally on top
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "g", 7L)).toDF("source", "key", "v"))
    assert(snap(layout) == (at4 :+ (("clicks", "g", 7L))).sorted)
  }

  test("restore across OPTIMIZE re-adds the pre-compaction files and " +
      "drops the compacted one; content is identical either way") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("restore-opt"))
    (1 to 4).foreach(i => Catalog.commitLake(spark, layout,
      Seq(("clicks", s"k$i", i.toLong)).toDF("source", "key", "v")))
    val preOpt = Catalog.headVersion(spark, layout)
    val before = snap(layout)
    assert(Catalog.optimizeLake(spark, layout) > 0)
    val optFiles = Catalog.lakeFilesAsOf(spark, layout)
    assert(optFiles.size < 4)
    val r = Catalog.restoreLake(spark, layout, preOpt)
    assert(r > 0)
    assert(snap(layout) == before)
    // the file set is the pre-compaction one again
    assert(Catalog.lakeFilesAsOf(spark, layout).size == 4)
    // the optimized view is still served at its version
    assert(snap(layout, preOpt + 1) == before)
  }

  test("vacuum after a restore reclaims the rolled-back files but " +
      "never a re-added live one; a vacuumed target version refuses " +
      "restore loud, naming the missing files") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("restore-vac"))
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "a", 1L)).toDF("source", "key", "v"))
    val v2 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "b", 2L)).toDF("source", "key", "v"))
    // a compaction removes v1/v2's files; restore brings them back
    assert(Catalog.optimizeLake(spark, layout) > 0)
    val r = Catalog.restoreLake(spark, layout, v2)
    assert(r > 0)
    val at2 = snap(layout)
    // vacuum with zero grace: the compacted file (rolled back by the
    // restore) is reclaimable, the re-added live files are NOT
    val reclaimed = Catalog.vacuumLake(spark, layout, graceMs = 0L)
    assert(reclaimed >= 1, s"expected the rolled-back compacted file, got $reclaimed")
    assert(snap(layout) == at2, "vacuum deleted a re-added live file")

    // now make v-something unrestorable: optimize again, vacuum the
    // originals away, and ask for the pre-optimize version back
    assert(Catalog.optimizeLake(spark, layout) > 0)
    assert(Catalog.vacuumLake(spark, layout, graceMs = 0L) >= 1)
    val e = intercept[java.io.IOException](Catalog.restoreLake(spark, layout, v2))
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    assert(e.getMessage.contains("source="), s"names no file: ${e.getMessage}")
  }

  test("restore survives a checkpoint fold + log prune: the re-add is " +
      "an ordinary live-named L line, and time travel across the whole " +
      "chain still serves every version") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("restore-cp"))
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "a", 1L)).toDF("source", "key", "v"))
    val v2 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "b", 2L)).toDF("source", "key", "v"))
    val at2 = snap(layout)
    val v3 = Catalog.deleteLakeWhere(spark, layout, col("key") === "a")
    val at3 = snap(layout)
    val r = Catalog.restoreLake(spark, layout, v2)
    assert(snap(layout) == at2)
    assert(Catalog.checkpoint(spark, layout).nonEmpty)
    assert(Catalog.pruneLog(spark, layout) > 0)
    // folded state serves the same views at every version
    assert(snap(layout) == at2)
    assert(snap(layout, v2) == at2)
    assert(snap(layout, v3) == at3)
    assert(snap(layout, r) == at2)
    // and the event order survives the fold: a further delete + restore
    val v5 = Catalog.deleteLakeWhere(spark, layout, col("key") === "b")
    assert(snap(layout) == at2.filterNot(_._2 == "b"))
    assert(Catalog.restoreLake(spark, layout, r) > v5)
    assert(snap(layout) == at2)
  }

  test("the change feed REFUSES a range spanning a restore (a rewind " +
      "has no incremental delta) but serves ranges on either side; " +
      "Mv.refresh across one auto-rebuilds to the correct view") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("restore-cdf"))
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "a", 1L), ("clicks", "b", 2L)).toDF("source", "key", "v"))
    // an Mv maintained up to v1
    val stateDir = tmpDir("restore-mv-state")
    Mv.refresh(spark, layout, stateDir, Seq("source"), "v")
    val v2 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "c", 4L)).toDF("source", "key", "v"))
    val r = Catalog.restoreLake(spark, layout, v1)
    assert(r > v2)

    val e = intercept[java.io.IOException](
      Catalog.lakeChangesBetween(spark, layout, v1, r).collect())
    assert(e.getMessage.contains("RESTORE"), e.getMessage)
    // a range strictly below the restore still serves
    assert(Catalog.lakeChangesBetween(spark, layout, v1, v2).count() == 1)
    // new commits above the restore feed incrementally again
    val v4 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "d", 8L)).toDF("source", "key", "v"))
    assert(Catalog.lakeChangesBetween(spark, layout, r, v4)
      .filter(col("_change_type") === "insert").count() == 1)

    // Mv: the refresh across the restore takes the rebuild path and
    // lands on the restored truth (a + b + d)
    Mv.refresh(spark, layout, stateDir, Seq("source"), "v")
    val view = Mv.read(spark, stateDir).select("source", "n_rows", "sum_v")
      .collect().map(row => (row.getString(0), row.getLong(1), row.getLong(2))).toSeq
    assert(view == Seq(("clicks", 3L, 11L)), view.toString)
  }

  test("restore racing concurrent appenders: every attempt serializes " +
      "through the live-set recheck — the final history is a consistent " +
      "interleaving (each version's snapshot is exact, no torn state)") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("restore-race"))
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "seed", 0L)).toDF("source", "key", "v"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // an appender committing 6 batches while a restorer rewinds to v1
    // twice — the restore must either win a clean slot (content == v1
    // state at its commit) or exhaust retries loudly, never commit a
    // half-reconciled set
    // harsher than the original catch (a lock-free append landing
    // between restore's recheck and its claim): 10 appends, 3 restore
    // attempts, minimal stagger — the optimistic claim at head+1 must
    // refuse every interleaving it did not see
    val appender = Future {
      (1 to 10).map { i =>
        Catalog.commitLake(spark, layout,
          Seq(("clicks", s"k$i", i.toLong)).toDF("source", "key", "v"))
      }
    }
    val restorer = Future {
      (1 to 3).map { _ =>
        Thread.sleep(50)
        try Some(Catalog.restoreLake(spark, layout, v1)).filter(_ > 0)
        catch { case e: java.io.IOException
            if e.getMessage.contains("restoreLake") => None }
      }
    }
    val appends = Await.result(appender, 180.seconds)
    val restores = Await.result(restorer, 180.seconds).flatten
    // every restore that committed must serve EXACTLY the v1 content
    // at its own version — nothing torn, regardless of interleaving
    restores.foreach { r =>
      assert(snap(layout, r) == Seq(("clicks", "seed", 0L)),
        s"restore at $r is not the v1 state")
    }
    // and every append's own version is intact (snapshot isolation
    // across the rewinds: appended keys present at their commit seq)
    appends.zipWithIndex.foreach { case (seq, i) =>
      assert(snap(layout, seq).contains(("clicks", s"k${i + 1}", (i + 1).toLong)),
        s"append $seq lost its row")
    }
    assert(appends.size == 10)
    // the head equals the last event in seq order, recomputed from the
    // log itself — the ultimate consistency check
    val headV = Catalog.headVersion(spark, layout)
    assert(snap(layout) == snap(layout, headV))
  }
}
