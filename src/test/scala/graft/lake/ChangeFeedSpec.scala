package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Change data feed on the manifest log ([[Catalog.lakeChangesBetween]])
  * and the incrementally-maintained view it feeds ([[Mv]]): inserts from
  * appended files, deletes re-read from DV positions, rewrites
  * (compaction/materialize/erase) contribute nothing, feed replay
  * reproduces the snapshot, attribution survives checkpoint+prune, and
  * vacuumed ranges fail LOUD. */
class ChangeFeedSpec extends SparkTestBase {

  private def changes(layout: Layout, from: Long, to: Long = Long.MaxValue) =
    Catalog.lakeChangesBetween(spark, layout, from, to)
      .select("source", "key", "v", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
      .sortBy(t => (t._5, t._4, t._2))
      .toSeq

  test("append/delete/upsert emit exact row-level changes; materialize " +
      "emits nothing; replaying the feed reproduces the snapshot") {
    val layout = Layout(tmpDir("cdf-basic"))
    val s = spark
    import s.implicits._
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L)).toDF("source", "key", "v"))
    val v2 = Catalog.commitLake(spark, layout,
      Seq(("logs", "k3", 30L)).toDF("source", "key", "v"))
    val v3 = Catalog.deleteLakeWhere(spark, layout, col("key") === "k2")
    val v4 = Catalog.upsertLakeByKey(spark, layout,
      Seq(("clicks", "k1", 11L), ("logs", "k9", 90L)).toDF("source", "key", "v"),
      keyCols = Seq("key"))
    assert(changes(layout, 0L) == Seq(
      ("clicks", "k1", 10L, "insert", v1), ("clicks", "k2", 20L, "insert", v1),
      ("logs", "k3", 30L, "insert", v2),
      ("clicks", "k2", 20L, "delete", v3),
      ("clicks", "k1", 10L, "delete", v4), ("clicks", "k1", 11L, "insert", v4),
      ("logs", "k9", 90L, "insert", v4)))

    // range slicing: only the commits inside (from, to]
    assert(changes(layout, v1, v2) == Seq(("logs", "k3", 30L, "insert", v2)))
    assert(changes(layout, v3) == Seq(
      ("clicks", "k1", 10L, "delete", v4), ("clicks", "k1", 11L, "insert", v4),
      ("logs", "k9", 90L, "insert", v4)))

    // a rewrite preserves the live view and must emit NOTHING
    assert(Catalog.materializeLakeDeletes(spark, layout) > 0)
    val head = Catalog.headVersion(spark, layout)
    assert(head > v4 && changes(layout, v4).isEmpty,
      "materialization is a logical no-op in the feed")

    // replay identity: inserts minus deletes == the live snapshot
    val feed = changes(layout, 0L)
    val replayed = feed.filter(_._4 == "insert").map(t => (t._1, t._2, t._3))
      .diff(feed.filter(_._4 == "delete").map(t => (t._1, t._2, t._3))).sorted
    val snap = Catalog.loadLakeSnapshot(spark, layout)
      .select("source", "key", "v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(replayed == snap)
  }

  test("attribution survives checkpoint fold + prune; evolved columns are " +
      "backfilled; empty range returns an empty typed frame") {
    val layout = Layout(tmpDir("cdf-ckpt"))
    val s = spark
    import s.implicits._
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L)).toDF("source", "key", "v"))
    Catalog.commitLakeAddColumn(spark, layout, "score", "bigint")
    val v3 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k2", 20L, 7L)).toDF("source", "key", "v", "score"))
    val before = changes(layout, 0L)
    assert(Catalog.checkpoint(spark, layout).isDefined)
    assert(Catalog.pruneLog(spark, layout) > 0)
    assert(changes(layout, 0L) == before, "per-seq attribution must survive the fold")
    // the pre-evolution insert carries a null-backfilled score
    val withScore = Catalog.lakeChangesBetween(spark, layout, 0L)
      .select("key", "score").collect().map(r =>
        (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
    assert(withScore == Seq(("k1", -1L), ("k2", 7L)))
    // a range with no commits
    val empty = Catalog.lakeChangesBetween(spark, layout, v3)
    assert(empty.isEmpty && empty.columns.contains("_change_type"))
    assert(v1 > 0)
  }

  test("a vacuumed range fails loud instead of silently dropping changes") {
    val layout = Layout(tmpDir("cdf-vac"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L)).toDF("source", "key", "v"))
    val v2 = Catalog.deleteLakeWhere(spark, layout, col("key") === "k2")
    Catalog.materializeLakeDeletes(spark, layout)
    Catalog.vacuumLake(spark, layout, graceMs = 0L)
    // the DV's target file (and the v1 insert file) are physically gone
    val e = intercept[java.io.IOException](changes(layout, 0L))
    assert(e.getMessage.contains("vacuumed"))
    // but ranges whose files survive still read fine
    assert(changes(layout, v2).isEmpty)
    val v4 = Catalog.commitLake(spark, layout,
      Seq(("logs", "k3", 30L)).toDF("source", "key", "v"))
    assert(changes(layout, v2) == Seq(("logs", "k3", 30L, "insert", v4)))
  }

  test("erase rewrites are never re-emitted: no feed range contains the " +
      "erased subject after the erase") {
    val layout = Layout(tmpDir("cdf-erase"))
    def rec(user: String, v: Int): String = s"""{"user":"$user","v":$v}"""
    val d = new java.io.File(layout.bronzeSourceDir("clicks")); d.mkdirs()
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(new java.io.File(d, "obj1.gz")))
    out.write((rec("A", 1) + rec("B", 2)).getBytes("UTF-8")); out.close()
    Ingest.ingestBatch(spark, layout, arrivalMs = 1704067200000L)
    val vIngest = Catalog.headVersion(spark, layout)
    val feedBefore = Catalog.lakeChangesBetween(spark, layout, 0L)
      .select("json", "_change_type").collect().map(r => (r.getString(0), r.getString(1)))
    assert(feedBefore.count(_._2 == "insert") == 2)
    Erase.eraseWhere(spark, layout, "clicks", Erase.jsonFieldEquals("user", "A"))
    // the post-erase tail emits nothing (rewrite), and re-reading the
    // pre-erase range fails LOUD (its file was physically deleted by the
    // erase) rather than replaying the subject's rows
    assert(Catalog.lakeChangesBetween(spark, layout, vIngest).isEmpty)
    val e = intercept[java.io.IOException](
      Catalog.lakeChangesBetween(spark, layout, 0L).collect())
    assert(e.getMessage.contains("vacuumed"))
  }

  test("Mv with trackExtrema: inserts tighten min/max algebraically, a " +
      "boundary delete triggers the key-pruned recompute, a non-boundary " +
      "delete does not, and every step equals the direct recompute") {
    val layout = Layout(tmpDir("cdf-mvx"))
    val stateDir = tmpDir("cdf-mvx-state")
    val s = spark
    import s.implicits._
    def direct(): Seq[(String, Long, Long, Long, Long)] =
      Catalog.loadLakeSnapshot(spark, layout).groupBy("source")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"), min("v").as("mn"), max("v").as("mx"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sorted.toSeq
    def view(): Seq[(String, Long, Long, Long, Long)] =
      Mv.read(spark, stateDir).select("source", "n_rows", "sum_v", "min_v", "max_v")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sorted.toSeq
    def refresh() = Mv.refresh(spark, layout, stateDir, Seq("source"), "v",
      trackExtrema = true)

    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 50L), ("clicks", "k3", 30L))
        .toDF("source", "key", "v"))
    refresh()
    assert(view() == direct())
    // insert a new max: algebraic tightening, no recompute needed
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k4", 99L)).toDF("source", "key", "v"))
    refresh()
    assert(view() == direct() && view().head._5 == 99L)
    // delete a NON-boundary row: count/sum retract, extrema stand
    Catalog.deleteLakeWhere(spark, layout, col("key") === "k3")
    refresh()
    assert(view() == direct())
    // delete the MAX row: the boundary recompute path must fire and
    // find the true new max among the survivors
    Catalog.deleteLakeWhere(spark, layout, col("key") === "k4")
    refresh()
    assert(view() == direct() && view().head._5 == 50L)
    // upsert replacing the MIN with a larger value: delete at the min
    // boundary + insert, in one version
    Catalog.upsertLakeByKey(spark, layout,
      Seq(("clicks", "k1", 40L)).toDF("source", "key", "v"), keyCols = Seq("key"))
    refresh()
    assert(view() == direct() && view().head._4 == 40L)
    // rebuild agrees
    val st2 = tmpDir("cdf-mvx-state2")
    Mv.rebuild(spark, layout, st2, Seq("source"), "v", trackExtrema = true)
    assert(Mv.read(spark, st2).select("source", "n_rows", "sum_v", "min_v", "max_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq == direct())
  }

  test("versionAtTimestamp maps wall-clock times to versions (monotonized), " +
      "refuses pruned history loud, and returns None before the table existed") {
    val layout = Layout(tmpDir("cdf-tsasof"))
    val s = spark
    import s.implicits._
    assert(Catalog.versionAtTimestamp(spark, layout, System.currentTimeMillis()).isEmpty,
      "no log yet -> None")
    val t0 = System.currentTimeMillis()
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L)).toDF("source", "key", "v"))
    Thread.sleep(15)
    val tMid = System.currentTimeMillis()
    Thread.sleep(15)
    val v2 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k2", 20L)).toDF("source", "key", "v"))
    val tEnd = System.currentTimeMillis()
    assert(Catalog.versionAtTimestamp(spark, layout, tEnd) == Some(v2))
    assert(Catalog.versionAtTimestamp(spark, layout, tMid) == Some(v1))
    assert(Catalog.versionAtTimestamp(spark, layout, t0 - 1000).isEmpty,
      "before the first commit the table did not exist")
    // the mapping composes with snapshot reads
    val atMid = Catalog.versionAtTimestamp(spark, layout, tMid).get
    assert(Catalog.loadLakeSnapshot(spark, layout, atMid).count() == 1)
    // checkpoint+prune: retained tail still timestamp-addressable,
    // folded history refuses LOUD instead of guessing
    val v3 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k3", 30L)).toDF("source", "key", "v"))
    assert(Catalog.checkpoint(spark, layout).isDefined)
    Catalog.pruneLog(spark, layout)
    Thread.sleep(15)
    val v4 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k4", 40L)).toDF("source", "key", "v"))
    assert(Catalog.versionAtTimestamp(spark, layout,
      System.currentTimeMillis()) == Some(v4))
    intercept[java.io.IOException](
      Catalog.versionAtTimestamp(spark, layout, tMid))
    assert(v3 > v2)
  }

  test("Mv.refresh maintains count/sum incrementally through appends, " +
      "deletes and upserts; zero-count groups vanish; refresh is " +
      "idempotent; rebuild recovers after an unreadable feed") {
    val layout = Layout(tmpDir("cdf-mv"))
    val stateDir = tmpDir("cdf-mv-state")
    val s = spark
    import s.implicits._
    def direct(): Seq[(String, Long, Long)] = {
      val snap = Catalog.loadLakeSnapshot(spark, layout)
      if (snap.columns.isEmpty) Seq.empty
      else snap.groupBy("source").agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    }
    def view(): Seq[(String, Long, Long)] =
      Mv.read(spark, stateDir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq

    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L), ("logs", "k3", 30L))
        .toDF("source", "key", "v"))
    val vA = Mv.refresh(spark, layout, stateDir, Seq("source"), "v")
    assert(view() == direct())
    // idempotent: nothing new
    assert(Mv.refresh(spark, layout, stateDir, Seq("source"), "v") == vA)
    assert(view() == direct())

    Catalog.deleteLakeWhere(spark, layout, col("key") === "k2")
    Catalog.upsertLakeByKey(spark, layout,
      Seq(("logs", "k3", 31L), ("logs", "k4", 40L)).toDF("source", "key", "v"),
      keyCols = Seq("key"))
    Mv.refresh(spark, layout, stateDir, Seq("source"), "v")
    assert(view() == direct())

    // retract a whole group to zero: it must vanish from the view
    Catalog.deleteLakeWhere(spark, layout, col("source") === "clicks")
    Mv.refresh(spark, layout, stateDir, Seq("source"), "v")
    assert(view() == direct() && !view().exists(_._1 == "clicks"))

    // crash-sim: a half-written state directory (no _SUCCESS) is
    // invisible to readers — even named ABOVE the live version — and
    // the next refresh's sweep reclaims it
    new java.io.File(s"$stateDir/s99999999999999999999-crash").mkdirs()
    assert(view() == direct(), "an incomplete state dir must never be read")
    Catalog.commitLake(spark, layout, Seq(("web", "k9", 90L)).toDF("source", "key", "v"))
    Mv.refresh(spark, layout, stateDir, Seq("source"), "v")
    assert(view() == direct())
    assert(!new java.io.File(s"$stateDir/s99999999999999999999-crash").exists(),
      "the sweep reclaims incomplete state dirs")

    // after vacuum breaks the historical feed, rebuild re-derives from
    // the snapshot and refresh resumes from there
    Catalog.materializeLakeDeletes(spark, layout)
    Catalog.vacuumLake(spark, layout, graceMs = 0L)
    val freshState = tmpDir("cdf-mv-state2")
    intercept[java.io.IOException](
      Mv.refresh(spark, layout, freshState, Seq("source"), "v"))
    Mv.rebuild(spark, layout, freshState, Seq("source"), "v")
    assert(Mv.read(spark, freshState).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq == direct())
    Catalog.commitLake(spark, layout, Seq(("web", "k10", 5L)).toDF("source", "key", "v"))
    Mv.refresh(spark, layout, freshState, Seq("source"), "v")
    assert(Mv.read(spark, freshState).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq == direct())
  }
}
