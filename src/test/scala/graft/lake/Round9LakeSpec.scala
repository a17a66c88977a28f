package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-9 lake hardening: concurrent-overlap DV dedup (writer-side
  * under-lock re-filter + reader-side distinct), the StreamUpsert
  * recover-before-marker ordering, Mv's loud missing-column error, and
  * optimizeLake's vanished-file discovery race. */
class Round9LakeSpec extends SparkTestBase {

  private def dvRows(layout: Layout): Seq[(String, Long, String)] = {
    val rels = Catalog.dvFilesAsOf(spark, layout)
    if (rels.isEmpty) return Seq.empty
    rels.flatMap { rel =>
      spark.read.parquet(s"${layout.lakeDir}/$rel").collect()
        .map(r => (r.getAs[String]("file"), r.getAs[Long]("pos"), rel))
    }
  }

  test("a duplicated (file, pos) across two DV files (pre-fix log shape) " +
      "subtracts once in lakeCountFromLog and emits one delete in the feed") {
    val layout = Layout(tmpDir("dv-dup"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L), ("clicks", "k3", 30L))
        .toDF("source", "key", "v").coalesce(1),
      statsCols = Seq("v"))
    val rel = Catalog.lakeFilesAsOf(spark, layout).head
    // raw API twice — simulates the pre-fix race where two overlapping
    // deletes committed the same position into two DV files
    val d1 = Catalog.commitLakeDeletes(spark, layout, Seq((rel, 0L)).toDF("file", "pos"))
    val d2 = Catalog.commitLakeDeletes(spark, layout, Seq((rel, 0L)).toDF("file", "pos"))
    assert(d1 > 0 && d2 > d1)
    assert(Catalog.loadLakeSnapshot(spark, layout).count() == 2L)
    assert(Catalog.lakeCountFromLog(spark, layout) == Some(2L),
      "metadata-only count must not double-subtract the duplicate")
    val feed = Catalog.lakeChangesBetween(spark, layout, 0L)
      .filter(col("_change_type") === "delete").collect()
    assert(feed.length == 1, s"one delete, not ${feed.length}")
    assert(feed.head.getAs[Long]("_commit_version") == d1,
      "the FIRST commit deleted the row; the duplicate changed nothing")
  }

  test("two concurrent overlapping deleteLakeWhere never double-commit " +
      "a position; count and feed stay exact") {
    val layout = Layout(tmpDir("dv-race"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      (1 to 40).map(i => ("clicks", s"k$i", i.toLong))
        .toDF("source", "key", "v").coalesce(1),
      statsCols = Seq("v"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // overlapping predicates: v in [1,30] and v in [11,40] — overlap 11..30
    val f1 = Future(Catalog.deleteLakeWhere(spark, layout, col("v") <= 30L))
    val f2 = Future(Catalog.deleteLakeWhere(spark, layout, col("v") >= 11L))
    Await.result(f1, 120.seconds); Await.result(f2, 120.seconds)
    val rows = dvRows(layout)
    val dups = rows.groupBy(t => (t._1, t._2)).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicated DV positions: ${dups.keys.take(3)}")
    assert(Catalog.loadLakeSnapshot(spark, layout).count() == 0L)
    assert(Catalog.lakeCountFromLog(spark, layout) == Some(0L))
    val dels = Catalog.lakeChangesBetween(spark, layout, 0L)
      .filter(col("_change_type") === "delete").count()
    assert(dels == 40L, s"exactly one delete per row, got $dels")
  }

  test("concurrent overlapping upsertLakeByKey: each superseded version " +
      "is DV'd exactly once across both commits") {
    val layout = Layout(tmpDir("upsert-race"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      (1 to 20).map(i => ("clicks", s"k$i", i.toLong))
        .toDF("source", "key", "v").coalesce(1))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // overlapping key sets: k1..k15 and k10..k20
    val f1 = Future(Catalog.upsertLakeByKey(spark, layout,
      (1 to 15).map(i => ("clicks", s"k$i", 100L + i)).toDF("source", "key", "v"),
      keyCols = Seq("key")))
    val f2 = Future(Catalog.upsertLakeByKey(spark, layout,
      (10 to 20).map(i => ("clicks", s"k$i", 200L + i)).toDF("source", "key", "v"),
      keyCols = Seq("key")))
    Await.result(f1, 120.seconds); Await.result(f2, 120.seconds)
    val rows = dvRows(layout)
    val dups = rows.groupBy(t => (t._1, t._2)).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicated DV positions: ${dups.keys.take(3)}")
    // every key resolves to exactly one live row (winner depends on
    // commit order — both orders are valid CDC outcomes)
    val perKey = Catalog.loadLakeSnapshot(spark, layout)
      .groupBy("key").count().collect()
    assert(perKey.forall(_.getLong(1) == 1L),
      s"torn key state: ${perKey.filter(_.getLong(1) != 1L).mkString(",")}")
  }

  test("StreamUpsert.applyBatchOnce recovers BEFORE the marker check: a " +
      "crash between CLAIM and publish is finished, then skipped — no " +
      "duplicate log version") {
    val layout = Layout(tmpDir("su-recover"))
    val cp = tmpDir("su-cp")
    val s = spark
    import s.implicits._
    val batch = Seq(("clicks", "k1", 1L, 1L), ("clicks", "k2", 2L, 1L))
      .toDF("source", "key", "v", "seq")
    assert(graft.streaming.StreamUpsert.applyBatchOnce(
      layout, batch, Seq("key"), "seq", cp, 0L))
    val v = Catalog.headVersion(spark, layout)
    // simulate the crash window: the commit is claimed but neither the
    // .done marker nor the batch marker exists yet
    val fs = new org.apache.hadoop.fs.Path(layout.catalogDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      f"${layout.catalogDir}/_log/$v%020d.done"), false)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$cp/_graft_upsert_markers/0"), false)
    val applied = graft.streaming.StreamUpsert.applyBatchOnce(
      layout, batch, Seq("key"), "seq", cp, 0L)
    assert(!applied, "recovery must recreate the marker and skip the batch")
    assert(Catalog.headVersion(spark, layout) == v, "no duplicate log version")
    assert(Catalog.loadLakeSnapshot(spark, layout).count() == 2L)
  }

  test("Mv.refresh throws loudly on a misspelled column once the feed " +
      "has a payload schema (and still no-ops on an empty lake)") {
    val layout = Layout(tmpDir("mv-loud"))
    val state = tmpDir("mv-loud-state")
    val s = spark
    import s.implicits._
    // empty lake: no payload schema yet — quiet no-op at version 0
    assert(Mv.refresh(spark, layout, state, Seq("nope"), "v") == 0L)
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L)).toDF("source", "key", "v"))
    val e = intercept[IllegalArgumentException](
      Mv.refresh(spark, layout, state, Seq("key"), "vv"))
    assert(e.getMessage.contains("vv"))
    val e2 = intercept[IllegalArgumentException](
      Mv.refresh(spark, layout, state, Seq("nope"), "v"))
    assert(e2.getMessage.contains("nope"))
    assert(Mv.refresh(spark, layout, state, Seq("key"), "v") > 0L)
  }

  test("optimizeLake discovery survives a file vanishing between the live " +
      "listing and the stat (treated as non-candidate, not a crash)") {
    val layout = Layout(tmpDir("opt-vanish"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 1L)).toDF("source", "key", "v").coalesce(1))
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k2", 2L)).toDF("source", "key", "v").coalesce(1))
    // make one committed file vanish WITHOUT a log record — the
    // worst-case discovery race shape (listing says live, stat fails)
    val fs = new org.apache.hadoop.fs.Path(layout.lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = Catalog.lakeFilesAsOf(spark, layout).head
    fs.delete(new org.apache.hadoop.fs.Path(s"${layout.lakeDir}/$victim"), false)
    // must not throw FileNotFoundException; with one survivor there is
    // nothing to pack (needs >= 2 candidates), so nothing is rewritten
    assert(Catalog.optimizeLake(spark, layout) == 0L)
  }
}
