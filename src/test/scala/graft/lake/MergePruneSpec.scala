package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-12: dynamic file pruning generalized from the upsert's
  * single-key form to MERGE's ON condition — an equi-conjunct on a
  * stats column bounds the match scan to stats-overlapping files,
  * pinned physically (the excluded file's bytes are gone; an unpruned
  * scan would fail loud). */
class MergePruneSpec extends SparkTestBase {

  /** `beforeDelete` runs while both ranges physically exist — the SQL
    * test warms the catalog's digest-keyed snapshot-plan memo there
    * (statement ANALYSIS binds the full plan; EXECUTION must still
    * never open the pruned-out file). */
  private def buildLake(prefix: String,
      beforeDelete: Layout => Unit = _ => ()): Layout = {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir(prefix))
    Catalog.commitLake(spark, layout,
      (0L to 99L).map(k => ("clicks", k, k * 10)).toDF("source", "k", "v"),
      statsCols = Seq("k"))
    Catalog.commitLake(spark, layout,
      (1000L to 1099L).map(k => ("clicks", k, k * 10)).toDF("source", "k", "v"),
      statsCols = Seq("k"))
    beforeDelete(layout)
    val rangeA = Catalog.lakeFilesAsOf(spark, layout)
      .filter(_.contains(f"c${1L}%020d"))
    assert(rangeA.nonEmpty)
    val fs = new org.apache.hadoop.fs.Path(layout.lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    rangeA.foreach { rel =>
      assert(fs.delete(new org.apache.hadoop.fs.Path(
        s"${layout.lakeDir}/$rel"), false), rel)
    }
    layout
  }

  private def survivors(layout: Layout): Map[Long, Long] = {
    val live = Catalog.lakeFilesAsOf(spark, layout)
      .filterNot(_.contains(f"c${1L}%020d"))
    Catalog.lakeSnapshotWithPos(spark, layout, live)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  test("typed MERGE: the ON equi-conjunct prunes the match scan through " +
      "the skipping index — a stats-excluded file with deleted bytes is " +
      "never opened; all three arms exact") {
    val s = spark
    import s.implicits._
    val layout = buildLake("r12-merge-prune")
    val src = Seq(("clicks", 1005L, -1L, "U"), ("clicks", 1006L, 0L, "D"),
        ("clicks", 2000L, -2L, "I"))
      .toDF("source", "k", "v", "op")
    val seq = Merge.mergeIntoLake(spark, layout, src,
      on = col("t.k") === col("s.k"),
      matched = Seq(
        Merge.Delete(Some(col("s.op") === "D")),
        Merge.Update(Some(col("s.op") === "U"), Map("v" -> col("s.v")))),
      notMatched = Seq(Merge.Insert(None, Map(
        "source" -> col("s.source"), "k" -> col("s.k"), "v" -> col("s.v")))))
    assert(seq > 0)
    val post = survivors(layout)
    assert(post(1005L) == -1L)
    assert(!post.contains(1006L))
    assert(post(2000L) == -2L)
    assert(post(1007L) == 10070L)
    assert(post.size == 100, s"100 B-keys - 1 delete + 1 insert: ${post.size}")
  }

  test("SQL MERGE prunes identically (the statement path's rewritten " +
      "target refs extract); an un-prunable ON (no equi-conjunct) " +
      "still reads the full target") {
    val cat = s"gmp_${java.util.UUID.randomUUID().toString.take(8)}"
    val layout = buildLake("r12-merge-prune-sql", beforeDelete = { lay =>
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sql.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", lay.root)
      spark.sql(s"SELECT count(*) FROM $cat.lake").collect()
    })
    spark.sql(
      s"""MERGE INTO $cat.lake t
         |USING (SELECT 'clicks' src, 1005L kk, -1L vv) s
         |ON t.k = s.kk
         |WHEN MATCHED THEN UPDATE SET v = s.vv
         |WHEN NOT MATCHED THEN INSERT (source, k, v)
         |  VALUES (s.src, s.kk, s.vv)""".stripMargin)
    val post = survivors(layout)
    assert(post(1005L) == -1L)
    assert(post.size == 100)

    // an ON with no equi-conjunct must scan everything — here that
    // means opening range A's vanished bytes: fails LOUD, proving the
    // pruned merges above really skipped the file rather than the
    // predicate hiding it
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO $cat.lake t
         |USING (SELECT 1005L kk, -3L vv) s
         |ON t.k >= s.kk AND t.k <= s.kk
         |WHEN MATCHED THEN UPDATE SET v = s.vv""".stripMargin))
    assert(e.getMessage != null)
  }

  test("NOT MATCHED BY SOURCE disables pruning (those clauses read the " +
      "whole target): the merge fails loud on the vanished file instead " +
      "of silently treating its rows as not-matched") {
    val s = spark
    import s.implicits._
    val layout = buildLake("r12-merge-prune-nmbs")
    val src = Seq(("clicks", 1005L, -1L)).toDF("source", "k", "v")
    intercept[Exception] {
      Merge.mergeIntoLake(spark, layout, src,
        on = col("t.k") === col("s.k"),
        matched = Seq(Merge.Update(None, Map("v" -> col("s.v")))),
        notMatchedBySource = Seq(Merge.Delete(None)))
    }
  }

  test("a NONDETERMINISTIC merge source is materialized once (round 13): " +
      "the pruning aggregate and the action join read the SAME rows, so " +
      "a source whose re-execution would shift its key range can never " +
      "prune a file that holds its matched rows") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("r13-merge-src-mat"))
    Catalog.commitLake(spark, layout,
      (0L to 9L).map(k => ("clicks", k, k * 10)).toDF("source", "k", "v"),
      statsCols = Seq("k"))
    Catalog.commitLake(spark, layout,
      (1000L to 1009L).map(k => ("clicks", k, k * 10)).toDF("source", "k", "v"),
      statsCols = Seq("k"))
    // each full execution of the source yields a DIFFERENT key: run 1
    // → 5 (in file A's range), run 2 → 1005 (file B's) — without
    // materialization the pruner would see one range and the join the
    // other, dropping the matched row into the INSERT arm as a
    // duplicate
    val runs = new java.util.concurrent.atomic.AtomicLong(0L)
    val shifty = udf { () =>
      if (runs.incrementAndGet() == 1L) 5L else 1005L
    }.asNondeterministic()
    val src = spark.range(1)
      .select(lit("clicks").as("source"), shifty().as("k"), lit(-1L).as("v"))
    val seq = Merge.mergeIntoLake(spark, layout, src,
      on = col("t.k") === col("s.k"),
      matched = Seq(Merge.Update(None, Map("v" -> col("s.v")))),
      notMatched = Seq(Merge.Insert(None, Map(
        "source" -> col("s.source"), "k" -> col("s.k"), "v" -> col("s.v")))))
    assert(seq > 0)
    val all = Catalog.loadLakeSnapshot(spark, layout)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(all.length == 20,
      s"one UPDATE, zero inserts — a duplicate means the pruner and the " +
        s"join disagreed on the source: ${all.sorted.mkString(", ")}")
    assert(all.groupBy(_._1).forall(_._2.length == 1), "duplicate keys")
    assert(all.count(_._2 == -1L) == 1, "exactly one row updated")
    // and the staging copy is cleaned up
    val fs = new org.apache.hadoop.fs.Path(layout.lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedDir = new org.apache.hadoop.fs.Path(s"${layout.lakeDir}/_staged")
    assert(!fs.exists(stagedDir) || fs.listStatus(stagedDir).isEmpty)
  }

  test("all-NULL source key: the equi-conjunct matches nothing — the " +
      "scan prunes to zero files and the NOT-MATCHED arm still inserts") {
    val s = spark
    import s.implicits._
    val layout = buildLake("r12-merge-prune-null")
    val src = Seq(("clicks", Option.empty[Long], 7L)).toDF("source", "k", "v")
    val seq = Merge.mergeIntoLake(spark, layout, src,
      on = col("t.k") === col("s.k"),
      matched = Seq(Merge.Update(None, Map("v" -> col("s.v")))),
      notMatched = Seq(Merge.Insert(None, Map(
        "source" -> col("s.source"), "k" -> col("s.k"), "v" -> col("s.v")))))
    assert(seq > 0)
    val live = Catalog.lakeFilesAsOf(spark, layout)
      .filterNot(_.contains(f"c${1L}%020d"))
    val rows = Catalog.lakeSnapshotWithPos(spark, layout, live)
      .select("k", "v").collect()
    assert(rows.length == 100 + 1) // the null-keyed insert landed
    assert(rows.count(_.isNullAt(0)) == 1)
  }
}
