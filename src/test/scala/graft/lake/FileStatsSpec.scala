package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Log-resident file-skipping index: commitLake(statsCols) records
  * per-file min/max as fstat lines; lakeFilesOverlapping plans a
  * pruned read from the log alone, loadLakeRange stays exact (residual
  * filter + DV + schema evolution), and stats survive checkpoint
  * folds and file removals. */
class FileStatsSpec extends SparkTestBase {

  private def seed(layout: Layout): Unit = {
    val s = spark
    import s.implicits._
    // three commits with disjoint seq ranges -> three stats-bearing files
    Seq(Seq(("clicks", 0L, 10L), ("clicks", 9L, 11L)),
        Seq(("clicks", 100L, 20L), ("clicks", 109L, 21L)),
        Seq(("clicks", 200L, 30L), ("clicks", 209L, 31L)))
      .foreach { batch =>
        Catalog.commitLake(spark, layout,
          batch.toDF("source", "seq", "v").coalesce(1),
          statsCols = Seq("seq", "v"))
      }
  }

  test("pruned planning from the log; range read exact; no data file opened " +
      "for planning") {
    val layout = Layout(tmpDir("fstat-basic"))
    seed(layout)
    val all = Catalog.lakeFilesAsOf(spark, layout)
    assert(all.size == 3)
    assert(Catalog.lakeFileStatsAsOf(spark, layout).keySet == all.toSet,
      "every committed file carries stats")
    // a range inside the middle commit prunes to ONE file
    val keep = Catalog.lakeFilesOverlapping(spark, layout, "seq", 100L, 150L)
    assert(keep.size == 1, s"expected 1 overlapping file, got $keep")
    val df = Catalog.loadLakeRange(spark, layout, "seq", 100L, 150L)
    assert(df.select("seq").collect().map(_.getLong(0)).sorted.toSeq == Seq(100L, 109L))
    // the scan lists only the kept file
    val scanned = df.queryExecution.sparkPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.length
    }.sum
    assert(scanned == 1, s"the range scan must list 1 file, listed $scanned")
    // a range spanning nothing
    assert(Catalog.loadLakeRange(spark, layout, "seq", 500L, 600L).count() == 0)
    // residual exactness: a range cutting INTO a file still filters rows
    assert(Catalog.loadLakeRange(spark, layout, "seq", 105L, 300L)
      .select("seq").collect().map(_.getLong(0)).sorted.toSeq == Seq(109L, 200L, 209L))
    // string-typed bound on an incomparable column never skips
    assert(Catalog.lakeFilesOverlapping(spark, layout, "nope", 0L, 1L).size == 3)
  }

  test("stats survive the checkpoint fold and drop with removed files; " +
      "DV deletes apply inside the pruned read") {
    val layout = Layout(tmpDir("fstat-ckpt"))
    seed(layout)
    Catalog.deleteLakeWhere(spark, layout, col("seq") === 109L)
    assert(Catalog.checkpoint(spark, layout).isDefined)
    Catalog.pruneLog(spark, layout)
    // stats still plan after the fold
    assert(Catalog.lakeFilesOverlapping(spark, layout, "seq", 100L, 150L).size == 1)
    // and the DV'd row is excluded from the pruned read
    assert(Catalog.loadLakeRange(spark, layout, "seq", 100L, 150L)
      .select("seq").collect().map(_.getLong(0)).toSeq == Seq(100L))
    // materialize rewrites the DV'd file; its stats row drops with the file
    Catalog.materializeLakeDeletes(spark, layout)
    val live = Catalog.lakeFilesAsOf(spark, layout).toSet
    assert(Catalog.lakeFileStatsAsOf(spark, layout).keySet.subsetOf(live),
      "stats must never reference a removed file")
    // the rewritten file has no stats -> it is never skipped (sound)
    val keep = Catalog.lakeFilesOverlapping(spark, layout, "seq", 100L, 150L)
    assert(Catalog.loadLakeRange(spark, layout, "seq", 100L, 150L)
      .select("seq").collect().map(_.getLong(0)).toSeq == Seq(100L),
      s"pruned read stays exact over the stats-less rewrite (kept $keep)")
  }

  test("timestamp bounds compare against stored epoch millis") {
    val layout = Layout(tmpDir("fstat-ts"))
    val s = spark
    import s.implicits._
    Seq(Seq(("clicks", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))),
        Seq(("clicks", java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))))
      .foreach { b =>
        Catalog.commitLake(spark, layout,
          b.toDF("source", "ts").coalesce(1), statsCols = Seq("ts"))
      }
    val keep = Catalog.lakeFilesOverlapping(spark, layout, "ts",
      java.sql.Timestamp.valueOf("2024-05-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-07-01 00:00:00"))
    assert(keep.size == 1, s"timestamp pruning must drop the January file: $keep")
  }

  test("metadata-only count(*): exact from the log alone, DV-corrected, " +
      "time-travels, and refuses (None) when a live file lacks stats") {
    val layout = Layout(tmpDir("fstat-count"))
    seed(layout)
    val v3 = Catalog.headVersion(spark, layout)
    assert(Catalog.lakeCountFromLog(spark, layout) == Some(6L))
    // DV delete: count corrects WITHOUT opening any data file
    Catalog.deleteLakeWhere(spark, layout, col("seq") === 109L)
    assert(Catalog.lakeCountFromLog(spark, layout) == Some(5L))
    assert(Catalog.lakeCountFromLog(spark, layout, v3) == Some(6L), "time travel")
    assert(Catalog.loadLakeSnapshot(spark, layout).count() == 5L,
      "log count must agree with the scan")
    // a stats-less commit (upsert path) makes the metadata count refuse
    val s = spark
    import s.implicits._
    Catalog.upsertLakeByKey(spark, layout,
      Seq(("clicks", 300L, 40L)).toDF("source", "seq", "v"), keyCols = Seq("seq"))
    assert(Catalog.lakeCountFromLog(spark, layout).isEmpty,
      "a live file without stats must force the scan fallback, never guess")
    assert(Catalog.lakeCountFromLog(spark, layout, v3) == Some(6L),
      "older snapshots keep their metadata count")
  }

  test("metadata-only min/max: folds file stats when no DV is live, refuses " +
      "once a DV might have deleted the extremum") {
    val layout = Layout(tmpDir("fstat-minmax"))
    seed(layout)
    val got = Catalog.lakeMinMaxFromLog(spark, layout, "v")
    assert(got.isDefined)
    val (mn, mx) = got.get
    assert(mn.asInstanceOf[java.math.BigDecimal].longValueExact() == 10L)
    assert(mx.asInstanceOf[java.math.BigDecimal].longValueExact() == 31L)
    // deleting the max row via DV: per-file stats can't see it -> None
    val vPre = Catalog.headVersion(spark, layout)
    Catalog.deleteLakeWhere(spark, layout, col("v") === 31L)
    assert(Catalog.lakeMinMaxFromLog(spark, layout, "v").isEmpty,
      "stale metadata bounds after a DV delete would be WRONG — must refuse")
    assert(Catalog.lakeMinMaxFromLog(spark, layout, "v", vPre) == got,
      "pre-DV snapshots keep the metadata bounds")
    // materialize rewrites without stats -> still None (sound fallback)
    Catalog.materializeLakeDeletes(spark, layout)
    assert(Catalog.lakeMinMaxFromLog(spark, layout, "v").isEmpty)
  }

  test("bloom point skipping: high-cardinality keys prune to their file, " +
      "zero false negatives, over-cap files never skipped, point read exact") {
    val layout = Layout(tmpDir("fstat-bloom"))
    val s = spark
    import s.implicits._
    // three files with INTERLEAVED key ranges: min/max stats overlap on
    // every file, so any pruning below comes from the bloom alone
    val batches = Seq(
      (0 until 300).map(i => ("clicks", i * 7L, s"u${i * 7}")),
      (0 until 300).map(i => ("clicks", i * 7L + 1, s"u${i * 7 + 1}")),
      (0 until 300).map(i => ("clicks", i * 7L + 2, s"u${i * 7 + 2}")))
    batches.foreach { b =>
      Catalog.commitLake(spark, layout, b.toDF("source", "seq", "uid").coalesce(1),
        statsCols = Seq("seq"), bloomCols = Seq("uid", "seq"))
    }
    val all = Catalog.lakeFilesAsOf(spark, layout)
    assert(all.size == 3)
    // range stats CANNOT prune this lookup (interleaved ranges)...
    assert(Catalog.lakeFilesOverlapping(spark, layout, "seq", 701L, 701L).size == 3)
    // ...the bloom does: string and long columns both
    assert(Catalog.lakeFilesMatchingPoint(spark, layout, "uid", "u701").size == 1)
    assert(Catalog.lakeFilesMatchingPoint(spark, layout, "seq", 701L).size == 1)
    // zero false negatives: every committed key finds its file
    batches.flatten.foreach { case (_, seqV, uidV) =>
      assert(Catalog.lakeFilesMatchingPoint(spark, layout, "uid", uidV).nonEmpty)
      assert(Catalog.lakeFilesMatchingPoint(spark, layout, "seq", seqV).nonEmpty)
    }
    // point read is exact and scans only surviving files
    val hit = Catalog.loadLakePoint(spark, layout, "uid", "u701")
    assert(hit.select("seq").collect().map(_.getLong(0)).toSeq == Seq(701L))
    assert(hit.queryExecution.executedPlan.collectLeaves().mkString
      .split("parquet").length <= 2, "one surviving file in the scan")
    // blooms survive the checkpoint fold
    assert(Catalog.checkpoint(spark, layout).isDefined)
    Catalog.pruneLog(spark, layout)
    assert(Catalog.lakeFilesMatchingPoint(spark, layout, "uid", "u701").size == 1)
    // over-cap file: > maxDistinct values -> no bloom -> never skipped
    Catalog.commitLake(spark, layout,
      (0 until 2000).map(i => ("logs", 100000L + i, s"w$i"))
        .toDF("source", "seq", "uid").coalesce(1),
      bloomCols = Seq("uid"))
    assert(Catalog.lakeFilesMatchingPoint(spark, layout, "uid", "w1999")
      .exists(_.startsWith("source=logs")), "over-cap file must stay readable")
    assert(Catalog.loadLakePoint(spark, layout, "uid", "w1999").count() == 1)
    // a value present nowhere: the absent-everywhere lookup reads at
    // most the fp-rate tail, and the result is exactly empty
    assert(Catalog.loadLakePoint(spark, layout, "uid", "nosuchuser").count() == 0)
  }

  test("NULL-COUNT stats (round 13): IS NULL prunes proven-null-free " +
      "files, IS NOT NULL prunes all-null files, a range probe prunes " +
      "an all-null file — and legacy records without counts stay kept") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("fstat-nulls"))
    // file A: no nulls; file B: mixed; file C: all-null v
    Catalog.commitLake(spark, layout,
      Seq(("clicks", 1L, Some(10L)), ("clicks", 2L, Some(20L)))
        .toDF("source", "k", "v").coalesce(1), statsCols = Seq("v"))
    Catalog.commitLake(spark, layout,
      Seq(("clicks", 3L, Some(30L)), ("clicks", 4L, Option.empty[Long]))
        .toDF("source", "k", "v").coalesce(1), statsCols = Seq("v"))
    Catalog.commitLake(spark, layout,
      Seq(("clicks", 5L, Option.empty[Long]), ("clicks", 6L, Option.empty[Long]))
        .toDF("source", "k", "v").coalesce(1), statsCols = Seq("v"))
    val live = Catalog.lakeFilesAsOf(spark, layout)
    assert(live.size == 3)
    val wantNull = Catalog.lakeFilesForNullCheck(spark, layout, "v", wantNull = true)
    assert(wantNull.size == 2, s"IS NULL keeps B and C only: $wantNull")
    val wantVal = Catalog.lakeFilesForNullCheck(spark, layout, "v", wantNull = false)
    assert(wantVal.size == 2, s"IS NOT NULL keeps A and B only: $wantVal")
    // a range probe can prune the ALL-NULL file: no comparison matches NULL
    val range = Catalog.lakeFilesOverlapping(spark, layout, "v", 0L, 100L)
    assert(range.size == 2, s"range keeps A and B only: $range")
    // soundness: a column with NO recorded stats never prunes
    assert(Catalog.lakeFilesForNullCheck(spark, layout, "k", wantNull = true)
      .size == 3)
    // counts survive the checkpoint fold
    assert(Catalog.checkpoint(spark, layout).isDefined)
    Catalog.pruneLog(spark, layout)
    assert(Catalog.lakeFilesForNullCheck(spark, layout, "v", wantNull = true)
      .size == 2)
  }

  test("round-14 NESTED-FIELD stats: a dotted stats.cols path " +
      "('props.k') stats the struct leaf, range planning prunes by it " +
      "PHYSICALLY (deleted-bytes pin), and declaring an unknown root " +
      "refuses at SET time") {
    import org.apache.spark.sql.functions._
    val layout = Layout(tmpDir("fstat-nested"))
    def mk(lo: Long) = spark.range(lo, lo + 10).select(
      lit("clicks").as("source"), col("id"),
      struct(col("id").as("k"), concat(lit("u"), col("id")).as("tag"))
        .as("props")).coalesce(1)
    Catalog.commitLake(spark, layout, mk(0L), statsCols = Seq("props.k"))
    Catalog.commitLake(spark, layout, mk(100L), statsCols = Seq("props.k"))
    val stats = Catalog.lakeFileStatsAsOf(spark, layout)
    assert(stats.size == 2 && stats.values.forall(_.contains("\"props.k\"")),
      s"nested leaf stats recorded under the dotted key: $stats")
    val keep = Catalog.lakeFilesOverlapping(spark, layout, "props.k", 100L, 150L)
    assert(keep.size == 1, s"nested range prunes to one file: $keep")
    // declaration surface (BEFORE the deleted-bytes pin — SET-time
    // validation reads the live snapshot's schema): a dotted path with
    // a KNOWN root is declarable; an unknown root refuses; blooms stay
    // top-level
    Catalog.commitLakeAlter(spark, layout,
      setProps = Seq(Catalog.StatsColsProp -> "props.k"))
    intercept[IllegalArgumentException] {
      Catalog.commitLakeAlter(spark, layout,
        setProps = Seq(Catalog.StatsColsProp -> "nope.k"))
    }
    intercept[IllegalArgumentException] {
      Catalog.commitLakeAlter(spark, layout,
        setProps = Seq(Catalog.BloomColsProp -> "props.k"))
    }
    // warm the digest-keyed snapshot-plan memo while all bytes exist
    // (evolveFrame's born-schema derivation binds the FULL snapshot —
    // memory: plan-memo pin)
    assert(Catalog.loadLakeSnapshot(spark, layout).count() == 20)
    assert(Catalog.loadLakeRange(spark, layout, "props.k", 100L, 105L)
      .count() == 6)
    // PHYSICAL: delete the pruned file's bytes — the nested range scan
    // must still answer exactly; the unprunable full read fails loud
    val doomed = Catalog.lakeFilesAsOf(spark, layout)
      .filterNot(keep.contains)
    assert(doomed.size == 1)
    val fs = new org.apache.hadoop.fs.Path(layout.lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    doomed.foreach(rel => assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"${layout.lakeDir}/$rel"), false)))
    assert(Catalog.loadLakeRange(spark, layout, "props.k", 100L, 103L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(100L, 101L, 102L, 103L),
      "nested-stat skip is physical: the deleted file was never opened")
    intercept[Exception] {
      Catalog.loadLakeSnapshot(spark, layout).count()
    }
  }

  test("NULL-predicate SQL pushdown is PHYSICAL (round 13): the " +
      "null-free file's bytes are deleted and `WHERE v IS NULL` still " +
      "answers exactly — the pruned file is never opened; the " +
      "unpruned control predicate fails loud on the same table") {
    val s = spark
    import s.implicits._
    val root = tmpDir("fstat-null-sql")
    val layout = Layout(root)
    val cat = s"fns_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    Catalog.commitLakeAlter(spark, layout,
      addCols = Seq(("k", "BIGINT"), ("v", "BIGINT")))
    Catalog.commitLakeAlter(spark, layout,
      setProps = Seq(Catalog.StatsColsProp -> "v"))
    Catalog.commitLake(spark, layout, // null-free file (the prune target)
      (1L to 50L).map(k => ("clicks", k, Some(k * 10)))
        .toDF("source", "k", "v").coalesce(1))
    Catalog.commitLake(spark, layout, // the nulls live here
      Seq(("clicks", 100L, Option.empty[Long]), ("clicks", 101L, Some(7L)))
        .toDF("source", "k", "v").coalesce(1))
    // warm the digest-keyed snapshot-plan memo while all bytes exist
    // (statement ANALYSIS binds the full plan — memory: plan-memo pin)
    spark.sql(s"SELECT count(*) FROM $cat.lake").collect()
    val nullFree = Catalog.lakeFilesForNullCheck(spark, layout, "v",
      wantNull = true)
    val toDelete = Catalog.lakeFilesAsOf(spark, layout)
      .filterNot(nullFree.contains)
    assert(toDelete.size == 1)
    val fs = new org.apache.hadoop.fs.Path(layout.lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    toDelete.foreach(rel => assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"${layout.lakeDir}/$rel"), false)))
    val hit = spark.sql(s"SELECT k FROM $cat.lake WHERE v IS NULL").collect()
    assert(hit.map(_.getLong(0)).toSeq == Seq(100L),
      "IS NULL answered exactly without the deleted file")
    // control: a predicate the index cannot serve must try to read
    // the deleted bytes and fail loud — proving the skip was physical
    intercept[Exception] {
      spark.sql(s"SELECT sum(k) FROM $cat.lake WHERE v IS NOT NULL").collect()
    }
  }
}
