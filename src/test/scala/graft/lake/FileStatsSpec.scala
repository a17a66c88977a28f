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
}
