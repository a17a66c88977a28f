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
}
