package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Committed lake OPTIMIZE ([[Catalog.optimizeLake]]): small files
  * bin-pack into one atomic commit with the live view provably
  * unchanged, DVs materialize away in the same record, repeated runs
  * converge, Z-order re-clustering tightens per-file stats on BOTH
  * dimensions, and time travel below the rewrite is intact. */
class OptimizeLakeSpec extends SparkTestBase {

  private def liveRows(layout: Layout): Seq[String] =
    Catalog.loadLakeSnapshot(spark, layout)
      .select("source", "k", "v").collect().map(_.toString).sorted.toSeq

  test("bin-pack: small files coalesce atomically, live view unchanged, " +
      "DV-deleted rows materialize away, re-run converges, vacuum reclaims") {
    val layout = Layout(tmpDir("opt-pack"))
    val s = spark
    import s.implicits._
    // four 1-file commits to clicks, one to logs
    (0 until 4).foreach { i =>
      Catalog.commitLake(spark, layout,
        Seq(("clicks", i.toLong, i * 10L)).toDF("source", "k", "v").coalesce(1))
    }
    Catalog.commitLake(spark, layout,
      Seq(("logs", 9L, 90L)).toDF("source", "k", "v").coalesce(1))
    val vSeed = Catalog.headVersion(spark, layout)
    Catalog.deleteLakeWhere(spark, layout, col("k") === 2L)
    val before = liveRows(layout)
    val clicksBefore = Catalog.lakeFilesAsOf(spark, layout)
      .filter(_.startsWith("source=clicks")).toSet
    assert(clicksBefore.size == 4)

    val n = Catalog.optimizeLake(spark, layout)
    assert(n >= 4, s"both sources' small files rewritten, got $n")
    assert(liveRows(layout) == before, "OPTIMIZE must not change the live view")
    val clicksAfter = Catalog.lakeFilesAsOf(spark, layout)
      .filter(_.startsWith("source=clicks"))
    assert(clicksAfter.size == 1, s"4 small files pack into 1: $clicksAfter")
    assert(clicksAfter.toSet.intersect(clicksBefore).isEmpty, "originals removed")
    // the DV'd row was materialized away: no DV survives, and the
    // rewritten file genuinely lacks the row
    assert(Catalog.dvFilesAsOf(spark, layout).isEmpty, "stale DVs dropped")
    assert(spark.read.parquet(s"${layout.lakeDir}/${clicksAfter.head}")
      .filter(col("k") === 2L).isEmpty)
    // time travel below the optimize still sees the pre-delete rows
    assert(Catalog.loadLakeSnapshot(spark, layout, vSeed)
      .filter("k = 2").count() == 1)
    // converged: nothing left to do
    assert(Catalog.optimizeLake(spark, layout) == 0L)
    assert(liveRows(layout) == before)
    assert(Catalog.vacuumLake(spark, layout, graceMs = 0L) >= 5)
  }

  test("ZORDER re-cluster: per-file stats tighten on BOTH dimensions and " +
      "2-D point lookups prune more files; live view unchanged") {
    val layout = Layout(tmpDir("opt-z"))
    val s = spark
    import s.implicits._
    // rows arrive in INSERTION order: each commit spans the full (a, b)
    // space, so every file's min/max covers everything — the worst case
    // for skipping, the case OPTIMIZE ZORDER exists for
    val rows = (for (a <- 0 until 32; b <- 0 until 32) yield ("ev", a.toLong, b.toLong))
      .sortBy { case (_, a, b) => ((a * 37 + b * 17) % 101, a, b) }
    rows.grouped(256).foreach { chunk =>
      Catalog.commitLake(spark, layout,
        chunk.toDF("source", "a", "b").coalesce(1), statsCols = Seq("a", "b"))
    }
    val before = Catalog.loadLakeSnapshot(spark, layout)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def prunedCount(): Int =
      Catalog.lakeFilesOverlapping(spark, layout, "a", 3L, 4L).toSet
        .intersect(Catalog.lakeFilesOverlapping(spark, layout, "b", 3L, 4L).toSet).size
    val filesBefore = Catalog.lakeFilesAsOf(spark, layout).size
    assert(prunedCount() == filesBefore, "insertion order: nothing prunes")

    // target ~ quarter of the total bytes -> ~4 clustered output files
    val total = Catalog.lakeFilesAsOf(spark, layout).map(rel =>
      new java.io.File(s"${layout.lakeDir}/$rel").length).sum
    Catalog.optimizeLake(spark, layout, targetBytes = total / 4,
      zorder = Some(("a", "b")), statsCols = Seq("a", "b"))
    val after = Catalog.loadLakeSnapshot(spark, layout)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(after == before, "re-clustering must not change the live view")
    val filesAfter = Catalog.lakeFilesAsOf(spark, layout).size
    assert(filesAfter >= 2, s"expected a multi-file clustered layout, got $filesAfter")
    assert(prunedCount() < filesAfter,
      "a 2-D point range must now skip at least one clustered file")
  }
}
