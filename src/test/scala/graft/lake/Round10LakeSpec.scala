package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-10 lake fixes: change-feed DV dedup across the range
  * boundary, and retry backoff surfaces. */
class Round10LakeSpec extends SparkTestBase {

  test("lakeChangesBetween: an in-range duplicate DV row whose FIRST " +
      "commit is at or below fromVersion is not re-emitted as a delete") {
    val layout = Layout(tmpDir("cdf-boundary-dup"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L), ("clicks", "k3", 30L))
        .toDF("source", "key", "v"))
    val file = Catalog.lakeFilesAsOf(spark, layout).head
    // first DV commit deletes (file, 0) — the real delete
    val v2 = Catalog.commitLakeDeletes(spark, layout,
      Seq((file, 0L)).toDF("file", "pos"))
    // a pre-fix writer (no under-lock re-filter) lands the SAME position
    // in a second DV file — a duplicate, not a new delete
    val v3 = Catalog.commitLakeDeletes(spark, layout,
      Seq((file, 0L)).toDF("file", "pos"))
    assert(v3 > v2)

    // full-range read: exactly one delete (in-range dedup)
    val full = Catalog.lakeChangesBetween(spark, layout, 0L)
      .filter(col("_change_type") === "delete").collect()
    assert(full.length == 1, full.mkString(","))

    // boundary window (v2, head]: the duplicate falls in range but its
    // first commit is ≤ fromVersion — the feed must emit NO delete
    val window = Catalog.lakeChangesBetween(spark, layout, v2)
    val dels = window.filter(col("_change_type") === "delete").count()
    assert(dels == 0L,
      s"boundary duplicate re-emitted: $dels deletes in ($v2, head]")

    // an Mv refreshing across exactly that window stays correct
    val state = tmpDir("cdf-boundary-mv")
    val got1 = Mv.refresh(spark, layout, state, Seq("source"), "v")
    val byHand = Catalog.loadLakeSnapshot(spark, layout)
      .groupBy("source").agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val mv = Mv.read(spark, state)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(mv == byHand, s"mv=$mv snapshot=$byHand (version $got1)")
  }

  test("lakeChangesBetween: a window where EVERY in-range DV row is a " +
      "boundary duplicate yields an insert-only (or empty) feed, loudly " +
      "not a crash") {
    val layout = Layout(tmpDir("cdf-boundary-all-dup"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 1L)).toDF("source", "key", "v"))
    val file = Catalog.lakeFilesAsOf(spark, layout).head
    val v2 = Catalog.commitLakeDeletes(spark, layout,
      Seq((file, 0L)).toDF("file", "pos"))
    Catalog.commitLakeDeletes(spark, layout,
      Seq((file, 0L)).toDF("file", "pos"))
    val window = Catalog.lakeChangesBetween(spark, layout, v2)
    assert(window.filter(col("_change_type") === "delete").count() == 0L)
    assert(window.count() == 0L)
  }
}
