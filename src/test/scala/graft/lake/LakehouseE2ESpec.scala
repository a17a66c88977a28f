package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The round-8 lake surface as ONE story: stats-bearing commits →
  * schema evolution → MERGE upsert → merge-on-read delete →
  * file-skipped range read → checkpoint fold → materialization →
  * vacuum — with every intermediate version re-readable until vacuum
  * reclaims it, and the live view invariant across maintenance. */
class LakehouseE2ESpec extends SparkTestBase {

  test("commit → evolve → upsert → delete → pruned read → checkpoint → " +
      "materialize → vacuum, with time travel at every step") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("lakehouse-e2e"))

    // 1. two stats-bearing commits with disjoint seq ranges
    val v1 = Catalog.commitLake(spark, layout,
      (0L to 9L).map(i => ("clicks", s"k$i", i)).toDF("source", "key", "seq")
        .coalesce(1), statsCols = Seq("seq"))
    val v2 = Catalog.commitLake(spark, layout,
      (100L to 109L).map(i => ("clicks", s"k$i", i)).toDF("source", "key", "seq")
        .coalesce(1), statsCols = Seq("seq"))
    assert(Catalog.loadLakeSnapshot(spark, layout).count() == 20)

    // 2. evolve: add a typed score column (log fact, no rewrite)
    val vEvo = Catalog.commitLakeAddColumn(spark, layout, "score", "bigint")
    assert(Catalog.loadLakeSnapshot(spark, layout).schema("score").dataType.typeName == "long")

    // 3. MERGE: update k5 (now with a score), insert k200
    val vUp = Catalog.upsertLakeByKey(spark, layout,
      Seq(("clicks", "k5", 5L, 55L), ("clicks", "k200", 200L, 77L))
        .toDF("source", "key", "seq", "score"),
      keyCols = Seq("key"))
    val afterUp = Catalog.loadLakeSnapshot(spark, layout)
    assert(afterUp.count() == 21)
    assert(afterUp.filter("key = 'k5'").select("score").collect()
      .map(_.getLong(0)).toSeq == Seq(55L))

    // 4. merge-on-read delete
    val vDel = Catalog.deleteLakeWhere(spark, layout, col("seq") === 105L)
    assert(Catalog.loadLakeSnapshot(spark, layout).count() == 20)

    // 5. file-skipped range read: [100, 300] must not list commit-1's file
    val keep = Catalog.lakeFilesOverlapping(spark, layout, "seq", 100L, 300L)
    assert(!keep.exists(Catalog.lakeFileStatsAsOf(spark, layout)
        .get(_).exists(_.contains("\"max\":9"))),
      s"the 0-9 file must be pruned: $keep")
    val ranged = Catalog.loadLakeRange(spark, layout, "seq", 100L, 300L)
    assert(ranged.select("seq").collect().map(_.getLong(0)).sorted.toSeq ==
      ((100L to 109L).filterNot(_ == 105L) :+ 200L).sorted,
      "range read: DV applied, upsert visible, residual exact")

    // 6. checkpoint + prune: every version still reads correctly
    assert(Catalog.checkpoint(spark, layout).isDefined)
    Catalog.pruneLog(spark, layout)
    assert(Catalog.loadLakeSnapshot(spark, layout, v1).count() == 10)
    assert(Catalog.loadLakeSnapshot(spark, layout, v2).count() == 20)
    assert(Catalog.loadLakeSnapshot(spark, layout, vEvo).columns.contains("score"))
    assert(Catalog.loadLakeSnapshot(spark, layout, vUp).count() == 21)
    assert(Catalog.loadLakeSnapshot(spark, layout, vDel).count() == 20)
    // the version below the evolution must NOT show the column
    assert(!Catalog.loadLakeSnapshot(spark, layout, v2).columns.contains("score"))

    // 7. materialize: live view provably unchanged; stale DVs gone
    val before = Catalog.loadLakeSnapshot(spark, layout)
      .select("source", "key", "seq", "score").collect().map(_.toString).sorted.toSeq
    Catalog.materializeLakeDeletes(spark, layout)
    assert(Catalog.loadLakeSnapshot(spark, layout)
      .select("source", "key", "seq", "score").collect().map(_.toString).sorted.toSeq
      == before)
    assert(Catalog.dvFilesAsOf(spark, layout).isEmpty)

    // 8. vacuum reclaims removed files; the live view survives
    assert(Catalog.vacuumLake(spark, layout, graceMs = 0L) > 0)
    assert(Catalog.loadLakeSnapshot(spark, layout)
      .select("source", "key", "seq", "score").collect().map(_.toString).sorted.toSeq
      == before)
  }
}
