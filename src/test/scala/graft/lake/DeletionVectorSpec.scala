package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Merge-on-read row deletes on the manifest log
  * ([[Catalog.commitLakeDeletes]] / [[Catalog.deleteLakeWhere]] /
  * [[Catalog.materializeLakeDeletes]]): a delete is O(deleted rows) —
  * a DV commit, no data-file rewrite — applied by the snapshot read as
  * an anti-join on (file, row_index); materialization later rewrites
  * the affected files and drops stale DV sidecars atomically. */
class DeletionVectorSpec extends SparkTestBase {

  private def seed(layout: Layout): Long = {
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L), ("clicks", "k3", 30L),
          ("logs", "k4", 40L), ("logs", "k5", 50L))
        .toDF("source", "key", "v"))
  }

  test("deleteLakeWhere hides rows without touching data files; time travel " +
      "below the DV still shows them; no-match returns -1") {
    val layout = Layout(tmpDir("dv-basic"))
    val v1 = seed(layout)
    val filesBefore = Catalog.lakeFilesAsOf(spark, layout)

    val v2 = Catalog.deleteLakeWhere(spark, layout, col("key") === "k2")
    assert(v2 == v1 + 1)
    val live = Catalog.loadLakeSnapshot(spark, layout)
    assert(live.count() == 4 && live.filter("key = 'k2'").count() == 0)
    // merge-on-read: the data-file set is byte-identical
    assert(Catalog.lakeFilesAsOf(spark, layout) == filesBefore,
      "a DV delete must not add/remove/rewrite any data file")
    assert(Catalog.dvFilesAsOf(spark, layout).nonEmpty)
    // snapshot below the DV commit still shows the row
    assert(Catalog.loadLakeSnapshot(spark, layout, v1).filter("key = 'k2'").count() == 1)
    // the deleted row no longer matches: re-delete is a no-op commit
    assert(Catalog.deleteLakeWhere(spark, layout, col("key") === "k2") == -1L)
    // stacked DVs union
    val v3 = Catalog.deleteLakeWhere(spark, layout, col("v") >= 40L)
    assert(v3 > v2)
    val live2 = Catalog.loadLakeSnapshot(spark, layout)
    assert(live2.select("key").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("k1", "k3"))
    // and per-version reads see exactly the DVs at that version
    assert(Catalog.loadLakeSnapshot(spark, layout, v2).count() == 4)
  }

  test("materializeLakeDeletes rewrites affected files, drops stale DVs, and " +
      "leaves every snapshot read unchanged; vacuum reclaims the bytes") {
    val layout = Layout(tmpDir("dv-mat"))
    val v1 = seed(layout)
    val v2 = Catalog.deleteLakeWhere(spark, layout, col("key").isin("k2", "k4"))
    val before = Catalog.loadLakeSnapshot(spark, layout)
      .select("source", "key", "v").collect().map(_.toString).sorted.toSeq
    val filesBefore = Catalog.lakeFilesAsOf(spark, layout).toSet

    val rewritten = Catalog.materializeLakeDeletes(spark, layout)
    assert(rewritten == 2, s"both DV'd files rewritten, got $rewritten")
    val after = Catalog.loadLakeSnapshot(spark, layout)
      .select("source", "key", "v").collect().map(_.toString).sorted.toSeq
    assert(after == before, "materialization must not change the live view")
    assert(Catalog.dvFilesAsOf(spark, layout).isEmpty,
      "no DV row references a live file after materialization — all dropped")
    val filesAfter = Catalog.lakeFilesAsOf(spark, layout).toSet
    assert((filesBefore -- filesAfter).size == 2, "originals logically removed")
    // time travel below the materialization still applies the old DVs
    assert(Catalog.loadLakeSnapshot(spark, layout, v2).filter("key = 'k2'").count() == 0)
    assert(Catalog.loadLakeSnapshot(spark, layout, v1).filter("key = 'k2'").count() == 1)
    // physical reclamation: removed data files AND dv sidecars deleted
    val n = Catalog.vacuumLake(spark, layout, graceMs = 0L)
    assert(n >= 3, s"2 originals + >=1 dv sidecar reclaimed, got $n")
    (filesBefore -- filesAfter).foreach { rel =>
      assert(!new java.io.File(s"${layout.lakeDir}/$rel").exists())
    }
    // the deleted subject's bytes are GONE from the live tree
    assert(Catalog.loadLakeSnapshot(spark, layout)
      .select("source", "key", "v").collect().map(_.toString).sorted.toSeq == before)
    // idempotent: nothing left to materialize
    assert(Catalog.materializeLakeDeletes(spark, layout) == 0L)
  }

  test("a DV referencing no live file is garbage-collected by materialize " +
      "without any rewrite") {
    val layout = Layout(tmpDir("dv-stale"))
    seed(layout)
    val s = spark
    import s.implicits._
    Catalog.commitLakeDeletes(spark, layout,
      Seq(("source=ghost/c000-nope.parquet", 0L)).toDF("file", "pos"))
    assert(Catalog.loadLakeSnapshot(spark, layout).count() == 5,
      "a dangling DV row deletes nothing")
    val filesBefore = Catalog.lakeFilesAsOf(spark, layout)
    assert(Catalog.materializeLakeDeletes(spark, layout) == 0L)
    assert(Catalog.dvFilesAsOf(spark, layout).isEmpty, "stale DV dropped")
    assert(Catalog.lakeFilesAsOf(spark, layout) == filesBefore)
  }

  test("DV records survive the checkpoint fold and log prune; as-of below " +
      "the DV keeps the pre-delete view") {
    val layout = Layout(tmpDir("dv-ckpt"))
    val v1 = seed(layout)
    Catalog.deleteLakeWhere(spark, layout, col("key") === "k1")
    val cp = Catalog.checkpoint(spark, layout)
    assert(cp.isDefined)
    Catalog.pruneLog(spark, layout)
    val live = Catalog.loadLakeSnapshot(spark, layout)
    assert(live.count() == 4 && live.filter("key = 'k1'").count() == 0,
      "DV must survive the fold")
    assert(Catalog.loadLakeSnapshot(spark, layout, v1).filter("key = 'k1'").count() == 1,
      "time travel below the DV must survive the fold")
    // and a post-checkpoint materialize still sees the folded DV
    assert(Catalog.materializeLakeDeletes(spark, layout) == 1L)
    assert(Catalog.loadLakeSnapshot(spark, layout).count() == 4)
  }

  test("upsertLakeByKey: one atomic commit replaces matched keys and inserts " +
      "fresh ones; snapshot below shows the old versions; repeated upserts " +
      "keep only the latest") {
    val layout = Layout(tmpDir("dv-upsert"))
    val s = spark
    import s.implicits._
    val v1 = seed(layout)
    val filesBefore = Catalog.lakeFilesAsOf(spark, layout)
    val v2 = Catalog.upsertLakeByKey(spark, layout,
      Seq(("clicks", "k2", 21L), ("logs", "k9", 90L)).toDF("source", "key", "v"),
      keyCols = Seq("key"))
    assert(v2 == v1 + 1, "exactly ONE commit spans the delete and the insert")
    val live = Catalog.loadLakeSnapshot(spark, layout)
    assert(live.count() == 6)
    assert(live.filter("key = 'k2'").select("v").collect().map(_.getLong(0)).toSeq
      == Seq(21L), "the matched key holds only the new version")
    assert(live.filter("key = 'k9' AND v = 90").count() == 1, "fresh key inserted")
    // merge-on-read: original files untouched, one add + one DV
    assert(Catalog.lakeFilesAsOf(spark, layout).toSet.intersect(filesBefore.toSet)
      == filesBefore.toSet)
    // time travel below the upsert
    assert(Catalog.loadLakeSnapshot(spark, layout, v1)
      .filter("key = 'k2' AND v = 20").count() == 1)
    // a second upsert of the same key keeps only the latest
    Catalog.upsertLakeByKey(spark, layout,
      Seq(("clicks", "k2", 22L)).toDF("source", "key", "v"), keyCols = Seq("key"))
    val vs = Catalog.loadLakeSnapshot(spark, layout)
      .filter("key = 'k2'").select("v").collect().map(_.getLong(0)).toSeq
    assert(vs == Seq(22L), s"stacked upserts must not accumulate versions: $vs")
    // materialization preserves the upserted view
    val before = Catalog.loadLakeSnapshot(spark, layout)
      .select("source", "key", "v").collect().map(_.toString).sorted.toSeq
    Catalog.materializeLakeDeletes(spark, layout)
    val after = Catalog.loadLakeSnapshot(spark, layout)
      .select("source", "key", "v").collect().map(_.toString).sorted.toSeq
    assert(after == before)
    // pure-insert batch commits without a DV section
    val v5 = Catalog.upsertLakeByKey(spark, layout,
      Seq(("clicks", "k7", 70L)).toDF("source", "key", "v"), keyCols = Seq("key"))
    assert(v5 > 0 && Catalog.loadLakeSnapshot(spark, layout).count() == 7)
  }

  test("an erase rewrite cannot resurrect DV-deleted rows") {
    val layout = Layout(tmpDir("dv-erase"))
    def rec(user: String, v: Int): String = s"""{"user":"$user","v":$v}"""
    def writeGz(name: String, content: String): Unit = {
      val d = new java.io.File(layout.bronzeSourceDir("clicks")); d.mkdirs()
      val out = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(new java.io.File(d, name)))
      out.write(content.getBytes("UTF-8")); out.close()
    }
    writeGz("obj1.gz", rec("A", 1) + rec("B", 2) + rec("A", 3))
    writeGz("obj2.gz", rec("B", 4) + rec("C", 5))
    Ingest.ingestBatch(spark, layout, arrivalMs = 1704067200000L)
    // merge-on-read delete of one NON-subject record
    Catalog.deleteLakeWhere(spark, layout, col("json") === rec("B", 2))
    assert(Catalog.loadLakeSnapshot(spark, layout)
      .filter(col("json") === rec("B", 2)).count() == 0)
    // now a GDPR erase rewrites the same files under new names — the
    // rewrite must read THROUGH the DV or the B record resurrects
    Erase.eraseWhere(spark, layout, "clicks", Erase.jsonFieldEquals("user", "A"))
    val after = Catalog.loadLakeSnapshot(spark, layout)
      .select("json").collect().map(_.getString(0))
    assert(!after.exists(_.contains("\"user\":\"A\"")), "subject erased")
    assert(!after.contains(rec("B", 2)),
      s"the DV-deleted row must NOT resurrect in the rewritten file: ${after.toSeq}")
    assert(after.contains(rec("B", 4)) && after.contains(rec("C", 5)),
      "unrelated records survive")
  }

  test("deleteLakeWhere can reference an evolved column") {
    val layout = Layout(tmpDir("dv-evolve"))
    val s = spark
    import s.implicits._
    seed(layout)
    Catalog.commitLakeAddColumn(spark, layout, "score", "bigint")
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k9", 90L, 7L)).toDF("source", "key", "v", "score"))
    Catalog.deleteLakeWhere(spark, layout, col("score") === 7L)
    val live = Catalog.loadLakeSnapshot(spark, layout)
    assert(live.count() == 5 && live.filter("key = 'k9'").count() == 0)
    // pre-evolution rows (score null) never match a non-null predicate
    assert(live.filter("key = 'k1'").count() == 1)
  }
}
