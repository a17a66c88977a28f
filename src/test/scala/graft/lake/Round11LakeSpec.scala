package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-11 lake additions: dynamic file pruning for the upsert match
  * scan through the committed skipping index, and the combined
  * ALTER commit on the typed API. */
class Round11LakeSpec extends SparkTestBase {

  test("upsert match scan is FILE-PRUNED by the skipping index: a file " +
      "whose stats exclude the batch's key range is never opened " +
      "(pinned physically — its bytes are gone), and the merge result " +
      "is exact") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("r11-dfp"))
    // two key ranges, stats committed per file
    Catalog.commitLake(spark, layout,
      (0L to 99L).map(k => ("clicks", k, k * 10)).toDF("source", "k", "v"),
      statsCols = Seq("k"))
    Catalog.commitLake(spark, layout,
      (1000L to 1099L).map(k => ("clicks", k, k * 10)).toDF("source", "k", "v"),
      statsCols = Seq("k"))
    val rangeAFiles = Catalog.lakeFilesAsOf(spark, layout)
      .filter(_.contains(f"c${1L}%020d"))
    assert(rangeAFiles.nonEmpty)
    // physically remove range A's bytes (log still lists them live):
    // an UNPRUNED match scan would open them and fail loud — the
    // pruned scan must never touch them
    val fs = new org.apache.hadoop.fs.Path(layout.lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    rangeAFiles.foreach { rel =>
      assert(fs.delete(new org.apache.hadoop.fs.Path(
        s"${layout.lakeDir}/$rel"), false), rel)
    }

    val batch = Seq(("clicks", 1005L, -1L), ("clicks", 2000L, -2L))
      .toDF("source", "k", "v")
    val seq = Catalog.upsertLakeByKey(spark, layout, batch, Seq("k"))
    assert(seq > 0)
    // the upsert replaced k=1005 and inserted k=2000; range B otherwise
    // intact (range A is unreadable by construction — scan only B)
    val post = Catalog.lakeSnapshotWithPos(spark, layout,
        Catalog.lakeFilesAsOf(spark, layout)
          .filterNot(rangeAFiles.contains))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(post(1005L) == -1L)
    assert(post(2000L) == -2L)
    assert(post(1006L) == 10060L)
    assert(post.size == 101, s"100 range-B keys + the insert: ${post.size}")

    // an all-NULL key batch equi-matches nothing: plain insert, no scan
    val nullBatch = Seq(("clicks", Option.empty[Long], 7L))
      .toDF("source", "k", "v")
    assert(Catalog.upsertLakeByKey(spark, layout, nullBatch, Seq("k")) > 0)
  }

  test("commitLakeAlter (typed API): add + widen the SAME column in one " +
      "statement-shaped commit; one log record carries all facts") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("r11-alter"))
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10)).toDF("source", "key", "v"))
    val v0 = Catalog.headVersion(spark, layout)
    val seq = Catalog.commitLakeAlter(spark, layout,
      addCols = Seq(("score", "int")),
      widenCols = Seq(("score", "bigint"), ("v", "bigint")),
      expectAdds = Seq(("v_pos", "v > 0")))
    assert(seq == v0 + 1)
    assert(Catalog.headVersion(spark, layout) == v0 + 1,
      "one combined ALTER = one commit")
    val snap = Catalog.loadLakeSnapshot(spark, layout)
    assert(snap.schema("score").dataType ==
      org.apache.spark.sql.types.LongType, "added narrow, widened in-statement")
    assert(snap.schema("v").dataType == org.apache.spark.sql.types.LongType)
    assert(Catalog.lakeExpectations(spark, layout) == Map("v_pos" -> "v > 0"))
    // and the whole statement refuses atomically on one bad change
    intercept[Exception](Catalog.commitLakeAlter(spark, layout,
      addCols = Seq(("a2", "int")),
      widenCols = Seq(("v", "int")))) // narrowing — refused
    assert(Catalog.headVersion(spark, layout) == v0 + 1)
    assert(!Catalog.loadLakeSnapshot(spark, layout).columns.contains("a2"))
  }
}
