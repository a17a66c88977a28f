package graft.streaming

import graft.SparkTestBase
import graft.ops.Sketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamSketchSpec extends SparkTestBase {

  test("streamed sketch equals the batch sketch of the union (cells are a monoid)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = tmpDir("sketch-store")
    val ckpt = tmpDir("sketch-ckpt")
    val batch1 = (1L to 400L).map(_ % 37)
    val batch2 = (1L to 300L).map(_ % 17)

    val mem = MemoryStream[Long]
    mem.addData(batch1: _*)
    val q1 = StreamSketch.start(mem.toDF.select(col("value")), col("value"), store, ckpt)
    q1.awaitTermination()
    mem.addData(batch2: _*)
    val q2 = StreamSketch.start(mem.toDF.select(col("value")), col("value"), store, ckpt)
    q2.awaitTermination()

    val streamed = StreamSketch.mergedCells(spark, store)
      .collect().map(r => (r.getAs[Int]("row_no"), r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap
    val all = (batch1 ++ batch2).toDF("value")
    val batch = Sketch.cellsOf(all, col("value"))
      .collect().map(r => (r.getAs[Int]("row_no"), r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap
    assert(streamed == batch)
  }

  test("estimates from the merged store never undercount the true frequency") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = tmpDir("sketch-store2")
    val ckpt = tmpDir("sketch-ckpt2")
    val data = (1L to 500L).map(_ % 23)
    val mem = MemoryStream[Long]
    mem.addData(data: _*)
    StreamSketch.start(mem.toDF.select(col("value")), col("value"), store, ckpt)
      .awaitTermination()
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = StreamSketch.estimate(spark, store, data.toDF("value"), col("value"))
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("est")).toMap
    assert(est.keySet == truth.keySet)
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"key $k undercounted: ${est(k)} < $n")
    }
    // compaction folds the store to one snapshot partition without
    // changing a single estimate, and keeps absorbing batches after
    StreamSketch.compact(spark, store)
    val after = StreamSketch.estimate(spark, store, data.toDF("value"), col("value"))
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("est")).toMap
    assert(after == est, "compaction must not change any estimate")
    StreamSketch.compact(spark, store)
    val again = StreamSketch.estimate(spark, store, data.toDF("value"), col("value"))
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("est")).toMap
    assert(again == est, "repeated compaction must fold prior snapshots, not double them")
  }

  test("a never-seen key estimates 0, not absent (left-join probe semantics)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = tmpDir("sketch-store3")
    val ckpt = tmpDir("sketch-ckpt3")
    val mem = MemoryStream[Long]
    mem.addData((1L to 100L).map(_ % 7): _*)
    StreamSketch.start(mem.toDF.select(col("value")), col("value"), store, ckpt)
      .awaitTermination()
    // 9999 was never streamed; with only 7 distinct keys in a d x w = 3 x 1024
    // sketch no cell collision can lift it off zero either way
    val est = StreamSketch.estimate(spark, store, Seq(3L, 9999L).toDF("value"), col("value"))
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("est")).toMap
    assert(est.contains(9999L), "absent key must still appear in the output")
    assert(est(9999L) == 0L, s"absent key must estimate 0, got ${est(9999L)}")
    assert(est(3L) >= (1L to 100L).count(_ % 7 == 3))
  }

  test("recover finishes a compaction that crashed between snapshot commit and input delete") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = tmpDir("sketch-store4")
    val ckpt = tmpDir("sketch-ckpt4")
    val data = (1L to 300L).map(_ % 13)
    val mem = MemoryStream[Long]
    mem.addData(data: _*)
    StreamSketch.start(mem.toDF.select(col("value")), col("value"), store, ckpt)
      .awaitTermination()
    val before = StreamSketch.estimate(spark, store, data.toDF("value"), col("value"))
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("est")).toMap

    // simulate the crash window: snapshot + manifest durably in place,
    // folded inputs NOT yet deleted (store double counts right now)
    val root = new org.apache.hadoop.fs.Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inputs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath)
    val snap = new org.apache.hadoop.fs.Path(root, "batch=compacted_g1")
    StreamSketch.mergedCells(spark, store)
      .coalesce(1).write.mode("overwrite").parquet(snap.toString)
    val mf = fs.create(new org.apache.hadoop.fs.Path(snap, "_folded"), true)
    mf.write(inputs.map(_.getName).mkString("\n").getBytes("UTF-8"))
    mf.close()
    // the commit point is the marker (not the rename — see
    // SnapshotStore doc); this crash window is post-commit, pre-delete.
    // The markerless (pre-commit) window is pinned in SnapshotStoreSpec.
    fs.create(new org.apache.hadoop.fs.Path(snap, "_committed"), true).close()
    // stray temp dir from an even earlier crash must be garbage-collected too
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "_compact_tmp_g0"))

    StreamSketch.recover(fs, root)
    val names = fs.listStatus(root).map(_.getPath.getName).toSet
    assert(names == Set("batch=compacted_g1"), s"unexpected store contents: $names")
    val after = StreamSketch.estimate(spark, store, data.toDF("value"), col("value"))
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("est")).toMap
    assert(after == before, "recovery must restore exactly the pre-compaction estimates")
  }
}
