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
}
