package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamKmvSpec extends SparkTestBase {

  /** JVM reference: per-group KMV estimate over the union, the
    * [[graft.ops.Sketch.kmvDistinct]] math in plain Scala. */
  private def reference(data: Seq[(String, Long)]): Map[String, Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(v: Long): Long = {
      val hex = md.digest(v.toString.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    data.groupBy(_._1).map { case (g, rows) =>
      val hashes = rows.map(r => h(r._2)).distinct.sorted
      val est =
        if (hashes.size < StreamKmv.K) hashes.size.toLong
        else (StreamKmv.K - 1).toLong * 4294967296L / hashes(StreamKmv.K - 1)
      g -> est
    }
  }

  test("streamed sketch across batches equals the batch sketch of the union (monoid)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = tmpDir("kmv-store")
    val ckpt = tmpDir("kmv-ckpt")
    // >K distinct per group so the merge actually truncates, plus one
    // small group exercising the exact fallback
    val batch1 = (1L to 300L).map(u => ("big", u)) ++ Seq(("tiny", 1L), ("tiny", 2L))
    val batch2 = (200L to 500L).map(u => ("big", u)) ++ Seq(("tiny", 2L), ("tiny", 3L))

    val mem = MemoryStream[(String, Long)]
    mem.addData(batch1: _*)
    StreamKmv.start(mem.toDF.toDF("grp", "user"), col("grp"), col("user"), store, ckpt)
      .awaitTermination()
    mem.addData(batch2: _*)
    StreamKmv.start(mem.toDF.toDF("grp", "user"), col("grp"), col("user"), store, ckpt)
      .awaitTermination()

    val streamed = StreamKmv.estimate(spark, store)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("kmv_est")).toMap
    val expected = reference(batch1 ++ batch2)
    assert(streamed == expected)
    // the small group took the exact path: 3 distinct users
    assert(streamed("tiny") == 3L)
    // the big group's estimate is within the k=64 sketch's error band
    val exact = (batch1 ++ batch2).filter(_._1 == "big").map(_._2).distinct.size.toLong
    assert(math.abs(streamed("big") - exact) * 10 <= exact * 4,
      s"estimate ${streamed("big")} too far from exact $exact")
  }

  test("compaction folds the store without changing any estimate") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = tmpDir("kmv-store2")
    val ckpt = tmpDir("kmv-ckpt2")
    val mem = MemoryStream[(String, Long)]
    mem.addData((1L to 200L).map(u => ("g" + (u % 3), u)): _*)
    StreamKmv.start(mem.toDF.toDF("grp", "user"), col("grp"), col("user"), store, ckpt)
      .awaitTermination()
    mem.addData((150L to 400L).map(u => ("g" + (u % 3), u)): _*)
    StreamKmv.start(mem.toDF.toDF("grp", "user"), col("grp"), col("user"), store, ckpt)
      .awaitTermination()
    val before = StreamKmv.estimate(spark, store)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("kmv_est")).toMap
    StreamKmv.compact(spark, store)
    val root = new org.apache.hadoop.fs.Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).toSet
    assert(names == Set("batch=compacted_g1"), s"store not folded: $names")
    val after = StreamKmv.estimate(spark, store)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("kmv_est")).toMap
    assert(after == before, "compaction must not change any estimate")
    // and the folded store keeps absorbing: repeated compaction is stable
    StreamKmv.compact(spark, store)
    val again = StreamKmv.estimate(spark, store)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("kmv_est")).toMap
    assert(again == before)
  }
}
