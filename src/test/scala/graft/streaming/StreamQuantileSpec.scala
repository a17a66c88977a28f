package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamQuantileSpec extends SparkTestBase {

  /** JVM reference: the histogram order statistic in plain Scala —
    * bin by floor(cents/width), rank ⌈q·n⌉, report the bin's lower
    * bound in cents. */
  private def reference(data: Seq[(String, Double)]): Map[String, (Long, Long, Long, Long)] =
    data.groupBy(_._1).map { case (g, rows) =>
      val bins = rows.map(r => Math.floorDiv(math.round(r._2 * 100), StreamQuantile.BinCents))
      val hist = bins.groupBy(identity).map { case (b, v) => b -> v.size.toLong }
        .toSeq.sortBy(_._1)
      val total = bins.size.toLong
      def q(ppm: Long): Long = {
        var cum = 0L
        hist.collectFirst {
          case (b, n) if { cum += n; cum * 1000000L >= total * ppm } =>
            b * StreamQuantile.BinCents
        }.get
      }
      g -> ((total, q(500000L), q(900000L), q(990000L)))
    }

  private def collectEst(store: String): Map[String, (Long, Long, Long, Long)] =
    StreamQuantile.estimate(spark, store).collect()
      .map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("p50_cents"),
          r.getAs[Long]("p90_cents"), r.getAs[Long]("p99_cents")))).toMap

  test("streamed histogram across batches == batch fold == JVM reference (monoid)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = tmpDir("q-store")
    val ckpt = tmpDir("q-ckpt")
    val rnd = new scala.util.Random(7)
    // includes negatives (floor-division corner) and a skewed tail
    val batch1 = (1 to 400).map(i => ("web", rnd.nextDouble() * 500 - 50)) ++
      (1 to 50).map(i => ("app", math.pow(rnd.nextDouble() * 10, 3)))
    val batch2 = (1 to 300).map(i => ("web", rnd.nextDouble() * 800)) ++
      (1 to 70).map(i => ("app", rnd.nextDouble() * 2000))

    val mem = MemoryStream[(String, Double)]
    mem.addData(batch1: _*)
    StreamQuantile.start(mem.toDF.toDF("grp", "v"), col("grp"), col("v"), store, ckpt)
      .awaitTermination()
    mem.addData(batch2: _*)
    StreamQuantile.start(mem.toDF.toDF("grp", "v"), col("grp"), col("v"), store, ckpt)
      .awaitTermination()

    val streamed = collectEst(store)
    assert(streamed == reference(batch1 ++ batch2))

    // one-shot batch over the union writes the identical store
    val store2 = tmpDir("q-store-batch")
    StreamQuantile.batchHist((batch1 ++ batch2).toDF("grp", "v"), col("grp"), col("v"))
      .write.parquet(s"$store2/batch=0")
    assert(collectEst(store2) == streamed)
  }

  test("overwrite-idempotent replay and compaction leave every estimate unchanged") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = tmpDir("q-store3")
    val ckpt = tmpDir("q-ckpt3")
    val mem = MemoryStream[(String, Double)]
    mem.addData((1 to 500).map(i => ("g" + (i % 3), i * 1.5)): _*)
    StreamQuantile.start(mem.toDF.toDF("grp", "v"), col("grp"), col("v"), store, ckpt)
      .awaitTermination()
    mem.addData((1 to 400).map(i => ("g" + (i % 3), i * 2.5 - 100)): _*)
    StreamQuantile.start(mem.toDF.toDF("grp", "v"), col("grp"), col("v"), store, ckpt)
      .awaitTermination()
    val before = collectEst(store)

    // replayed batch (checkpoint recovery) overwrites identical bytes
    val batch0 = spark.read.parquet(s"$store/batch=0")
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("bin"), r.getAs[Long]("n")))
    batch0.toSeq.toDF("grp", "bin", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$store/batch=0")
    assert(collectEst(store) == before, "replay must be idempotent")

    StreamQuantile.compact(spark, store)
    assert(collectEst(store) == before, "compaction must not change estimates")
    val root = new org.apache.hadoop.fs.Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).toSet
    assert(names == Set("batch=compacted_g1"), s"store not folded: $names")
  }
}
