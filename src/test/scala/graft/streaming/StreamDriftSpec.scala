package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream ≡ batch for the PSI drift monitor: a frozen reference store
  * + an incrementally-fed current store read through the batch
  * query's own PSI fold must reproduce `q_value_drift` exactly on the
  * real corpus, under any framing; batch replay is idempotent. */
class StreamDriftSpec extends SparkTestBase {

  private val Cutoff = "2024-01-16 00:00:00"

  private case class Row(eventType: String, value: Double)

  private def feed(rows: Seq[(String, Double)], batches: Int,
      storeDir: String): Unit = {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = tmpDir("drift-ckpt")
    val mem = MemoryStream[(String, Double)]
    val per = math.max(1, rows.size / batches)
    rows.grouped(per).foreach { b =>
      mem.addData(b: _*)
      val q = StreamDrift.start(
        mem.toDF().toDF("event_type", "value"), storeDir, ckpt)
      q.awaitTermination()
    }
  }

  test("streamed stores through the shared PSI fold == the batch q_value_drift") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"), col("ts"))
    val cut = lit(Cutoff).cast("timestamp")
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
      df.select("event_type", "value").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq

    val refRows = rowsOf(ev.filter(col("ts") < cut))
    val curRows = rowsOf(ev.filter(col("ts") >= cut))
    val rnd = new scala.util.Random(3)

    val refDir = tmpDir("drift-ref"); val curDir = tmpDir("drift-cur")
    feed(rnd.shuffle(refRows), batches = 2, storeDir = refDir)
    feed(rnd.shuffle(curRows), batches = 3, storeDir = curDir)

    def rowsOfDf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_ref"),
        r.getAs[Long]("n_cur"), r.getAs[Long]("psi_e6"),
        r.getAs[Boolean]("is_drifted"))).toSeq

    val streamed = rowsOfDf(StreamDrift.psi(spark, refDir, curDir))
    val batch = rowsOfDf(graft.ops.Analytics.valueDrift(spark, sfDir, Cutoff))
    assert(streamed == batch, "one PSI fold, two cell sources — must be identical")

    // replaying a batch id overwrites the same cells (idempotent store)
    val lastBatch = new java.io.File(curDir).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).max
    val cellsBefore = StreamDrift.mergedCells(spark, curDir).collect().toSet
    val replaySrc = spark.read.parquet(s"$curDir/$lastBatch")
    val materialized = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(replaySrc.collect(): _*)),
      replaySrc.schema)
    materialized.write.mode("overwrite").parquet(s"$curDir/$lastBatch")
    assert(StreamDrift.mergedCells(spark, curDir).collect().toSet == cellsBefore)
    assert(rowsOfDf(StreamDrift.psi(spark, refDir, curDir)) == batch)
  }
}
