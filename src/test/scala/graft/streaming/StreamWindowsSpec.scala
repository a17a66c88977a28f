package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Streaming window-aggregation semantics (SURVEY.md §2.2 streaming
  * row): tumbling windows with watermark, late-data drop, and session
  * windows — the streaming forms of the batch sessionize/window
  * queries, verified with MemoryStream.
  */
class StreamWindowsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window aggregation with watermark drops late rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val agg = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("sum_v"), col("n"))

    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").trigger(Trigger.ProcessingTime("1 second")).start()

    mem.addData((ts("2024-01-01 00:01:00"), 1L), (ts("2024-01-01 00:02:00"), 2L))
    q.processAllAvailable()
    // advance event time far enough that the first window closes
    mem.addData((ts("2024-01-01 01:00:00"), 10L))
    q.processAllAvailable()
    // this row is way behind the watermark → must be dropped
    mem.addData((ts("2024-01-01 00:01:30"), 100L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 02:00:00"), 20L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSet
    // first window emitted once, WITHOUT the late 100
    assert(rows.contains(("2024-01-01 00:00:00.0", 3L, 2L)), rows.toString)
    assert(!rows.exists(_._2 == 103L), "late row leaked into a closed window")
  }

  test("session_window groups by activity gap per user") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val agg = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "5 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start"), col("n_events"))

    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").trigger(Trigger.ProcessingTime("1 second")).start()

    // user 1: two events 5 min apart (one session), then 30 min gap (new session)
    mem.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:05:00"), 1L),
      (ts("2024-01-01 00:35:00"), 1L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 03:00:00"), 2L)) // push watermark to close sessions
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(rows.contains((1L, "2024-01-01 00:00:00.0", 2L)), rows.toString)
    assert(rows.contains((1L, "2024-01-01 00:35:00.0", 1L)), rows.toString)
  }

  test("streaming agg over the ingest distribution area (subscriber pipeline)") {
    // subscriber = readStream over distribution dir, as SURVEY §3.3
    val layout = graft.lake.Layout(tmpDir("sublake"))
    def write(dir: String, name: String, content: String): Unit = {
      val d = new java.io.File(dir); d.mkdirs()
      java.nio.file.Files.writeString(new java.io.File(d, name).toPath, content)
    }
    write(layout.bronzeSourceDir("clicks"), "a.json", """{"id":1}{"id":2}{"id":3}""")
    val iq = StreamIngest.start(spark, layout, Trigger.AvailableNow())
    iq.awaitTermination(60000)

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "source STRING, key STRING, json STRING")
    val sub = spark.readStream.schema(schema).json(layout.distributionDir)
      .groupBy("source").count()
    val q = sub.writeStream.format("memory").queryName("sub_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("sub_out").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows == Map("clicks" -> 3L))
  }
}
