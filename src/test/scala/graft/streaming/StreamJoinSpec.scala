package graft.streaming

import graft.SparkTestBase
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream self-join semantics: the streamed pair set equals the
  * batch inequality join of the union of all batches — including
  * pairs whose two sides arrived in DIFFERENT micro-batches (the case
  * the join state exists for). */
class StreamJoinSpec extends SparkTestBase {

  private val T0 = 1704067200000L

  test("streamed within-60s pairs equal the batch join, across batch boundaries") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // (user, event, seconds-offset): user 1 has a cross-batch pair
    // (e2@50s in batch 1, e3@70s in batch 2), an exact-60s pair
    // (e1@0s..e2@50s? no — e3@70s-e2@50s=20s, e1..e2=50s) and an
    // out-of-window non-pair (e1@0s vs e3@70s); user 2 pairs across
    // users never happen
    val batch1 = Seq((1L, 101L, 0L), (1L, 102L, 50L), (2L, 201L, 10L))
    val batch2 = Seq((1L, 103L, 70L), (2L, 202L, 200L)) // 202-201 gap 190s: no pair

    val mem = MemoryStream[(Long, Long, Long)]
    val events = mem.toDF.toDF("user_id", "event_id", "off_s")
      .select(col("user_id"), col("event_id"),
        timestamp_millis(col("off_s") * 1000 + T0).as("ts"))
    val out = StreamJoin.eventPairs(events)
    val q = out.writeStream.format("memory").queryName("pairs")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.sql("SELECT user_id, id_a, id_b, gap_ms FROM pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // batch oracle: brute-force inequality join over the union
    val all = (batch1 ++ batch2).map { case (u, e, off) => (u, e, off * 1000 + T0) }
    val expected = (for {
      (ua, ea, ta) <- all
      (ub, eb, tb) <- all
      if ua == ub && tb > ta && tb - ta <= 60000L
    } yield (ua, ea, eb, tb - ta)).toSet

    assert(expected.contains((1L, 102L, 103L, 20000L)),
      "sanity: the cross-batch pair must be part of the oracle")
    assert(streamed == expected,
      s"stream/batch divergence: missing=${expected -- streamed} extra=${streamed -- expected}")
  }

  test("the join plan carries watermarks on both sides (bounded state)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val events = mem.toDF.toDF("user_id", "event_id", "off_s")
      .select(col("user_id"), col("event_id"),
        timestamp_millis(col("off_s") * 1000).as("ts"))
    val plan = StreamJoin.eventPairs(events).queryExecution.analyzed.toString()
    assert(plan.toLowerCase.contains("eventtimewatermark"),
      s"expected watermark nodes in the plan, got:\n$plan")
  }
}
