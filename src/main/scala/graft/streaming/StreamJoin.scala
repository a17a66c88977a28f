package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the last Structured Streaming surface the
  * engine exposes: correlating two live streams (or one stream with
  * itself) on a key plus an EVENT-TIME bound, with watermarks sizing
  * the join state.
  *
  * The shape mirrors the batch banded range join
  * ([[graft.ops.EventOps.eventPairs60s]]): where the batch plan
  * bounds the range condition with minute-bucket equi keys, the
  * streaming plan bounds it with WATERMARKS — each side keeps only
  * rows younger than the lateness horizon, so state is
  * O(rate × horizon) per key partition regardless of stream lifetime,
  * the property that keeps the join alive at 100 TB/day. Rows later
  * than the watermark are dropped from the join on both sides, the
  * exact trade the reference's at-least-once SQS pipeline makes in
  * the other direction (it never drops, and re-delivers instead).
  */
object StreamJoin {

  /** Ordered same-user event pairs within `windowMs`, as a
    * stream-stream SELF-join: an event pairs with every LATER event
    * of the same user arriving within the window. Returns one row per
    * (id_a, id_b) pair — the streaming twin of the batch
    * formulation's pre-aggregation frame, proved identical to it in
    * StreamJoinSpec.
    *
    * `events` must carry (user_id, event_id, ts: TimestampType). */
  def eventPairs(events: DataFrame, windowMs: Long = 60000L,
      lateness: String = "2 minutes"): DataFrame = {
    require(windowMs % 1000 == 0,
      s"windowMs must be whole seconds (interval literal), got $windowMs")
    val a = events
      .select(col("user_id").as("user_a"), col("event_id").as("id_a"),
        col("ts").as("ts_a"))
      .withWatermark("ts_a", lateness)
    val b = events
      .select(col("user_id").as("user_b"), col("event_id").as("id_b"),
        col("ts").as("ts_b"))
      .withWatermark("ts_b", lateness)
    a.join(b, expr(
      s"""user_a = user_b AND
         |ts_b > ts_a AND
         |ts_b <= ts_a + interval ${windowMs / 1000} seconds""".stripMargin))
      .select(col("user_a").as("user_id"), col("id_a"), col("id_b"),
        unix_millis(col("ts_b")).minus(unix_millis(col("ts_a"))).as("gap_ms"))
  }
}
