package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** At-least-once → effectively-once dedup with BOUNDED state, on
  * Spark 4's `transformWithState` (the arbitrary-state successor to
  * flatMapGroupsWithState): ONE record per id passes, repeats within
  * the TTL are dropped, and the per-id state expires automatically —
  * no watermark contract needed on the id column, unlike
  * `dropDuplicates`. (Which duplicate of an id wins WITHIN a single
  * micro-batch is shuffle-arrival-order dependent; across batches the
  * earlier batch's survivor always wins.)
  *
  * Complements [[StreamIngest.dedupedByEventId]] (watermark-based):
  * use this form when redelivery horizons are known in wall-clock
  * terms (queue visibility timeouts — the reference's SQS redelivery
  * model, `serverless_datalake_stack.py:54-61`) rather than in
  * event-time lateness.
  *
  * State: one boolean per live id, TTL-evicted by the RocksDB state
  * store — at 100 TB/day rates the state size is bounded by
  * (arrival rate × TTL), independent of history length.
  */
object TtlDedup {

  final case class Keyed(id: Long, payload: String)

  class FirstSeenProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, Keyed, Keyed] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
        TTLConfig(ttl))

    override def handleInputRows(key: Long, rows: Iterator[Keyed],
        timerValues: TimerValues): Iterator[Keyed] = {
      // consume eagerly: the state handle must not be touched from a
      // lazily-evaluated iterator after the processor call returns
      val first = if (rows.hasNext) rows.next() else null
      if (seen.exists() || first == null) Iterator.empty
      else {
        seen.update(true)
        Iterator.single(first)
      }
    }
  }

  /** Deduplicate a keyed stream by id with TTL-bounded state. */
  def firstSeen(spark: SparkSession, events: Dataset[Keyed],
      ttl: java.time.Duration): Dataset[Keyed] = {
    import spark.implicits._
    events.groupByKey(_.id)
      .transformWithState(new FirstSeenProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
