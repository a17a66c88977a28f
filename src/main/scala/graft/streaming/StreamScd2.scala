package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 maintenance — the incremental form of
  * [[graft.ops.EventOps.scd2Intervals]]: per user, consecutive
  * same-type events extend the open run; a type change CLOSES the
  * previous validity interval (emitted exactly once, Append mode) and
  * opens the next. The open run lives in keyed state — it is SCD2's
  * "current row", never emitted until a change closes it, exactly like
  * the batch query's NULL `valid_to_ms`.
  *
  * Ordering contract: intervals are well-defined only under per-user
  * event-time order, which the stream must deliver within each key
  * (each micro-batch is sorted on (tsMs, eventId) — the batch query's
  * tiebreaker — and batches must not interleave a user's past behind
  * its future; bound disorder upstream with a watermark + the
  * sessionizer-style late handling if the source can reorder).
  *
  * Scale: one RunState per ACTIVE user — state size tracks live
  * entities, not history; history lands in the sink. Same keyed-state
  * posture as [[StatefulSessions]].
  */
object StreamScd2 {

  final case class Ev(userId: Long, eventId: Long, tsMs: Long, eventType: String)
  final case class RunState(state: String, validFromMs: Long, nEvents: Long)
  final case class ClosedInterval(userId: Long, state: String,
      validFromMs: Long, validToMs: Long, nEvents: Long)

  /** Pure transition function — unit-testable without a stream. */
  def onUser(userId: Long, events: Iterator[Ev],
      state: GroupState[RunState]): Iterator[ClosedInterval] = {
    val sorted = events.toSeq.sortBy(e => (e.tsMs, e.eventId))
    var closed = List.empty[ClosedInterval]
    var cur = state.getOption
    sorted.foreach { e =>
      cur match {
        case Some(s) if s.state == e.eventType =>
          cur = Some(s.copy(nEvents = s.nEvents + 1))
        case Some(s) =>
          closed ::= ClosedInterval(userId, s.state, s.validFromMs, e.tsMs, s.nEvents)
          cur = Some(RunState(e.eventType, e.tsMs, 1))
        case None =>
          cur = Some(RunState(e.eventType, e.tsMs, 1))
      }
    }
    cur.foreach(state.update)
    closed.reverseIterator
  }

  /** Wire the interval maintainer over an event stream. */
  def intervals(spark: SparkSession, events: Dataset[Ev]): Dataset[ClosedInterval] = {
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(onUser)
  }
}
