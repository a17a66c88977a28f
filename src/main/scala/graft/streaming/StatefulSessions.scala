package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (SURVEY.md §2.2 streaming row, "custom
  * state"): a per-user sessionizer on `flatMapGroupsWithState` — the
  * API for state machines `session_window` can't express (here:
  * session carries running value sum and emits exactly on close, with
  * event-time timeout).
  *
  * State is one [[SessionState]] per active user — bounded by active
  * keys, evicted by timeout; the 100 TB posture is the same as any
  * keyed state: partitioned by user across the cluster, checkpointed
  * incrementally.
  */
object StatefulSessions {

  final case class Event(userId: Long, tsMs: Long, value: Double)
  final case class SessionState(startMs: Long, lastMs: Long, nEvents: Int, sumValue: Double)
  final case class ClosedSession(userId: Long, startMs: Long, endMs: Long,
      nEvents: Int, sumValue: Double)

  val gapMs: Long = 30L * 60 * 1000

  /** Pure transition function — unit-testable without a stream. */
  def onUser(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(ClosedSession(userId, s.startMs, s.lastMs, s.nEvents, s.sumValue))
    }
    val sorted = events.toSeq.sortBy(e => (e.tsMs))
    var closed = List.empty[ClosedSession]
    var cur = state.getOption
    sorted.foreach { e =>
      cur match {
        // late event predating the open session by more than the gap:
        // it can never merge — close it immediately as its own session
        // (watermark already bounds how late it can be)
        case Some(s) if e.tsMs < s.startMs - gapMs =>
          closed ::= ClosedSession(userId, e.tsMs, e.tsMs, 1, e.value)
        // merge: within gap of the session's span (back-extends
        // startMs for late-but-adjacent events)
        case Some(s) if e.tsMs - s.lastMs <= gapMs =>
          cur = Some(s.copy(startMs = math.min(s.startMs, e.tsMs),
            lastMs = math.max(s.lastMs, e.tsMs),
            nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
        case Some(s) =>
          closed ::= ClosedSession(userId, s.startMs, s.lastMs, s.nEvents, s.sumValue)
          cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
        case None =>
          cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // EventTimeTimeout requires a timestamp strictly beyond the
      // current watermark; clamp so a session whose deadline already
      // passed fires on the very next watermark advance.
      state.setTimeoutTimestamp(math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
    }
    closed.reverseIterator
  }

  /** Wire the sessionizer over a watermarked event stream. */
  def sessionize(spark: SparkSession, events: Dataset[Event]): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis($"tsMs"))
      .withWatermark("ts", "1 hour")
      .as[Event]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(onUser)
  }
}
