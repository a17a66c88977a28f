package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CEP: the `PATTERN (view click purchase)` automaton of
  * the batch query `q_seq_pattern` ([[graft.ops.Behavior.seqPattern]])
  * run incrementally over an unbounded keyed stream — the Flink-CEP /
  * MATCH_RECOGNIZE role in the stack. Per user, a match is three
  * CONSECUTIVE events of the filtered alphabet in seq order typed
  * view, click, purchase with the whole triple inside `spanMs`;
  * events outside the alphabet are invisible (dropped upstream),
  * alphabet events that break the prefix restart it.
  *
  * Determinism under streaming (the [[StreamCusum]] contract): each
  * micro-batch's rows sort by the caller's monotone `seq`, state
  * carries the last two alphabet events ACROSS batches (a triple
  * split by a batch boundary is still found — pinned framing-
  * invariant in StreamPatternSpec), and a row arriving at or below
  * the folded high-water mark is dropped and counted rather than
  * folded out of order — an emitted match can never be retracted.
  *
  * Scale: state is two (type, ts) slots + two longs per ACTIVE user,
  * partitioned by user; matches are emitted rows. Pattern length k
  * generalizes to a k−1-slot buffer — state stays O(k), never
  * O(events). */
object StreamPattern {

  /** One alphabet event; `seq` = caller's monotone order. */
  final case class Ev(user: Long, seq: Long, eventType: String, tsMs: Long)

  /** Last two alphabet events (rolling window of the automaton),
    * plus the late-data bookkeeping. */
  final case class PatternState(t1: String, ts1: Long, t2: String, ts2: Long,
      lastSeq: Long = Long.MinValue, nLate: Long = 0L)

  /** A completed match, stamped at its final event. */
  final case class Match(user: Long, seq: Long, startTs: Long, endTs: Long,
      spanMs: Long)

  /** The pattern alphabet in match order. */
  val Pattern: Seq[String] = Seq("view", "click", "purchase")

  /** Pure per-user fold — unit-testable without a stream. */
  def onKey(spanMs: Long)(user: Long, rows: Iterator[Ev],
      state: GroupState[PatternState]): Iterator[Match] = {
    var s = state.getOption.getOrElse(PatternState("", 0L, "", 0L))
    val out = List.newBuilder[Match]
    rows.toSeq.sortBy(_.seq).foreach { e =>
      if (e.seq <= s.lastSeq) {
        s = s.copy(nLate = s.nLate + 1)
      } else {
        if (s.t1 == Pattern(0) && s.t2 == Pattern(1) && e.eventType == Pattern(2) &&
            e.tsMs - s.ts1 <= spanMs)
          out += Match(user, e.seq, s.ts1, e.tsMs, e.tsMs - s.ts1)
        s = PatternState(s.t2, s.ts2, e.eventType, e.tsMs, e.seq, s.nLate)
      }
    }
    state.update(s)
    out.result().iterator
  }

  /** Wire the matcher over a streaming alphabet-event frame (filter
    * to [[Pattern]]'s types upstream — other types must not reach the
    * automaton, mirroring the batch query's scan-level filter). */
  def matches(spark: SparkSession, events: Dataset[Ev],
      spanMs: Long = 172800000L): Dataset[Match] = {
    import spark.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(onKey(spanMs))
  }
}
