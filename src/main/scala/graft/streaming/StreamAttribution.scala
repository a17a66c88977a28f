package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution: the batch `q_attribution` rule
  * ([[graft.ops.Behavior.attribution]]) run incrementally — per user,
  * every purchase is credited at arrival to the most recent
  * non-purchase touch within the lookback window, 'direct' otherwise.
  * The batch query answers "what did history attribute"; this store
  * answers it record-by-record as the stream arrives, with identical
  * results (stream ≡ batch pinned in StreamAttributionSpec, including
  * a purchase whose touch landed in an EARLIER micro-batch).
  *
  * Determinism under streaming (the [[StreamCusum]]/[[StreamPattern]]
  * contract): rows fold in the caller's monotone `seq` order inside a
  * batch, state carries the last touch ACROSS batches, and a row at
  * or below the folded high-water mark is dropped and counted — an
  * emitted credit is never retracted.
  *
  * Scale: state is ONE (type, time) slot + two longs per active user
  * — O(1) regardless of event volume; credits are emitted rows. The
  * per-user partitioning is the same shuffle the batch window pays
  * once, amortized here across the stream's lifetime. */
object StreamAttribution {

  /** One event; `seq` = caller's monotone order, `cents` the exact
    * integer value (purchases carry the credited amount). */
  final case class Ev(user: Long, seq: Long, eventType: String, tsUs: Long,
      cents: Long)

  /** Last non-purchase touch, plus late-data bookkeeping. */
  final case class TouchState(touchType: String, touchUs: Long,
      lastSeq: Long = Long.MinValue, nLate: Long = 0L)

  /** One attributed purchase. */
  final case class Credit(user: Long, seq: Long, channel: String, cents: Long)

  /** Pure per-user fold — unit-testable without a stream. */
  def onKey(lookbackUs: Long)(user: Long, rows: Iterator[Ev],
      state: GroupState[TouchState]): Iterator[Credit] = {
    var s = state.getOption.getOrElse(TouchState("", Long.MinValue))
    val out = List.newBuilder[Credit]
    rows.toSeq.sortBy(_.seq).foreach { e =>
      if (e.seq <= s.lastSeq) {
        s = s.copy(nLate = s.nLate + 1)
      } else if (e.eventType == "purchase") {
        val channel =
          if (s.touchType.nonEmpty && e.tsUs - s.touchUs <= lookbackUs) s.touchType
          else "direct"
        out += Credit(user, e.seq, channel, e.cents)
        s = s.copy(lastSeq = e.seq)
      } else {
        s = TouchState(e.eventType, e.tsUs, e.seq, s.nLate)
      }
    }
    state.update(s)
    out.result().iterator
  }

  /** Wire the attributor over a streaming event frame. */
  def credits(spark: SparkSession, events: Dataset[Ev],
      lookbackUs: Long = 7L * 86400 * 1000000): Dataset[Credit] = {
    import spark.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(onKey(lookbackUs))
  }
}
