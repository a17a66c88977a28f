package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming linear multi-touch attribution: the batch `q_multi_touch`
  * split rule ([[graft.ops.Behavior.multiTouch]]) run incrementally —
  * per user, each purchase splits its value equally across ALL
  * in-window prior touches at arrival (integer e6 credits, remainder
  * to the latest touch — the batch query's exact conservation rule),
  * 'direct' when none. Completes the attribution pair next to
  * [[StreamAttribution]]'s O(1)-state last-touch store.
  *
  * State: the touches inside the lookback window per active user —
  * bounded by per-user activity rate × window, NOT by stream length:
  * events fold in monotone seq (= event-time) order, so every touch
  * older than `newest event − lookback` can never credit a future
  * purchase and is evicted as the window slides.
  *
  * Determinism: the [[StreamCusum]]/[[StreamPattern]] contract —
  * per-batch sort on the caller's monotone seq, cross-batch state
  * carry, late rows dropped-and-counted (an emitted credit is never
  * retracted, a redelivered purchase never double-credits). */
object StreamMultiTouch {

  /** One event; `seq` = caller's monotone (event-time, id) order. */
  final case class Ev(user: Long, seq: Long, eventType: String, tsUs: Long,
      cents: Long)

  /** In-window touches (ascending tsUs) + late-data bookkeeping. */
  final case class TouchWindow(touches: List[(String, Long, Long)],
      lastSeq: Long = Long.MinValue, nLate: Long = 0L)

  /** One credit of a purchase to a channel. */
  final case class Credit(user: Long, pSeq: Long, channel: String, creditE6: Long)

  /** Pure per-user fold — unit-testable without a stream. */
  def onKey(lookbackUs: Long)(user: Long, rows: Iterator[Ev],
      state: GroupState[TouchWindow]): Iterator[Credit] = {
    var s = state.getOption.getOrElse(TouchWindow(Nil))
    val out = List.newBuilder[Credit]
    rows.toSeq.sortBy(_.seq).foreach { e =>
      if (e.seq <= s.lastSeq) {
        s = s.copy(nLate = s.nLate + 1)
      } else {
        // slide the window: touches that can no longer credit anything
        // (strictly older than e.ts − lookback) leave the state
        val live = s.touches.filter { case (_, tus, _) => e.tsUs - tus <= lookbackUs }
        if (e.eventType == "purchase") {
          val eligible = live.filter { case (_, tus, _) => tus < e.tsUs }
          if (eligible.isEmpty) {
            out += Credit(user, e.seq, "direct", e.cents * 1000000L)
          } else {
            val n = eligible.length
            val base = e.cents * 1000000L / n
            val rem = e.cents * 1000000L % n
            val latest = eligible.maxBy { case (_, tus, tid) => (tus, tid) }
            eligible.foreach { t =>
              out += Credit(user, e.seq, t._1, base + (if (t == latest) rem else 0L))
            }
          }
          s = TouchWindow(live, e.seq, s.nLate)
        } else {
          s = TouchWindow(live :+ ((e.eventType, e.tsUs, e.seq)), e.seq, s.nLate)
        }
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
