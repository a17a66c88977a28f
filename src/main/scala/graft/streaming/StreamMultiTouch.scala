package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming multi-touch attribution — the batch family
  * ([[graft.ops.Behavior.multiTouch]] /
  * [[graft.ops.Behavior.multiTouchDecay]] /
  * [[graft.ops.Behavior.multiTouchUShape]]) run incrementally: per
  * user, each purchase splits its value across ALL in-window prior
  * touches at arrival under a pluggable WEIGHT RULE (equal, 2^(7−age)
  * position-decay, or 40/20/40 U-shaped), integer e6 credits with the
  * remainder to the latest touch — the batch queries' exact
  * conservation rule — and 'direct' when none. Completes the
  * attribution pair next to [[StreamAttribution]]'s O(1)-state
  * last-touch store.
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

  /** The weight rule applied to a purchase's eligible touches. */
  sealed trait Rule extends Serializable
  /** Equal split (the original linear rule). */
  case object Linear extends Rule
  /** 2^(7−ageDays) recency decay, clamped at weight 1 beyond 7 days —
    * the [[graft.ops.Behavior.multiTouchDecay]] arithmetic. */
  case object Decay extends Rule
  /** 40/20/40 position rule: first = last = 2·(n−2), middle = 1 for
    * n ≥ 3; even split below — [[graft.ops.Behavior.multiTouchUShape]]. */
  case object UShaped extends Rule

  /** Integer weights for touches sorted ascending by (tsUs, seq),
    * identical to the batch queries' window arithmetic. */
  private[graft] def weightsFor(rule: Rule,
      sorted: List[(String, Long, Long)], pUs: Long): List[Long] = rule match {
    case Linear => List.fill(sorted.length)(1L)
    case Decay => sorted.map { case (_, tus, _) =>
      val shift = 7L - (pUs - tus) / 86400000000L
      if (shift <= 0L) 1L else 1L << shift.toInt
    }
    case UShaped =>
      val n = sorted.length
      if (n <= 2) List.fill(n)(1L)
      else sorted.indices.map(i =>
        if (i == 0 || i == n - 1) 2L * (n - 2) else 1L).toList
  }

  /** Pure per-user fold — unit-testable without a stream. */
  def onKey(lookbackUs: Long, rule: Rule = Linear)(user: Long, rows: Iterator[Ev],
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
            val sorted = eligible.sortBy { case (_, tus, tid) => (tus, tid) }
            val ws = weightsFor(rule, sorted, e.tsUs)
            val totW = ws.sum
            val total = e.cents * 1000000L
            val bases = ws.map(w => total * w / totW)
            val rem = total - bases.sum // exact: the latest touch absorbs it
            sorted.zip(bases).zipWithIndex.foreach { case (((ch, _, _), b), i) =>
              out += Credit(user, e.seq, ch,
                b + (if (i == sorted.length - 1) rem else 0L))
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
      lookbackUs: Long = 7L * 86400 * 1000000,
      rule: Rule = Linear): Dataset[Credit] = {
    import spark.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(onKey(lookbackUs, rule))
  }
}
