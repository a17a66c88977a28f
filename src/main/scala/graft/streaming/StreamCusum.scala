package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift monitor (Page 1954, the tabular cumulative-
  * sum chart): per monitored key, fold each observation into the
  * one-sided statistics
  * `S⁺ ← max(0, S⁺ + (x − μ₀ − κ))`, `S⁻ ← max(0, S⁻ + (μ₀ − κ − x))`
  * and raise an alarm row whenever either crosses the decision
  * interval `h` (then reset that side — the standard restart-after-
  * signal protocol). CUSUM detects small persistent mean SHIFTS far
  * sooner than per-batch threshold checks, which is exactly the
  * production-drift alarm a training-data intake runs per source
  * (the streaming counterpart of the batch two-sample KS audit,
  * `q_length_drift`).
  *
  * The reference (μ₀, κ, h) is TRAINED BATCH-SIDE on a trusted corpus
  * ([[reference]]: μ₀ = mean, κ = σ/2, h = 5σ — the textbook design
  * for detecting a 1σ shift) and shipped as a small model map, the
  * `Selection.dsirLlrTable` train-batch/apply-stream pattern.
  *
  * Determinism under streaming: arrivals inside a micro-batch carry
  * no order, so the fold sorts each batch's rows by the caller's
  * monotone `seq` (and state carries across batches) — the fold is
  * then a pure function of the observation SEQUENCE, which is what
  * StreamCusumSpec pins: one batch vs any batch framing produce
  * byte-identical alarm streams. Integer micro-units everywhere
  * (values ×1e6) — no float accumulation to drift across framings.
  *
  * Scale: state is 4 longs per monitored key, partitioned by key;
  * alarms are emitted rows, not state. The 100 TB posture is the
  * standard keyed-state story ([[StatefulSessions]]).
  */
object StreamCusum {

  /** One observation: `key` = monitored stream, `seq` = caller's
    * monotone order (event id, file offset …), `xMicro` = value in
    * integer micro-units. */
  final case class Obs(key: String, seq: Long, xMicro: Long)

  /** Reference model per key, integer micro-units. */
  final case class Ref(key: String, muMicro: Long, kappaMicro: Long, hMicro: Long)

  /** `lastSeq` is the highest seq already folded; `nLate` counts
    * observations DROPPED for arriving at or below it (the late-data
    * policy — see [[onKey]]). */
  final case class CusumState(sPos: Long, sNeg: Long, nSeen: Long, nAlarms: Long,
      lastSeq: Long = Long.MinValue, nLate: Long = 0L)

  /** An alarm: the side that crossed, at which observation, with the
    * crossing statistic. */
  final case class Alarm(key: String, seq: Long, side: String,
      statMicro: Long, nSeen: Long)

  /** Train the reference batch-side: μ₀ = mean, κ = σ/2, h = 5σ over
    * a trusted frame of (key, xMicro). Model-sized output (one row
    * per key). */
  def reference(trusted: Dataset[(String, Long)]): Map[String, Ref] = {
    import org.apache.spark.sql.functions._
    trusted.toDF("key", "x")
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), avg(col("x")).as("mu"),
        stddev_pop(col("x")).as("sigma"))
      .collect()
      .map { r =>
        val mu = math.round(r.getAs[Double]("mu"))
        val sigma = math.round(r.getAs[Double]("sigma"))
        r.getAs[String]("key") -> Ref(r.getAs[String]("key"),
          mu, math.max(sigma / 2, 1L), math.max(5L * sigma, 1L))
      }.toMap
  }

  /** Pure per-key fold — unit-testable without a stream. Observations
    * are sorted by `seq` so the result is framing-independent WITHIN a
    * batch; ACROSS batches the state's `lastSeq` high-water mark makes
    * it explicit: an observation whose seq is at or below what was
    * already folded in an earlier micro-batch cannot be folded in order
    * any more, so it is DROPPED (counted in `nLate`) rather than folded
    * out of order — silently changing already-emitted alarm positions
    * is the one thing a drift monitor must not do. This also dedupes
    * at-least-once redelivery of an already-folded seq. */
  def onKey(refs: Map[String, Ref])(key: String, rows: Iterator[Obs],
      state: GroupState[CusumState]): Iterator[Alarm] = {
    // unmonitored key: no reference, no state, no alarms
    if (!refs.contains(key)) return Iterator.empty
    val ref = refs(key)
    var s = state.getOption.getOrElse(CusumState(0L, 0L, 0L, 0L))
    val alarms = List.newBuilder[Alarm]
    rows.toSeq.sortBy(_.seq).foreach { o =>
      if (o.seq <= s.lastSeq) {
        // late or redelivered: already folded past this seq
        s = s.copy(nLate = s.nLate + 1)
      } else {
        val dev = o.xMicro - ref.muMicro
        var sPos = math.max(0L, s.sPos + dev - ref.kappaMicro)
        var sNeg = math.max(0L, s.sNeg - dev - ref.kappaMicro)
        val n = s.nSeen + 1
        var nAlarms = s.nAlarms
        if (sPos > ref.hMicro) {
          alarms += Alarm(key, o.seq, "high", sPos, n)
          sPos = 0L; nAlarms += 1
        }
        if (sNeg > ref.hMicro) {
          alarms += Alarm(key, o.seq, "low", sNeg, n)
          sNeg = 0L; nAlarms += 1
        }
        s = CusumState(sPos, sNeg, n, nAlarms, o.seq, s.nLate)
      }
    }
    state.update(s)
    alarms.result().iterator
  }

  /** Wire the monitor over a streaming observation frame. */
  def monitor(spark: SparkSession, obs: Dataset[Obs],
      refs: Map[String, Ref]): Dataset[Alarm] = {
    import spark.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(onKey(refs))
  }
}
