package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream-static AS-OF enrichment — the single most common production
  * structured-streaming shape: each micro-batch of the event stream
  * joins a slowly-changing dimension (the SCD2 table of
  * [[graft.ops.EventOps.scd2Intervals]] / [[StreamScd2]]), picking the
  * dimension row whose validity interval covers the EVENT'S OWN event
  * time — never "whatever the dimension says right now".
  *
  * Snapshot consistency: the dimension is resolved ONCE per
  * micro-batch (`dimSnapshot()` inside foreachBatch — point it at a
  * committed read like [[graft.lake.Catalog.loadLakeSnapshot]] and
  * every event of a batch is enriched against one immutable version;
  * a dimension update lands between batches, never inside one). A
  * dimension update mid-stream therefore changes enrichment of LATER
  * batches only — and because the join is interval-keyed, a new
  * version row only captures events whose event time falls inside its
  * interval, so replays and late events stay correctly attributed.
  *
  * Scale: the dimension is broadcast (SCD2 dims are entity-sized, not
  * event-sized — the canonical case); the stream side never shuffles.
  * A dimension too big to broadcast swaps in the banded range join of
  * [[graft.ops.Behavior.multiTouch]] with the same predicate —
  * identical semantics, one extra shuffle. */
object StreamEnrich {

  /** Enrich one event frame (`user_id`, `event_id`, `ts_ms`, payload…)
    * against one SCD2 dimension snapshot
    * (`user_id`, `state`, `valid_from_ms`, `valid_to_ms` — null = open
    * row). Left join: events before any dimension row carry state
    * 'unknown'. Intervals are half-open [from, to), so an event at an
    * update's boundary belongs to the NEW version exactly once. */
  def enrichBatch(events: DataFrame, dim: DataFrame): DataFrame = {
    val d = broadcast(dim.select(col("user_id").as("d_user_id"),
      col("state"), col("valid_from_ms"), col("valid_to_ms")))
    events.join(d,
        events("user_id") === col("d_user_id") &&
        events("ts_ms") >= col("valid_from_ms") &&
        (col("valid_to_ms").isNull || events("ts_ms") < col("valid_to_ms")),
        "left")
      .select(events.columns.map(events(_)) :+
        coalesce(col("state"), lit("unknown")).as("state"): _*)
  }

  /** The UNION + carry-forward-window formulation of [[enrichBatch]]
    * for a dimension too big to broadcast (entity count ≈ event
    * count): dimension version-starts and events merge into ONE frame,
    * shuffle ONCE on the entity key, and a running `last(…, ignoreNulls)`
    * window carries each user's latest (state, interval-end) forward in
    * event-time order — the standard distributed as-of shape, no
    * broadcast, no interval explode (open-ended intervals make banding
    * unbounded). Events past a closed interval's end null out to
    * 'unknown', so gaps behave exactly like [[enrichBatch]]'s interval
    * join; requires the SCD2 invariant (non-overlapping intervals per
    * user), under which the two formulations are row-identical
    * (spec-pinned on the real corpus). A dimension row at t and an
    * event at the same t order (dim, event) — the half-open [from, to)
    * boundary rule. */
  def enrichBatchMerge(events: DataFrame, dim: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val evStruct = org.apache.spark.sql.types.StructType(events.schema.fields)
    val tagged = events.select(
        col("user_id").as("k_user"), col("ts_ms").as("t"), lit(1).as("kind"),
        lit(null).cast("string").as("d_state"),
        lit(null).cast("long").as("d_to"),
        struct(events.columns.map(col): _*).as("ev"))
      .unionByName(dim.select(
        col("user_id").as("k_user"), col("valid_from_ms").as("t"), lit(0).as("kind"),
        col("state").as("d_state"),
        coalesce(col("valid_to_ms"), lit(Long.MaxValue)).as("d_to"),
        lit(null).cast(evStruct).as("ev")))
    val w = Window.partitionBy(col("k_user")).orderBy(col("t"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(
      when(col("kind") === 0, struct(col("d_state"), col("d_to"))),
      ignoreNulls = true).over(w)
    tagged
      .withColumn("dim", carried)
      .filter(col("kind") === 1)
      .select((events.columns.map(c => col(s"ev.$c")) :+
        when(col("dim").isNull || col("t") >= col("dim.d_to"), lit("unknown"))
          .otherwise(col("dim.d_state")).as("state")): _*)
  }

  /** Wire the enrichment over a streaming event frame. `dimSnapshot`
    * is called once per micro-batch and must return a CONSISTENT
    * dimension read (a committed snapshot, not a live directory a
    * writer may be mid-publish in); `sink` receives the enriched
    * batch (already-snapshot-consistent, safe to append anywhere). */
  def start(events: DataFrame, dimSnapshot: () => DataFrame,
      sink: (DataFrame, Long) => Unit, checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(enrichBatch(batch, dimSnapshot()), batchId)
      }
      .start()
}
