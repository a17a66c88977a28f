package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream query surface: JSON property extraction, the
  * reference's time-range catalog scan (O11), as-of join, and
  * time-band (range) self-join.
  *
  * O11 provenance: the replay query `Source = :s AND Timestamp BETWEEN
  * :a AND :b` (`/root/reference/src/event_replayer/lambda_function.py:15-41`)
  * — equality on the partition key + range on the sort key, executed
  * storage-side. Re-expressed here over `events` with `event_type` as
  * the source key; Catalyst pushes both predicates into the parquet
  * scan (partition pruning + row-group min/max skipping at scale).
  */
object EventOps {

  /** O11: time-range scan with source equality. Timestamps emitted as
    * epoch-millis BIGINT (ns-precision parquet truncates identically
    * in both engines at ms). */
  def eventTimeRange(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.filter(col("event_type") === "purchase" &&
        col("ts") >= to_timestamp(lit("2024-01-08 00:00:00")) &&
        col("ts") < to_timestamp(lit("2024-01-15 00:00:00")))
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"), col("value"))
      .orderBy(col("event_id"))
  }

  def eventTimeRangeSql: String =
    """SELECT event_id, user_id, epoch_ms(ts::TIMESTAMP) AS ts_ms, value
      |FROM events
      |WHERE event_type = 'purchase'
      |  AND ts >= TIMESTAMP '2024-01-08 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-15 00:00:00'
      |ORDER BY event_id""".stripMargin

  /** JSON scalar extraction from the `props` column. Uses
    * regexp_extract (identical no-match semantics in Spark and DuckDB)
    * so the oracle does not depend on a JSON extension; the engine
    * ALSO exposes from_json/get_json_object — asserted equivalent in
    * the ScalaTest spec. */
  def jsonProps(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.select(col("event_id"), col("event_type"),
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("event_type"))
  }

  def jsonPropsSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)), 4) AS avg_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Pivot: per-user event counts spread across event-type columns —
    * the explicit value list keeps the output schema static (required
    * for determinism AND the 100 TB rule: an unlisted pivot needs a
    * distinct-values pre-pass over the fact table). */
  def eventTypePivot(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Tables.eventTypes
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("user_id"))
  }

  /** Generated from [[Tables.eventTypes]] so the oracle's column list
    * can never drift from the pivot's. */
  def eventTypePivotSql: String = {
    val cases = Tables.eventTypes.map(t =>
      s"  CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
      .mkString(",\n")
    s"""SELECT user_id,
       |$cases
       |FROM events
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin
  }

  /** SCD2 history build — the change-data-capture transform that turns
    * an event log into a slowly-changing-dimension table: per user,
    * collapse consecutive same-type events into runs (gaps-and-islands
    * on the difference of two row_numbers) and emit one VALIDITY
    * INTERVAL per run: `[valid_from_ms, valid_to_ms)` where valid_to is
    * the next run's start and NULL marks the currently-open state. An
    * as-of join against this table answers "what state was user U in at
    * time T" — the other half of the temporal surface (the as-of query
    * itself is [[asofLastOrder]]).
    *
    * Timestamps are integer epoch-millis end-to-end; run numbering
    * carries a unique (ts, event_id) tiebreaker — nothing floats.
    *
    * Scale: both row_numbers and the lead share ONE user_id hash
    * partitioning (Catalyst plans a single exchange; the final
    * user_id%50 sample filter sits on the partition key, so it pushes
    * below the windows and prunes before the shuffle). */
  def scd2Intervals(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
    val wAll = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val wState = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ms"), col("event_id"))
    val runs = ev
      .select(col("user_id"), col("event_type"), col("ts_ms"),
        row_number().over(wAll).cast("long").as("rn"),
        (row_number().over(wAll) - row_number().over(wState)).cast("long").as("island"))
      .groupBy(col("user_id"), col("event_type"), col("island"))
      .agg(min(col("ts_ms")).as("valid_from_ms"),
        min(col("rn")).as("run_no"),
        count(lit(1)).as("n_events"))
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("run_no"))
    runs
      .select(col("user_id"),
        row_number().over(wRun).cast("long").as("run_seq"),
        col("event_type").as("state"), col("valid_from_ms"),
        lead(col("valid_from_ms"), 1).over(wRun).as("valid_to_ms"),
        col("n_events"))
      .filter(col("user_id") % 50 === 0)
      .orderBy(col("user_id"), col("run_seq"))
  }

  def scd2IntervalsSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts::TIMESTAMP) AS ts_ms
      |  FROM events),
      |numbered AS (
      |  SELECT user_id, event_type, ts_ms,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |         ORDER BY ts_ms, event_id) AS BIGINT) AS rn,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |           ORDER BY ts_ms, event_id)
      |       - row_number() OVER (PARTITION BY user_id, event_type
      |           ORDER BY ts_ms, event_id) AS BIGINT) AS island
      |  FROM ev),
      |runs AS (
      |  SELECT user_id, event_type, island,
      |    min(ts_ms) AS valid_from_ms, min(rn) AS run_no,
      |    count(*) AS n_events
      |  FROM numbered GROUP BY user_id, event_type, island)
      |SELECT user_id,
      |  CAST(row_number() OVER w AS BIGINT) AS run_seq,
      |  event_type AS state, valid_from_ms,
      |  lead(valid_from_ms, 1) OVER w AS valid_to_ms,
      |  CAST(n_events AS BIGINT) AS n_events
      |FROM runs
      |WHERE user_id % 50 = 0
      |WINDOW w AS (PARTITION BY user_id ORDER BY run_no)
      |ORDER BY user_id, run_seq""".stripMargin

  /** Time-WEIGHTED average of `value` per user — the aggregation
    * time-series stores make first-class and plain AVG gets wrong: a
    * reading "counts" for as long as it remains current, so each
    * event's value is weighted by the milliseconds until the user's
    * next event (the final, open-ended reading carries no weight).
    *
    * Engine parity: weights and values are integers (centi-scaled
    * value × duration-ms products stay under 2⁶³; the SUMS are decimal
    * so a 1000× event count cannot overflow), and only the final
    * average divides, in one letter-identical double expression.
    *
    * Scale: one user-partitioned window pass (lead) feeding a
    * same-keyed agg — Catalyst reuses the window's clustering, so one
    * shuffle total. */
  def timeWeightedAvg(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"),
        round(col("value") * 100).cast("long").as("v_e2"))
      .withColumn("dur_ms", lead(col("ts_ms"), 1).over(w) - col("ts_ms"))
      .filter(col("dur_ms").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_ms")).as("total_ms"),
        sum((col("v_e2") * col("dur_ms")).cast("decimal(30,0)")).as("svd"),
        sum(col("dur_ms").cast("decimal(20,0)")).as("sd"))
      .select(col("user_id"), col("n_intervals"), col("total_ms"),
        (round(col("svd").cast("double") / col("sd").cast("double") / 100.0, 4) + lit(0.0))
          .as("twa"))
      .orderBy(col("user_id"))
  }

  def timeWeightedAvgSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_ms(ts::TIMESTAMP) AS ts_ms,
      |    CAST(round(value * 100) AS BIGINT) AS v_e2
      |  FROM events),
      |spans AS (
      |  SELECT user_id, v_e2,
      |    lead(ts_ms, 1) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) - ts_ms
      |      AS dur_ms
      |  FROM ev)
      |SELECT user_id, count(*) AS n_intervals,
      |  CAST(sum(dur_ms) AS BIGINT) AS total_ms,
      |  round(CAST(sum(CAST(v_e2 * dur_ms AS DECIMAL(30,0))) AS DOUBLE)
      |        / CAST(sum(CAST(dur_ms AS DECIMAL(20,0))) AS DOUBLE) / 100.0, 4) + 0.0 AS twa
      |FROM spans
      |WHERE dur_ms IS NOT NULL
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** UNPIVOT (melt) — the inverse of [[eventTypePivot]], and proved so
    * in place: this query pivots the per-user event-type counts WIDE
    * and immediately unpivots them back to long form, so a green oracle
    * row (the oracle is the plain two-key GROUP BY) is a machine-checked
    * proof that `unpivot ∘ pivot = identity` on this data. Pivot leaves
    * NULL in cells with no events; the melt drops them, restoring
    * exactly the present (user, type) combinations.
    *
    * Scale: pivot is a single hash aggregate over a FIXED, declared
    * column list (5 types — never a data-driven `.pivot(col)` scan to
    * discover values); unpivot is a per-row generator (5 rows out per
    * input row), shuffle-free. */
  def eventTypeUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Tables.eventTypes
    val wide = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    wide.unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "cnt")
      .filter(col("cnt").isNotNull)
      .orderBy(col("user_id"), col("event_type"))
  }

  def eventTypeUnpivotSql: String =
    """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
      |FROM events
      |GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  /** Correlated subqueries through the SQL surface (IN + correlated
    * scalar): Catalyst decorrelates both into joins — semantically the
    * semi-join / as-of surface, exercised as SQL text. */
  def sqlSubqueries(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT c_custkey, c_name,
        |  (SELECT count(*) FROM orders_v WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer_v
        |WHERE c_custkey IN (SELECT o_custkey FROM orders_v WHERE o_totalprice > 150000)
        |ORDER BY c_custkey""".stripMargin)
  }

  def sqlSubqueriesSql: String =
    """SELECT c_custkey, c_name,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin

  /** Correlated LATERAL top-k — the SQL-surface twin of
    * [[Windows.topOrdersPerCustomer]]: per customer, the 2 largest
    * orders via a correlated ORDER BY … LIMIT subquery in the FROM
    * clause. Catalyst decorrelates the limit into a ranked window over
    * one equi-join (no per-row re-execution), so the plan is the same
    * shuffle shape as the window formulation — the point of registering
    * it is that the SQL surface accepts the idiom at all. */
  def lateralTopOrders(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer_v c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders_v
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey % 100 = 7
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin)
  }

  def lateralTopOrdersSql: String =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |WHERE c.c_custkey % 100 = 7
      |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin

  /** As-of join: for each purchase event, the most recent order date of
    * the matching customer at-or-before the event. Implemented as an
    * equi-join on the user key + max-filter aggregation — at 100 TB the
    * equi key bounds the join fan-out and the agg is per-event; for
    * unkeyed as-of, the union+last_value window formulation applies. */
  def asofLastOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate"))
    ev.join(ord,
        ev("user_id") === ord("o_custkey") && ord("o_orderdate") <= ev("ts"),
        "left")
      .groupBy(col("event_id"), col("user_id"))
      .agg(max(col("o_orderdate")).as("last_order_date"))
      .orderBy(col("event_id"))
  }

  def asofLastOrderSql: String =
    """SELECT event_id, user_id,
      |  (SELECT max(o_orderdate) FROM orders
      |   WHERE o_custkey = user_id AND o_orderdate <= e.ts) AS last_order_date
      |FROM events e
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  /** Range (time-band) self-join: per user, count ordered event pairs
    * within 60 s of each other.
    *
    * Scale shape: a join keyed only on user_id degrades to per-user
    * O(events²) when users are few/heavy. The banded formulation makes
    * the time range part of the EQUI key: the left side explodes into
    * the two 60 s buckets its matches can live in (its own and the
    * next), the right side is keyed by its bucket, and the join is a
    * plain hash join on (user, bucket) with the exact range as a
    * residual filter. Cost is per-(user,minute)-bucket quadratic —
    * bounded — instead of per-user quadratic. */
  def eventPairs60s(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      .withColumn("bucket", floor(col("ts_ms") / 60000L))
    val a = ev.select(col("user_id"), col("event_id").as("id_a"), col("ts_ms").as("ts_a"),
        explode(array(col("bucket"), col("bucket") + 1)).as("bucket"))
    val b = ev.select(col("user_id"), col("event_id").as("id_b"), col("ts_ms").as("ts_b"),
        col("bucket"))
    a.join(b, Seq("user_id", "bucket"))             // equi join on (user, minute bucket)
      .filter(col("ts_b") > col("ts_a") && col("ts_b") - col("ts_a") <= 60000L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  def eventPairs60sSql: String =
    """SELECT a.user_id AS user_id, count(*) AS n_pairs
      |FROM (SELECT user_id, event_id, epoch_ms(ts::TIMESTAMP) AS ts_ms FROM events) a
      |JOIN (SELECT user_id, event_id, epoch_ms(ts::TIMESTAMP) AS ts_ms FROM events) b
      |  ON a.user_id = b.user_id
      | AND b.ts_ms > a.ts_ms
      | AND b.ts_ms - a.ts_ms <= 60000
      |GROUP BY a.user_id
      |ORDER BY user_id""".stripMargin

  /** Time-grid resample with forward fill: for a deterministic user
    * subset (`user_id % 97 = 3`), build a fixed one-hour minute grid
    * from each user's first event and carry the latest observed `value`
    * across empty minutes — the gap-filling step of any time-series
    * feature pipeline (metrics, sensor, clickstream).
    *
    * The grid comes from a generator (`explode(sequence(start, start +
    * 59 min, 1 min))` — 60 rows per user, no range join); the
    * per-minute "latest" is a max-struct (ties impossible: `event_id`
    * is unique), and the fill is `last(_, ignoreNulls)` over a
    * running-rows window. Values are carried, never arithmetically
    * combined, so the double column hash-matches bit-exactly.
    *
    * Scale: one shuffle on `user_id` shared by the per-minute agg, the
    * grid build, and the fill window (all three partition by user);
    * grid size is users × 60 regardless of event density.
    */
  def gapFill(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one declared user_id partitioning serves the WHOLE query: the
    // minute agg clusters by (user_id, m) — a superset of user_id, so
    // no re-shuffle; the grid agg, the left join (co-partitioned on the
    // user_id prefix of the join keys) and the fill window reuse it too
    // (PlanAuditSpec pins the single-exchange plan)
    val ev = Tables.events(spark, sfDir)
      .filter(pmod(col("user_id"), lit(97L)) === 3L)
      .repartition(col("user_id"))
    val perMin = ev
      .groupBy(col("user_id"), date_trunc("minute", col("ts")).as("m"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("latest"))
      .select(col("user_id"), col("m"), col("n_events"),
        col("latest.value").as("last_value"))
    val grid = perMin.groupBy(col("user_id"))
      .agg(min(col("m")).as("start"))
      .select(col("user_id"),
        explode(sequence(col("start"),
          col("start") + expr("INTERVAL 59 MINUTES"),
          expr("INTERVAL 1 MINUTE"))).as("m"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perMin, Seq("user_id", "m"), "left")
      .withColumn("filled_value", last(col("last_value"), ignoreNulls = true).over(w))
      .select(col("user_id"), unix_millis(col("m")).as("minute_ms"),
        coalesce(col("n_events"), lit(0L)).as("n_events"), col("filled_value"))
      .orderBy(col("user_id"), col("minute_ms"))
  }

  /** Relational rate limiter — the usage-plan quota shape
    * ([[graft.lake.Access]]'s gate) expressed as an oracle-checked
    * query: per (user, UTC day), the first `perDay` events by
    * (ts, event_id) are accepted, the rest throttled; output is the
    * per-day admission summary. The default cap of 2 is deliberately
    * low so the test corpus (~2.2 events/user-day) actually throttles.
    *
    * Scale: ONE hash shuffle on (user_id, day) for the ranking window
    * — the partition key every quota system shards by — then a
    * map-side-combined per-day agg. No state beyond the window sort;
    * at 100 TB the same plan shards across executors by user. */
  def rateLimit(spark: SparkSession, sfDir: String, perDay: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      .withColumn("day", expr("ts_ms DIV 86400000"))
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts_ms"), col("event_id"))
    ev.withColumn("rk", row_number().over(w))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("rk") <= perDay, 1L).otherwise(0L)).as("n_accepted"),
        sum(when(col("rk") > perDay, 1L).otherwise(0L)).as("n_throttled"),
        countDistinct(when(col("rk") > perDay, col("user_id"))).as("n_users_throttled"))
      .orderBy(col("day"))
  }

  /** Oracle twin of [[rateLimit]] — `perDay` interpolated, same default. */
  def rateLimitSql(perDay: Int = 2): String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, epoch_ms(ts::TIMESTAMP) AS ts_ms,
       |    epoch_ms(ts::TIMESTAMP) // 86400000 AS day
       |  FROM events),
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, day
       |                               ORDER BY ts_ms, event_id) AS rk
       |  FROM ev)
       |SELECT CAST(day AS BIGINT) AS day,
       |  CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(sum(CASE WHEN rk <= $perDay THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
       |  CAST(sum(CASE WHEN rk > $perDay THEN 1 ELSE 0 END) AS BIGINT) AS n_throttled,
       |  CAST(count(DISTINCT CASE WHEN rk > $perDay THEN user_id END) AS BIGINT)
       |    AS n_users_throttled
       |FROM rk
       |GROUP BY day
       |ORDER BY day""".stripMargin

  def gapFillSql: String =
    """WITH sel AS (
      |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, value
      |  FROM events WHERE user_id % 97 = 3
      |), ranked AS (
      |  SELECT user_id, date_trunc('minute', ts) AS m, value,
      |    row_number() OVER (PARTITION BY user_id, date_trunc('minute', ts)
      |      ORDER BY ts DESC, event_id DESC) AS rk
      |  FROM sel
      |), per_min AS (
      |  SELECT user_id, m, count(*) AS n_events,
      |    max(CASE WHEN rk = 1 THEN value END) AS last_value
      |  FROM ranked GROUP BY user_id, m
      |), starts AS (
      |  SELECT user_id, date_trunc('minute', min(ts)) AS start FROM sel GROUP BY user_id
      |), grid AS (
      |  SELECT user_id,
      |    unnest(generate_series(start, start + INTERVAL 59 MINUTE, INTERVAL 1 MINUTE)) AS m
      |  FROM starts
      |)
      |SELECT g.user_id, epoch_ms(g.m) AS minute_ms,
      |  COALESCE(p.n_events, 0) AS n_events,
      |  last_value(p.last_value IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.m
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
      |FROM grid g LEFT JOIN per_min p ON g.user_id = p.user_id AND g.m = p.m
      |ORDER BY g.user_id, minute_ms""".stripMargin

  /** OHLC downsample — the canonical time-series resample: per
    * (event_type, `bucketMin`-minute bucket), the open/high/low/close
    * of `value` in integer cents plus count and sum. Open/close come
    * from ONE aggregation pass via lexicographic struct min/max over
    * (ts, event_id, cents) — no window, so the agg partial-combines
    * map-side and the shuffle carries one row per (type, bucket) per
    * partition, the shape that survives any event rate. The ORACLE is
    * the ranked-window formulation (first/last by (ts, event_id)), so
    * every green run re-proves the struct-extremum rewrite identical
    * (the `q_argmax_order` pattern). Ties at the same millisecond
    * break on event_id in both formulations.
    *
    * Complements [[gapFill]]: that one upsamples onto a dense grid,
    * this one downsamples to bars.
    */
  def resampleOhlc(spark: SparkSession, sfDir: String,
      bucketMin: Int = 15): DataFrame = {
    val ms = bucketMin * 60000L
    val e = graft.Events.events(spark, sfDir)
      .select(col("event_type"),
        expr(s"unix_millis(ts) DIV $ms").as("bucket"),
        unix_millis(col("ts")).as("ts_ms"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    e.groupBy(col("event_type"), col("bucket"))
      .agg(
        min(struct(col("ts_ms"), col("event_id"), col("cents"))).as("o"),
        max(struct(col("ts_ms"), col("event_id"), col("cents"))).as("c"),
        max(col("cents")).as("high_c"),
        min(col("cents")).as("low_c"),
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_c"))
      .select(col("event_type"), col("bucket"),
        col("o.cents").as("open_c"), col("high_c"), col("low_c"),
        col("c.cents").as("close_c"), col("n_events"), col("sum_c"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Oracle twin of [[resampleOhlc]] — the ranked-window first/last
    * formulation; `bucketMin` interpolated. */
  def resampleOhlcSql(bucketMin: Int = 15): String = {
    val ms = bucketMin * 60000L
    s"""WITH e AS (
       |  SELECT event_type,
       |    epoch_ms(ts::TIMESTAMP) // $ms AS bucket,
       |    epoch_ms(ts::TIMESTAMP) AS ts_ms, event_id,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events
       |), r AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY event_type, bucket
       |      ORDER BY ts_ms, event_id) AS rn_a,
       |    row_number() OVER (PARTITION BY event_type, bucket
       |      ORDER BY ts_ms DESC, event_id DESC) AS rn_d
       |  FROM e
       |)
       |SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       |  CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_c,
       |  max(cents) AS high_c,
       |  min(cents) AS low_c,
       |  CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_c,
       |  count(*) AS n_events,
       |  CAST(sum(cents) AS BIGINT) AS sum_c
       |FROM r
       |GROUP BY event_type, bucket
       |ORDER BY event_type, bucket""".stripMargin
  }

  // --------------------------------------------------------------------
  // Zone-map / data-skipping index
  // --------------------------------------------------------------------

  /** The min/max zone map plus its skip audit — the file-level
    * data-skipping structure (parquet row-group stats, Delta/Iceberg
    * file stats) made relational: events collapse to write-order zones
    * of `zoneRows` rows (`event_id DIV zoneRows` — the row-group
    * analog for an append-ordered table), each zone carrying min/max
    * event-time and user-id bounds, and `can_skip` says whether the
    * [[eventTimeRange]] week predicate can prove the zone empty from
    * BOUNDS ALONE. `n_match` (the true qualifying count) is in the
    * same row, so the output itself certifies soundness: every
    * `can_skip` zone must show `n_match = 0` — and the skipped-zone
    * fraction is the scan I/O a stats-pruned reader saves.
    *
    * At 100 TB this is the planning table for layout decisions: a low
    * skip fraction on a hot predicate column says the table needs
    * re-sorting ([[graft.lake.ZOrder]]) or partitioning on that column
    * ([[graft.lake.Catalog]] prunes directories the same way).
    *
    * Scale: one hash agg on the zone key (map-side combined, ~rows/
    * zoneRows output rows), no joins, no windows. */
  def zoneMap(spark: SparkSession, sfDir: String, zoneRows: Long = 1000): DataFrame = {
    val lo = to_timestamp(lit("2024-01-08 00:00:00"))
    val hi = to_timestamp(lit("2024-01-15 00:00:00"))
    Tables.events(spark, sfDir)
      .select(expr(s"event_id DIV $zoneRows").as("zone"), col("ts"), col("user_id"))
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("n_rows"),
        unix_millis(min(col("ts"))).as("min_ts_ms"),
        unix_millis(max(col("ts"))).as("max_ts_ms"),
        min(col("user_id")).as("min_user"),
        max(col("user_id")).as("max_user"),
        sum(when(col("ts") >= lo && col("ts") < hi, 1L).otherwise(0L)).as("n_match"))
      .withColumn("can_skip",
        (unix_millis(hi) <= col("min_ts_ms")) || (col("max_ts_ms") < unix_millis(lo)))
      .orderBy(col("zone"))
  }

  /** Oracle twin of [[zoneMap]] — `zoneRows` interpolated, the same
    * literal week as [[eventTimeRangeSql]]. */
  def zoneMapSql(zoneRows: Long = 1000): String =
    s"""SELECT event_id // $zoneRows AS zone,
       |  count(*) AS n_rows,
       |  epoch_ms(min(ts::TIMESTAMP)) AS min_ts_ms,
       |  epoch_ms(max(ts::TIMESTAMP)) AS max_ts_ms,
       |  CAST(min(user_id) AS BIGINT) AS min_user,
       |  CAST(max(user_id) AS BIGINT) AS max_user,
       |  CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-08 00:00:00'
       |                 AND ts < TIMESTAMP '2024-01-15 00:00:00'
       |            THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       |  (epoch_ms(TIMESTAMP '2024-01-15 00:00:00') <= epoch_ms(min(ts::TIMESTAMP))
       |   OR epoch_ms(max(ts::TIMESTAMP)) < epoch_ms(TIMESTAMP '2024-01-08 00:00:00')) AS can_skip
       |FROM events
       |GROUP BY event_id // $zoneRows
       |ORDER BY zone""".stripMargin

  // --------------------------------------------------------------------
  // Small-file compaction planner (bin packing by cumulative size)
  // --------------------------------------------------------------------

  /** The small-files compaction plan — what Delta `OPTIMIZE` /
    * Iceberg `rewrite_data_files` computes before they move a byte:
    * the lake's objects (simulated here as one object per
    * (event_type, hour) with its payload byte count, the
    * [[graft.lake.StreamIngest]] buffering grain) are bin-packed
    * into target-sized compaction groups by a running prefix sum —
    * group = ⌊bytes-before / target⌋ within each event_type's
    * hour-ordered object sequence. First-fit-by-write-order keeps
    * every group a CONTIGUOUS hour range (the property that lets the
    * rewritten file carry a tight min/max zone, see [[zoneMap]]).
    *
    * At 100 TB this query IS the compaction scheduler's input: a
    * 60 s streaming sink writes ~1.4 M objects/day/source, and scan
    * throughput dies by file-open overhead unless something plans
    * exactly this rewrite (the reference has the same disease — one
    * gzip object per Firehose buffer flush).
    *
    * Scale: one agg to object granularity (map-side combined), a
    * window partitioned by event_type over object-count rows (not
    * event rows), one more agg. All integers. */
  def compactionPlan(spark: SparkSession, sfDir: String,
      targetBytes: Long = 131072L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_millis(ts) DIV 3600000").as("hour"),
        (coalesce(length(col("props")), lit(0)) + lit(64)).cast("long").as("bytes"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("bytes")).as("obj_bytes"))
      .withColumn("cum_before", coalesce(sum(col("obj_bytes")).over(w), lit(0L)))
      .withColumn("grp", expr(s"cum_before DIV $targetBytes"))
      .groupBy(col("event_type"), col("grp"))
      .agg(count(lit(1)).as("n_objects"),
        sum(col("obj_bytes")).as("bytes_total"),
        sum(col("n_events")).as("n_events"),
        min(col("hour")).as("hour_min"),
        max(col("hour")).as("hour_max"))
      .orderBy(col("event_type"), col("grp"))
  }

  /** Oracle twin of [[compactionPlan]] — `targetBytes` interpolated. */
  def compactionPlanSql(targetBytes: Long = 131072L): String =
    s"""WITH objs AS (
       |  SELECT event_type, epoch_ms(ts::TIMESTAMP) // 3600000 AS hour,
       |    count(*) AS n_events,
       |    CAST(sum(coalesce(length(props), 0) + 64) AS BIGINT) AS obj_bytes
       |  FROM events
       |  GROUP BY event_type, epoch_ms(ts::TIMESTAMP) // 3600000),
       |packed AS (
       |  SELECT *,
       |    coalesce(sum(obj_bytes) OVER (PARTITION BY event_type ORDER BY hour
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM objs)
       |SELECT event_type, CAST(cum_before // $targetBytes AS BIGINT) AS grp,
       |  count(*) AS n_objects,
       |  CAST(sum(obj_bytes) AS BIGINT) AS bytes_total,
       |  CAST(sum(n_events) AS BIGINT) AS n_events,
       |  CAST(min(hour) AS BIGINT) AS hour_min,
       |  CAST(max(hour) AS BIGINT) AS hour_max
       |FROM packed
       |GROUP BY event_type, cum_before // $targetBytes
       |ORDER BY event_type, grp""".stripMargin

  // --------------------------------------------------------------------
  // Z-order locality audit (multi-dimensional data skipping)
  // --------------------------------------------------------------------

  /** Bits per interleaved dimension; zones tile 8×8 cells. */
  private val ZBits = 8

  /** Z-address arithmetic — bit i of x lands at position 2i+1, bit i
    * of y at 2i, written as pure integer div/mod/multiply so the SAME
    * formula runs in Spark (`DIV`) and DuckDB (`//`). */
  private def zExpr(x: String, y: String, div: String): String =
    (0 until ZBits).map { i =>
      val b = 1L << i
      s"(($x $div $b) % 2) * ${1L << (2 * i + 1)} + (($y $div $b) % 2) * ${1L << (2 * i)}"
    }.mkString(" + ")

  /** The multi-dimensional data-skipping audit [[zoneMap]] can't do:
    * rows carry a 2-D key (user bucket x = user_id mod 256, hour
    * bucket y = hour-of-epoch mod 256) interleaved into a Z-address
    * (Morton order — the Delta/Iceberg `ZORDER BY` curve), and zones
    * are Z-RANGES of 64 cells, i.e. aligned 8×8 tiles in (x, y).
    * Each zone reports its x/y bounds plus the true match count for
    * a rectangle predicate (an x band × y band), and `can_skip` says
    * the bounds alone prove the zone empty. Because Z-range zones
    * are spatially tight in BOTH dimensions, the skipped fraction
    * stays high for 2-D predicates — where write-order zones
    * ([[zoneMap]]) only ever bound the time axis. The output row set
    * certifies soundness (every can_skip zone shows n_match = 0) and
    * measures the curve's benefit as data.
    *
    * Scale: one hash agg on the computed zone key — map-side
    * combined, ≤1024 output rows at any corpus size, no joins, no
    * sort (the Z-curve is ARITHMETIC on each row; laying files out
    * in this order is [[graft.lake.ZOrder]]'s job). */
  def zorderSkip(spark: SparkSession, sfDir: String): DataFrame = {
    val z = zExpr("(user_id % 256)", "((unix_millis(ts) DIV 3600000) % 256)", "DIV")
    // predicate rectangle: x ∈ [96, 160), y ∈ [8, 16)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"),
        (col("user_id") % 256).as("x"),
        expr("(unix_millis(ts) DIV 3600000) % 256").as("y"),
        expr(s"($z) DIV 64").as("zone"))
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        sum(when(col("x") >= 96 && col("x") < 160 &&
          col("y") >= 8 && col("y") < 16, 1L).otherwise(0L)).as("n_match"))
      .withColumn("can_skip",
        col("max_x") < 96 || col("min_x") >= 160 ||
        col("max_y") < 8 || col("min_y") >= 16)
      .orderBy(col("zone"))
  }

  /** Oracle twin of [[zorderSkip]] — the identical Z-address
    * arithmetic in DuckDB's `//` dialect. */
  def zorderSkipSql: String = {
    val z = zExpr("(user_id % 256)", "((epoch_ms(ts::TIMESTAMP) // 3600000) % 256)", "//")
    s"""WITH cells AS (
       |  SELECT user_id % 256 AS x,
       |    (epoch_ms(ts::TIMESTAMP) // 3600000) % 256 AS y,
       |    ($z) // 64 AS zone
       |  FROM events)
       |SELECT zone, count(*) AS n_rows,
       |  CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
       |  CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y,
       |  CAST(sum(CASE WHEN x >= 96 AND x < 160 AND y >= 8 AND y < 16
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       |  (max(x) < 96 OR min(x) >= 160 OR max(y) < 8 OR min(y) >= 16) AS can_skip
       |FROM cells
       |GROUP BY zone
       |ORDER BY zone""".stripMargin
  }

  // --------------------------------------------------------------------
  // Time-series analysis: the zero-filled per-type daily series shared
  // by autocorrelation, Holt forecasting and changepoint detection
  // --------------------------------------------------------------------

  /** Zero-filled per-(event_type, day-index) daily counts: the dense
    * series every time-series operator below consumes. `t` runs 0..N−1
    * from the corpus's own min day (one scalar agg, broadcast); absent
    * (type, day) cells are materialized at 0 — a sparse series would
    * silently skew means, lags and trends. ONE events pass: the
    * (type, day) count table is [[Truncate]]d, so span/types/grid and
    * every consumer join arm (autocorr references the series from four
    * arms) derive from the materialized model-sized table instead of
    * re-scanning events. */
  private def dailySeries(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_millis(ts) DIV 86400000").as("day"))
    // the ONE events pass, materialized: span, types, the grid and the
    // consumers' join arms all derive from this model-sized table
    val counts = Truncate(ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x")), "daily-counts")
    val span = counts.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val types = counts.select(col("event_type")).distinct()
    types.crossJoin(broadcast(span))
      .select(col("event_type"), col("d0"),
        explode(sequence(lit(0L), col("d1") - col("d0"))).as("t"))
      .join(counts.crossJoin(broadcast(span))
          .select(col("event_type"), (col("day") - col("d0")).as("t"), col("x")),
        Seq("event_type", "t"), "left")
      .na.fill(0L, Seq("x"))
      .select(col("event_type"), col("t"), col("x").cast("long").as("x"))
  }

  /** Shared WITH-body for the zero-filled daily series (CTE `series`):
    * the oracle twin of [[dailySeries]]. */
  private val dailySeriesCteSql: String =
    """ev AS (
      |  SELECT event_type, epoch_ms(ts::TIMESTAMP) // 86400000 AS day FROM events),
      |counts AS (
      |  SELECT event_type, day, CAST(count(*) AS BIGINT) AS x
      |  FROM ev GROUP BY event_type, day),
      |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |grid AS (
      |  SELECT t.event_type, g.t
      |  FROM (SELECT DISTINCT event_type FROM counts) t
      |  CROSS JOIN (SELECT unnest(generate_series(0, (SELECT d1 - d0 FROM span))) AS t) g),
      |series AS (
      |  SELECT grid.event_type, grid.t, CAST(COALESCE(c.x, 0) AS BIGINT) AS x
      |  FROM grid LEFT JOIN (
      |    SELECT event_type, day - (SELECT d0 FROM span) AS t, x FROM counts) c
      |  ON c.event_type = grid.event_type AND c.t = grid.t)""".stripMargin

  /** Autocorrelation of the daily event series at lags 1/2/7 — the
    * seasonality probe (lag-7 = weekly structure) that decides whether
    * a forecast needs seasonal terms. Exactness: with S = Σx and N
    * days, every deviation is the INTEGER N·x_t − S (the mean cleared
    * of division), so numerator and denominator are exact BIGINT folds;
    * the single double division is rounded once to e6. The lag join is
    * a self equi-join of the model-sized series on (type, t+k).
    *
    * Scale: one events pass builds the series; the lag join and the
    * folds touch types × days rows. */
  def autocorr(spark: SparkSession, sfDir: String,
      lags: Seq[Int] = Seq(1, 2, 7)): DataFrame = {
    val series = dailySeries(spark, sfDir)
    val stats = series.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    // five consumer arms (lagged + one join per lag + den): truncate
    // the model-sized deviation table once (r15) so the zero-fill grid
    // join doesn't re-derive per arm
    val base = Truncate(series.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("t"), col("n"), col("s"),
        (col("x") * col("n") - col("s")).as("dev")), "autocorr-base")
    val lagged = base.select(col("event_type").as("et2"), col("t").as("t2"),
      col("dev").as("dev2"))
    val lagDf = lags.foldLeft(Option.empty[DataFrame]) { (acc, k) =>
      val pairs = base
        .join(lagged,
          col("event_type") === col("et2") && col("t") + k === col("t2"))
        .groupBy(col("event_type"))
        .agg(lit(k.toLong).as("lag"),
          count(lit(1)).as("n_pairs"),
          sum(col("dev") * col("dev2")).cast("long").as("num"))
      Some(acc.map(_.unionByName(pairs)).getOrElse(pairs))
    }.get
    val den = base.groupBy(col("event_type"))
      .agg(sum(col("dev") * col("dev")).cast("long").as("den"))
    lagDf.join(den, Seq("event_type"))
      .select(col("event_type"), col("lag"), col("n_pairs"), col("num"), col("den"),
        round(lit(1000000.0) * col("num") / col("den")).cast("long").as("r_e6"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** Oracle twin of [[autocorr]]. */
  def autocorrSql(lags: Seq[Int] = Seq(1, 2, 7)): String = {
    val lagList = lags.mkString(", ")
    s"""WITH $dailySeriesCteSql,
       |st AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
       |  FROM series GROUP BY event_type),
       |dev AS (
       |  SELECT series.event_type, t, x * n - s AS dev
       |  FROM series JOIN st ON st.event_type = series.event_type),
       |num AS (
       |  SELECT a.event_type, k.lag, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(a.dev * b.dev) AS BIGINT) AS num
       |  FROM dev a
       |  CROSS JOIN (SELECT unnest([$lagList]) AS lag) k
       |  JOIN dev b ON b.event_type = a.event_type AND b.t = a.t + k.lag
       |  GROUP BY a.event_type, k.lag),
       |den AS (
       |  SELECT event_type, CAST(sum(dev * dev) AS BIGINT) AS den
       |  FROM dev GROUP BY event_type)
       |SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs, num, den,
       |  CAST(round(1000000.0 * num / den) AS BIGINT) AS r_e6
       |FROM num JOIN den USING (event_type)
       |ORDER BY event_type, lag""".stripMargin
  }

  /** Holt linear (double) exponential smoothing over the daily series —
    * the level+trend forecasting primitive (α = ½, β = 3/10): the
    * next-day operational forecast and the trend estimate a capacity
    * planner reads. The recurrence runs on e6-scaled INTEGERS with one
    * FLOOR per step — `l_t = floor((x_t·10⁶ + l + b)/2)`,
    * `b_t = floor((3(l_t − l_{t−1}) + 7b)/10)` — floor is TIE-FREE, so
    * both engines fold the identical integer sequence (a round() here
    * hits exact .5 ties on every odd sum and the engines' tie rules
    * differ; bare integer division diverges on negative trends: Spark
    * DIV truncates, DuckDB // floors — floor(a/2.0) agrees for every
    * sign and the double quotients are exact or safely far from the
    * boundary at these magnitudes).
    *
    * Engine path: the model-sized series collapses to one ordered
    * array per type (`sort_array` of (t, x) structs), and the
    * recurrence is a codegen'd `aggregate` fold — the q_cdc_bytes
    * native-fold discipline; the oracle replays the identical
    * recurrence as a recursive CTE stepping t. */
  def holtForecast(spark: SparkSession, sfDir: String): DataFrame = {
    val series = dailySeries(spark, sfDir)
    series.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("sx"))
      // a 1-day series has no trend to estimate: dropped on BOTH sides
      // (the oracle's init join on t = 1 matches nothing) rather than
      // an ANSI out-of-bounds error on sx[1]
      .filter(size(col("sx")) >= 2)
      .select(col("event_type"),
        size(col("sx")).cast("long").as("n_days"),
        // init l0 = x0·e6, b0 = (x1 − x0)·e6; fold x1..x_{N−1}
        expr("""aggregate(
          slice(transform(sx, e -> e.x), 2, size(sx) - 1),
          named_struct(
            'l', sx[0].x * 1000000L,
            'b', (sx[1].x - sx[0].x) * 1000000L),
          (s, x) -> named_struct(
            'l', CAST(floor((x * 1000000L + s.l + s.b) / 2) AS BIGINT),
            'b', CAST(floor((3 * (CAST(floor((x * 1000000L + s.l + s.b) / 2) AS BIGINT) - s.l)
                 + 7 * s.b) / 10) AS BIGINT)))""").as("h"))
      .select(col("event_type"), col("n_days"),
        col("h.l").as("level_e6"), col("h.b").as("trend_e6"),
        (col("h.l") + col("h.b")).as("forecast_e6"))
      .orderBy(col("event_type"))
  }

  /** Oracle twin of [[holtForecast]] — the identical integer recurrence
    * replayed as a recursive CTE stepping t per type (the q_cdc_bytes
    * bounded-state fold pattern). */
  def holtForecastSql: String =
    s"""WITH RECURSIVE $dailySeriesCteSql,
       |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
       |      FROM series GROUP BY event_type),
       |step(event_type, t, l, b) AS (
       |  SELECT s0.event_type, CAST(0 AS BIGINT),
       |    s0.x * 1000000, (s1.x - s0.x) * 1000000
       |  FROM series s0 JOIN series s1
       |    ON s1.event_type = s0.event_type AND s1.t = 1
       |  WHERE s0.t = 0
       |  UNION ALL
       |  SELECT st.event_type, st.t + 1,
       |    CAST(floor((s.x * 1000000 + st.l + st.b) / 2) AS BIGINT),
       |    CAST(floor((3 * (CAST(floor((s.x * 1000000 + st.l + st.b) / 2) AS BIGINT) - st.l)
       |         + 7 * st.b) / 10) AS BIGINT)
       |  FROM step st JOIN series s
       |    ON s.event_type = st.event_type AND s.t = st.t + 1)
       |SELECT step.event_type, n.n_days,
       |  CAST(l AS BIGINT) AS level_e6, CAST(b AS BIGINT) AS trend_e6,
       |  CAST(l + b AS BIGINT) AS forecast_e6
       |FROM step JOIN n ON n.event_type = step.event_type
       |WHERE step.t = n.n_days - 1
       |ORDER BY step.event_type""".stripMargin

  /** Offline CHANGEPOINT detection over the daily series — one-split
    * binary segmentation: the day that best divides the series into
    * two mean-regimes, scored by the between-segment deviation
    * a_t² / (t·(N−t)) with a_t = S_t·N − S·t (prefix sums cleared of
    * division — a_t is an exact BIGINT, the score one double division
    * rounded to e6). The regime-shift detector next to the online
    * CUSUM monitor ([[graft.streaming.StreamCusum]]): CUSUM alarms in
    * flight, this LOCATES the break in history. Argmax ties break to
    * the smallest t (max-struct, total order).
    *
    * Scale: one events pass → model-sized series → prefix-sum window
    * per type → one argmax agg. */
  def changepoint(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val series = dailySeries(spark, sfDir)
    val w = Window.partitionBy(col("event_type")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = series.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    // a prefix of p days (p = 1..N−1) splits the series; a = S_p·N − S·p
    val pref = series
      .withColumn("st", sum(col("x")).over(w))
      .join(broadcast(tot), Seq("event_type"))
      .withColumn("p", col("t") + 1)
      .filter(col("p") < col("n"))
      .withColumn("a", col("st") * col("n") - col("s") * col("p"))
      .withColumn("score_e6",
        round(lit(1000000.0) * col("a") * col("a") /
          (col("p") * (col("n") - col("p")))).cast("long"))
    pref.groupBy(col("event_type"))
      .agg(max(col("n")).cast("long").as("n_days"),
        max(col("s")).as("s"),
        max(struct(col("score_e6").as("sc"), (-col("p")).as("negp"),
          col("st").as("stv"))).as("best"))
      .select(col("event_type"), col("n_days"),
        (-col("best.negp")).cast("long").as("split_p"),
        col("best.sc").as("score_e6"),
        expr("CAST(round(1000000.0 * best.stv / (-best.negp)) AS BIGINT)")
          .as("mean_before_e6"),
        expr("CAST(round(1000000.0 * (s - best.stv) / (n_days + best.negp)) AS BIGINT)")
          .as("mean_after_e6"))
      .orderBy(col("event_type"))
  }

  /** Oracle twin of [[changepoint]]. */
  def changepointSql: String =
    s"""WITH $dailySeriesCteSql,
       |tot AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
       |  FROM series GROUP BY event_type),
       |pref AS (
       |  SELECT series.event_type, t + 1 AS p, n, s,
       |    CAST(sum(x) OVER (PARTITION BY series.event_type ORDER BY t) AS BIGINT) AS st
       |  FROM series JOIN tot ON tot.event_type = series.event_type),
       |scored AS (
       |  SELECT event_type, p, n, s, st,
       |    CAST(round(1000000.0 * (st * n - s * p) * (st * n - s * p)
       |         / (p * (n - p))) AS BIGINT) AS score_e6
       |  FROM pref WHERE p < n),
       |best AS (
       |  SELECT event_type, p, n, s, st, score_e6,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY score_e6 DESC, p) AS rk
       |  FROM scored)
       |SELECT event_type, n AS n_days, CAST(p AS BIGINT) AS split_p, score_e6,
       |  CAST(round(1000000.0 * st / p) AS BIGINT) AS mean_before_e6,
       |  CAST(round(1000000.0 * (s - st) / (n - p)) AS BIGINT) AS mean_after_e6
       |FROM best WHERE rk = 1
       |ORDER BY event_type""".stripMargin

  /** Seasonal decomposition of the daily series (STL-lite): per
    * (type, day) the classic additive split x = trend + seasonal +
    * residual — trend from a centered 7-day moving average (edges
    * average the available window), seasonal as the per-day-of-week
    * mean of the detrended series, residual as the rest — plus the
    * anomaly verdict |residual| > 3 × (mean |residual|), i.e. days
    * that deviate even AFTER weekly structure and drift are explained
    * away (the alarm [[changepoint]] locates and the raw z-score
    * queries can't de-season). Exactness: the moving average is
    * non-negative integer division (`·10⁶ DIV cnt`); the seasonal and
    * threshold means sit over possibly-NEGATIVE sums, where Spark DIV
    * truncates but DuckDB // floors — so both engines use tie-free
    * `floor(sum/cnt)` on the exact double quotient (the q_holt
    * lesson).
    *
    * Scale: everything past the [[dailySeries]] events pass is
    * types × days — two windows, one dow agg, one threshold agg. */
  def seasonalDecompose(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val series = dailySeries(spark, sfDir)
    val w7 = Window.partitionBy(col("event_type")).orderBy(col("t"))
      .rowsBetween(-3, 3)
    val detrended = series
      .withColumn("sw", sum(col("x")).over(w7))
      .withColumn("cw", count(lit(1)).over(w7))
      .withColumn("trend_e6", expr("(sw * 1000000) DIV cw"))
      .withColumn("det_e6", col("x") * 1000000L - col("trend_e6"))
      .withColumn("dow", pmod(col("t"), lit(7)))
    val seasonal = detrended.groupBy(col("event_type"), col("dow"))
      .agg(floor(sum(col("det_e6")).cast("double") / count(lit(1)))
        .cast("long").as("seasonal_e6"))
    val withRes = detrended.join(seasonal, Seq("event_type", "dow"))
      .withColumn("residual_e6", col("det_e6") - col("seasonal_e6"))
    val thresh = withRes.groupBy(col("event_type"))
      .agg(floor(sum(abs(col("residual_e6"))).cast("double") / count(lit(1)))
        .cast("long").as("mad_e6"))
    withRes.join(broadcast(thresh), Seq("event_type"))
      .select(col("event_type"), col("t"), col("x"),
        col("trend_e6"), col("seasonal_e6"), col("residual_e6"),
        (abs(col("residual_e6")) > col("mad_e6") * 3).as("is_anomaly"))
      .orderBy(col("event_type"), col("t"))
  }

  /** Oracle twin of [[seasonalDecompose]]. */
  def seasonalDecomposeSql: String =
    s"""WITH $dailySeriesCteSql,
       |tr AS (
       |  SELECT event_type, t, x,
       |    CAST(sum(x) OVER w7 AS BIGINT) AS sw,
       |    CAST(count(*) OVER w7 AS BIGINT) AS cw
       |  FROM series
       |  WINDOW w7 AS (PARTITION BY event_type ORDER BY t
       |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |det AS (
       |  SELECT event_type, t, x, (sw * 1000000) // cw AS trend_e6,
       |    x * 1000000 - (sw * 1000000) // cw AS det_e6,
       |    t % 7 AS dow
       |  FROM tr),
       |seas AS (
       |  SELECT event_type, dow,
       |    CAST(floor(CAST(sum(det_e6) AS DOUBLE) / count(*)) AS BIGINT) AS seasonal_e6
       |  FROM det GROUP BY event_type, dow),
       |res AS (
       |  SELECT det.event_type, t, x, trend_e6, seasonal_e6,
       |    det_e6 - seasonal_e6 AS residual_e6
       |  FROM det JOIN seas ON seas.event_type = det.event_type AND seas.dow = det.dow),
       |th AS (
       |  SELECT event_type,
       |    CAST(floor(CAST(sum(abs(residual_e6)) AS DOUBLE) / count(*)) AS BIGINT) AS mad_e6
       |  FROM res GROUP BY event_type)
       |SELECT res.event_type, t, x, trend_e6, seasonal_e6,
       |  CAST(residual_e6 AS BIGINT) AS residual_e6,
       |  abs(residual_e6) > mad_e6 * 3 AS is_anomaly
       |FROM res JOIN th ON th.event_type = res.event_type
       |ORDER BY res.event_type, t""".stripMargin
}
