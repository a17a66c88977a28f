package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream — the workloads an event
  * lake exists to serve: funnel conversion, periodic retention, and
  * value distributions. All are single-shuffle aggregations (per-user
  * or per-bucket) that scale linearly with event volume.
  */
object Behavior {

  /** Signup→purchase funnel: converted = a purchase STRICTLY AFTER the
    * user's first signup (a pre-signup purchase must not mask a later
    * conversion — so the post-signup purchase is found against the
    * windowed first-signup time, not the global first purchase). One
    * window pass + one groupBy(user) pass. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts_ms", unix_millis(col("ts")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    ev.withColumn("first_signup_ms",
        min(when(col("event_type") === "signup", col("ts_ms"))).over(w))
      .groupBy(col("user_id"))
      .agg(
        first(col("first_signup_ms")).as("first_signup_ms"),
        min(when(col("event_type") === "purchase" &&
          col("ts_ms") > col("first_signup_ms"), col("ts_ms"))).as("first_conv_ms"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("first_signup_ms").isNotNull, 1L).otherwise(0L)).as("n_signed_up"),
        sum(when(col("first_conv_ms").isNotNull, 1L).otherwise(0L)).as("n_converted"))
  }

  def funnelSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_type, epoch_ms(ts::TIMESTAMP) AS ts_ms,
      |    min(CASE WHEN event_type = 'signup' THEN epoch_ms(ts::TIMESTAMP) END)
      |      OVER (PARTITION BY user_id) AS first_signup_ms
      |  FROM events),
      |per_user AS (
      |  SELECT user_id, min(first_signup_ms) AS first_signup_ms,
      |    min(CASE WHEN event_type = 'purchase' AND ts_ms > first_signup_ms
      |             THEN ts_ms END) AS first_conv_ms
      |  FROM flagged GROUP BY user_id)
      |SELECT count(*) AS n_users,
      |  CAST(sum(CASE WHEN first_signup_ms IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signed_up,
      |  CAST(sum(CASE WHEN first_conv_ms IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
      |FROM per_user""".stripMargin

  /** Weekly retention: of the users active in week w, how many are
    * also active in week w+1. Distinct (user, week) pairs → lead over
    * the per-user week sequence → per-week retention counts. */
  def weeklyRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"),
        floor(unix_millis(col("ts")) / lit(604800000L)).as("week"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("week"))
    ev.withColumn("next_week", lead(col("week"), 1).over(w))
      .groupBy(col("week"))
      .agg(
        count(lit(1)).as("n_active"),
        sum(when(col("next_week") === col("week") + 1, 1L).otherwise(0L)).as("n_retained"))
      .orderBy(col("week"))
  }

  def weeklyRetentionSql: String =
    """WITH weeks AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch_ms(ts::TIMESTAMP) / 604800000) AS BIGINT) AS week
      |  FROM events),
      |seq AS (
      |  SELECT user_id, week,
      |    lead(week, 1) OVER (PARTITION BY user_id ORDER BY week) AS next_week
      |  FROM weeks)
      |SELECT week, count(*) AS n_active,
      |  CAST(sum(CASE WHEN next_week = week + 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained
      |FROM seq
      |GROUP BY week
      |ORDER BY week""".stripMargin

  /** Value histogram: fixed-width bins over event values per type —
    * the one-pass distribution profile (bin = floor(value/bin_width)). */
  def valueHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.groupBy(col("event_type"),
        floor(col("value") / 50.0).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        (round(avg(col("value")), 4) + lit(0.0)).as("avg_value"))
      .orderBy(col("event_type"), col("bin"))
  }

  def valueHistogramSql: String =
    """SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bin,
      |  count(*) AS n, round(avg(value), 4) + 0.0 AS avg_value
      |FROM events
      |GROUP BY event_type, bin
      |ORDER BY event_type, bin""".stripMargin

  /** Interval-OVERLAP join — the third member of the temporal-join
    * trio (as-of: [[EventOps.asofLastOrder]]; point-pair range:
    * [[EventOps.eventPairs60s]]): cross-user session pairs whose time
    * intervals overlap, counted per hour of overlap start (concurrency
    * load profile).
    *
    * Scale shape — the banded interval join: a naive formulation is an
    * inequality self-join (BroadcastNestedLoopJoin, O(n²) at any
    * scale; the oracle keeps exactly that shape because DuckDB's
    * IEJoin eats it). Here the EARLIER session explodes over the time
    * bands it covers, the LATER session registers only at its start
    * bucket, and candidates come from an equi-join on the bucket:
    * overlap ⇒ the later start lies inside the earlier interval ⇒ its
    * start bucket is among the earlier side's covered buckets, so
    * every overlapping pair is found exactly once and no distinct()
    * pass is needed — the n² is confined to sessions sharing a band.
    * The `earlier` tie-break (start, then user) is what makes the
    * single-capture argument airtight when starts collide. */
  def sessionOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    // band width is CHOSEN from the corpus density (hour → minute →
    // second ladder): per-band candidate volume is n² in the sessions
    // sharing a band, and the 10× probe (1M events) showed 35.5 s →
    // 4.4 s from shrinking the band 60× while the explode fan-out only
    // grows by the sessions' band-span — identical output at any width
    // (BehaviorSpec pins band-width independence)
    val sessions = Windows.sessions(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try sessionOverlapOf(sessions, bandMs = chooseBandMs(sessions))
    finally sessions.unpersist()
  }

  /** Band-width ladder for the banded interval join. Wider bands mean
    * fewer explode rows but quadratically hotter bands. */
  private[graft] val BandLadderMs: Seq[Long] = Seq(3600000L, 60000L, 1000L)

  /** Choose the ladder band minimizing the join's ESTIMATED row
    * volume, from one cheap stats pass (count, time range, mean
    * duration — a 1-row scalar agg, the same bounded collect pattern
    * the centroid trainers use). With n sessions of mean duration D̄
    * over range R and uniform starts, a band width W costs
    *
    *   explode(W)    ≈ n·(D̄/W + 1)        (earlier side covers its bands)
    *   candidates(W) ≈ n²·(D̄ + W)/R       (later side registers only at
    *                                        its START band: per band,
    *                                        n(D̄+W)/R coverers × nW/R
    *                                        starters, × R/W bands)
    *
    * so shrinking W always shrinks candidates (floor n²D̄/R — the true
    * overlap mass) but inflates the explode. The minute rung wins the
    * 1M-event corpus (measured 35.5 s hour → 4.4 s minute, candidates
    * est 1.9e7 → 6.4e6); a flash-dense corpus (tens of thousands of
    * short sessions in minutes of range) pushes minute-band candidate
    * volume past the explode cost of second bands and falls through to
    * the 1 s rung — the density probe in BehaviorSpec pins both
    * choices. Output is band-width independent (also pinned), so the
    * chooser can never change results, only cost. Degenerate corpora
    * (≤1 session or zero range) keep the widest band. */
  private[graft] def chooseBandMs(sessionsDf: DataFrame): Long = {
    val row = sessionsDf
      .agg(count(lit(1)).as("n"),
        min(col("session_start_ms")).as("t0"),
        max(col("session_end_ms")).as("t1"),
        avg(col("session_end_ms") - col("session_start_ms")).as("dbar"))
      .collect()(0)
    val n = row.getLong(0)
    if (n <= 1 || row.isNullAt(1)) return BandLadderMs.head
    val range = math.max(1L, row.getLong(2) - row.getLong(1)).toDouble
    val dbar = math.max(0.0, row.getDouble(3))
    def cost(w: Long): Double =
      n.toDouble * (dbar / w + 1.0) + n.toDouble * n.toDouble * (dbar + w) / range
    BandLadderMs.minBy(cost)
  }

  /** The banded interval-overlap core over any
    * (user_id, session_start_ms, session_end_ms) frame — separated so
    * BehaviorSpec can pin it row-for-row against the naive inequality
    * self-join on synthetic interval sets (including the equal-start
    * and bucket-boundary corners the single-capture argument hinges
    * on). */
  private[graft] def sessionOverlapOf(sessionsDf: DataFrame,
      bandMs: Long = 3600000L): DataFrame = {
    val HourMs = 3600000.0
    // the JOIN band is independent of the hour REPORTING bucket:
    // per-band candidate volume is n² in the sessions sharing a band,
    // so a denser corpus shrinks bandMs (more bands, each smaller) at
    // the cost of a larger explode fan-out — the same
    // bands-vs-bucket-width trade every LSH operator here exposes.
    // The single-capture argument is band-width-independent: the later
    // session's start band is always among the earlier session's
    // covered bands.
    val s = sessionsDf
      .select(col("user_id"),
        col("session_start_ms").as("start_ms"), col("session_end_ms").as("end_ms"))
      .withColumn("b0", floor(col("start_ms") / lit(bandMs.toDouble)).cast("long"))
      .withColumn("b1", floor(col("end_ms") / lit(bandMs.toDouble)).cast("long"))
    val earlier = s.select(col("user_id").as("user_a"),
      col("start_ms").as("start_a"), col("end_ms").as("end_a"),
      explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val later = s.select(col("user_id").as("user_b"),
      col("start_ms").as("start_b"), col("end_ms").as("end_b"),
      col("b0").as("bucket"))
    earlier.join(later, Seq("bucket"))
      .filter(col("user_a") =!= col("user_b"))
      .filter(col("start_b") <= col("end_a") && col("start_a") <= col("end_b"))
      .filter(col("start_a") < col("start_b") ||
        (col("start_a") === col("start_b") && col("user_a") < col("user_b")))
      .groupBy(floor(col("start_b") / lit(HourMs)).cast("long").as("hour_bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hour_bucket"))
  }

  /** The band-width chooser AS AN ORACLE-CHECKED QUERY (the
    * [[graft.ops.Dedup]] `lshBandTune` pattern: expose the tuning
    * decision itself to the correctness gate): corpus stats, the
    * integer-exact cost of every ladder rung, and the chosen band.
    * The cost model is [[chooseBandMs]]'s in BIGINT arithmetic
    * (S = Σ durations, so n·D̄ = S needs no division):
    *
    *   explode(W)    = n + S DIV W
    *   candidates(W) = (n·S + n²·W) DIV R
    *
    * Ties choose the wider band. Magnitudes here stay ≲5·10¹⁶ at
    * sf0.1 (n≈10⁵) — BIGINT-safe; the production [[chooseBandMs]]
    * keeps doubles for the 10⁹-session regime where n²·W would
    * overflow. One scalar-agg row — model-sized at any SF. */
  def bandChoice(spark: SparkSession, sfDir: String): DataFrame =
    bandChoiceOf(Windows.sessions(spark, sfDir))

  private[graft] def bandChoiceOf(sessionsDf: DataFrame): DataFrame = {
    val stats = sessionsDf.agg(
      count(lit(1)).as("n_sessions"),
      greatest(coalesce(max(col("session_end_ms")) - min(col("session_start_ms")),
        lit(0L)), lit(1L)).as("range_ms"),
      coalesce(sum(col("session_end_ms") - col("session_start_ms")), lit(0L))
        .as("sum_dur_ms"))
    def cost(w: Long): org.apache.spark.sql.Column =
      (col("n_sessions") + expr(s"sum_dur_ms DIV ${w}L")) +
        expr(s"(n_sessions * sum_dur_ms + n_sessions * n_sessions * ${w}L) DIV range_ms")
    stats
      .withColumn("cost_hour", cost(3600000L))
      .withColumn("cost_minute", cost(60000L))
      .withColumn("cost_second", cost(1000L))
      .withColumn("chosen_band_ms",
        when(col("cost_hour") <= col("cost_minute") &&
          col("cost_hour") <= col("cost_second"), lit(3600000L))
          .when(col("cost_minute") <= col("cost_second"), lit(60000L))
          .otherwise(lit(1000L)))
  }

  def bandChoiceSql: String = {
    def cost(w: Long): String =
      s"CAST((n_sessions + sum_dur_ms // $w) + " +
        s"(n_sessions * sum_dur_ms + n_sessions * n_sessions * $w) // range_ms AS BIGINT)"
    s"""WITH ${Windows.SessionsCteSql},
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       |    CAST(greatest(coalesce(max(session_end_ms) - min(session_start_ms), 0), 1) AS BIGINT) AS range_ms,
       |    CAST(coalesce(sum(session_end_ms - session_start_ms), 0) AS BIGINT) AS sum_dur_ms
       |  FROM sessions),
       |costs AS (
       |  SELECT n_sessions, range_ms, sum_dur_ms,
       |    ${cost(3600000L)} AS cost_hour,
       |    ${cost(60000L)} AS cost_minute,
       |    ${cost(1000L)} AS cost_second
       |  FROM stats)
       |SELECT n_sessions, range_ms, sum_dur_ms, cost_hour, cost_minute, cost_second,
       |  CAST(CASE WHEN cost_hour <= cost_minute AND cost_hour <= cost_second THEN 3600000
       |       WHEN cost_minute <= cost_second THEN 60000 ELSE 1000 END AS BIGINT) AS chosen_band_ms
       |FROM costs""".stripMargin
  }

  def sessionOverlapSql: String =
    s"""WITH ${Windows.SessionsCteSql},
       |pairs AS (
       |  SELECT CAST(floor(b.session_start_ms / 3600000) AS BIGINT) AS hour_bucket
       |  FROM sessions a JOIN sessions b
       |    ON a.user_id <> b.user_id
       |   AND b.session_start_ms <= a.session_end_ms
       |   AND a.session_start_ms <= b.session_end_ms
       |   AND (a.session_start_ms < b.session_start_ms OR
       |        (a.session_start_ms = b.session_start_ms AND a.user_id < b.user_id)))
       |SELECT hour_bucket, count(*) AS n_pairs
       |FROM pairs
       |GROUP BY hour_bucket
       |ORDER BY hour_bucket""".stripMargin

  /** First-order Markov transition matrix over the event stream: how
    * often does a user's event of type A get followed by type B, and
    * with what conditional probability. The output is the row-
    * stochastic matrix every next-event model and anomaly detector
    * starts from. Probabilities are integer parts-per-million via
    * truncating division, so the matrix is engine-exact.
    *
    * Scale: one user_id-partitioned window pass for the lag, then a
    * 25-cell hash agg (states² is model-sized); the ppm normalization
    * is a window over the 25-row result — negligible at any sf. */
  def markovTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .select(col("event_type").as("to_state"),
        lag(col("event_type"), 1).over(w).as("from_state"))
      .filter(col("from_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("from_state"))))
      .select(col("from_state"), col("to_state"), col("n"),
        expr("(n * 1000000) DIV row_total").as("p_ppm"))
      .orderBy(col("from_state"), col("to_state"))
  }

  def markovTransitionsSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts::TIMESTAMP) AS ts_ms
      |  FROM events),
      |tr AS (
      |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id
      |           ORDER BY ts_ms, event_id) AS from_state,
      |    event_type AS to_state
      |  FROM ev),
      |cnt AS (
      |  SELECT from_state, to_state, count(*) AS n
      |  FROM tr WHERE from_state IS NOT NULL
      |  GROUP BY from_state, to_state)
      |SELECT from_state, to_state, CAST(n AS BIGINT) AS n,
      |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_state) AS BIGINT) AS p_ppm
      |FROM cnt
      |ORDER BY from_state, to_state""".stripMargin

  /** Cohort retention MATRIX — the full (cohort week × weeks since
    * first seen) table behind every retention chart, extending
    * [[weeklyRetention]] (which reports only week→week+1 survival).
    * Cell = distinct users from cohort `c` active `k` weeks later;
    * `retained_ppm` normalizes by the cohort's size (its own
    * weeks_since = 0 cell, where every member is active by
    * definition). All integer: counts and truncating-ppm shares.
    *
    * Scale: the (user, week) DISTINCT collapses event volume first;
    * cohort assignment is a per-user min; the matrix itself is
    * model-sized (weeks²), so the ppm window costs nothing. */
  def cohortMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weeks = Tables.events(spark, sfDir)
      .select(col("user_id"),
        floor(unix_millis(col("ts")) / lit(604800000L)).as("week"))
      .distinct()
    val cohorts = weeks.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
    weeks.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .withColumn("cohort_size",
        max(when(col("weeks_since") === 0, col("n_active")))
          .over(Window.partitionBy(col("cohort"))))
      .select(col("cohort"), col("weeks_since"), col("n_active"),
        expr("(n_active * 1000000) DIV cohort_size").as("retained_ppm"))
      .orderBy(col("cohort"), col("weeks_since"))
  }

  def cohortMatrixSql: String =
    """WITH weeks AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch_ms(ts::TIMESTAMP) / 604800000) AS BIGINT) AS week
      |  FROM events),
      |cohorts AS (SELECT user_id, min(week) AS cohort FROM weeks GROUP BY user_id),
      |cells AS (
      |  SELECT c.cohort, w.week - c.cohort AS weeks_since,
      |    count(DISTINCT w.user_id) AS n_active
      |  FROM weeks w JOIN cohorts c ON c.user_id = w.user_id
      |  GROUP BY 1, 2),
      |sized AS (
      |  SELECT cohort, weeks_since, n_active,
      |    max(CASE WHEN weeks_since = 0 THEN n_active END)
      |      OVER (PARTITION BY cohort) AS cohort_size
      |  FROM cells)
      |SELECT cohort, weeks_since, CAST(n_active AS BIGINT) AS n_active,
      |  CAST(n_active * 1000000 // cohort_size AS BIGINT) AS retained_ppm
      |FROM sized
      |ORDER BY cohort, weeks_since""".stripMargin

  /** Chi-square independence audit of the event_type × weekday
    * contingency table — the categorical-drift check a pipeline runs
    * to ask "does behavior depend on the day of week?". Emits the full
    * 5×7 table: observed count, row/column margins, and each cell's
    * chi-square contribution ((O·N − R·C)² / (N·R·C), the margin form
    * that never forms a fractional expectation). Margins and counts
    * are exact integers; the contribution is one letter-identical
    * double expression rounded at 4 dp.
    *
    * Scale: one 35-cell hash agg, margins by windows over the
    * model-sized cell table — nothing after the first agg depends on
    * input volume. */
  def chiSquare(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.events(spark, sfDir)
      .select(col("event_type"), dayofweek(col("ts")).cast("long").as("weekday"))
      .groupBy(col("event_type"), col("weekday"))
      .agg(count(lit(1)).as("o"))
    val withMargins = cells
      .withColumn("r", sum(col("o")).over(Window.partitionBy(col("event_type"))))
      .withColumn("c", sum(col("o")).over(Window.partitionBy(col("weekday"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    val od = col("o").cast("double"); val rd = col("r").cast("double")
    val cd = col("c").cast("double"); val nd = col("n").cast("double")
    withMargins
      .select(col("event_type"), col("weekday"), col("o"), col("r"), col("c"),
        (round((od * nd - rd * cd) * (od * nd - rd * cd) / (nd * rd * cd), 4) + lit(0.0))
          .as("contrib"))
      .orderBy(col("event_type"), col("weekday"))
  }

  def chiSquareSql: String =
    """WITH cells AS (
      |  SELECT event_type, CAST(dayofweek(ts::TIMESTAMP) + 1 AS BIGINT) AS weekday,
      |    count(*) AS o
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, weekday, o,
      |    sum(o) OVER (PARTITION BY event_type) AS r,
      |    sum(o) OVER (PARTITION BY weekday) AS c,
      |    sum(o) OVER () AS n
      |  FROM cells)
      |SELECT event_type, weekday, CAST(o AS BIGINT) AS o,
      |  CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
      |  round((CAST(o AS DOUBLE) * CAST(n AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
      |      * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE)), 4) + 0.0 AS contrib
      |FROM m
      |ORDER BY event_type, weekday""".stripMargin

  /** 7-day sliding distinct-user count per day ("rolling DAU") — the
    * sliding-window DISTINCT aggregation that no window frame can
    * express (COUNT(DISTINCT) OVER RANGE is unsupported in both
    * engines): each (user, active-day) pair is exploded into the ≤7
    * report days whose trailing window it falls in, then exact
    * distinct-count per report day.
    *
    * Scale: the (user, day) DISTINCT collapses raw event volume FIRST
    * (the dominant reduction — events per user-day never leave their
    * partial agg), the ×7 explode is a constant factor on the
    * collapsed frame, and the final count-distinct is the standard
    * two-shuffle exact plan. Report days past the observed maximum are
    * clipped against a broadcast single-row max. */
  def slidingDau(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(expr("unix_millis(ts) DIV 86400000").as("day"), col("user_id"))
    val maxDay = ev.agg(max(col("day")).as("max_day"))
    ev.distinct()
      .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("report_day"))
      .crossJoin(broadcast(maxDay))
      .filter(col("report_day") <= col("max_day"))
      .groupBy(col("report_day"))
      .agg(countDistinct(col("user_id")).as("dau7"))
      .orderBy(col("report_day"))
  }

  /** Time-to-convert — the forward-looking temporal probe the as-of
    * join family lacked: for every `click`, the same user's NEXT
    * `purchase` at-or-after it, via a running conditional min over the
    * DESC event order (no self-join: the "next matching event" is a
    * cumulative window, one shuffle on the user key). "At-or-after"
    * is defined on the total order (ts, event_id) so ties are
    * deterministic in both engines. Output per user: click count,
    * converted count, total wait (ms) — all integers.
    *
    * Scale: one hash shuffle on user_id + per-partition sort, then a
    * map-side-combined agg — the same shape at any corpus size; no
    * window state beyond the running min. */
  def timeToConvert(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withNext = ev.withColumn("next_purchase_ms",
      min(when(col("event_type") === "purchase", col("ts_ms"))).over(w))
    withNext.filter(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_clicks"),
        sum(when(col("next_purchase_ms").isNotNull, 1L).otherwise(0L)).as("n_converted"),
        sum(when(col("next_purchase_ms").isNotNull,
          col("next_purchase_ms") - col("ts_ms")).otherwise(0L)).as("total_wait_ms"))
      .orderBy(col("user_id"))
  }

  def timeToConvertSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts::TIMESTAMP) AS ts_ms
      |  FROM events),
      |nx AS (
      |  SELECT user_id, event_type, ts_ms,
      |    min(CASE WHEN event_type = 'purchase' THEN ts_ms END)
      |      OVER (PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_purchase_ms
      |  FROM ev)
      |SELECT user_id,
      |  CAST(count(*) AS BIGINT) AS n_clicks,
      |  CAST(sum(CASE WHEN next_purchase_ms IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_converted,
      |  CAST(sum(CASE WHEN next_purchase_ms IS NOT NULL
      |                THEN next_purchase_ms - ts_ms ELSE 0 END) AS BIGINT)
      |    AS total_wait_ms
      |FROM nx
      |WHERE event_type = 'click'
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  def slidingDauSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT epoch_ms(ts::TIMESTAMP) // 86400000 AS day, user_id
      |  FROM events),
      |mx AS (SELECT max(epoch_ms(ts::TIMESTAMP) // 86400000) AS max_day FROM events),
      |ex AS (
      |  SELECT user_id, day + d.d AS report_day
      |  FROM ud CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS d) d)
      |SELECT report_day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau7
      |FROM ex CROSS JOIN mx
      |WHERE report_day <= max_day
      |GROUP BY report_day
      |ORDER BY report_day""".stripMargin

  // --------------------------------------------------------------------
  // Survival analysis: Kaplan–Meier hazard table
  // --------------------------------------------------------------------

  /** The discrete Kaplan–Meier life table over user lifetimes — the
    * survival-analysis input the retention queries
    * ([[weeklyRetention]], [[cohortMatrix]]) summarize away: per
    * lifetime-day `d`, how many users were still AT RISK, how many
    * CHURNED at exactly `d` (last activity `d` days after their
    * first), and the discrete hazard in ppm. Users whose last
    * activity falls within `censorDays` of the observation-window end
    * are right-CENSORED — they are still at risk through their
    * observed lifetime but never counted as churned (the estimator's
    * defining correction; ignoring it biases churn up for recent
    * signups). The window end is the corpus max event time.
    *
    * Engine parity: lifetimes are integer DAYS (epoch-ms DIV), the
    * hazard is truncating integer ppm, and at-risk counts come from a
    * REVERSE cumulative sum over the (lifetime, censored) histogram —
    * windows scan histogram rows (≤ distinct lifetime days), never
    * users, the [[graft.ops.Selection.weightedMedian]] discipline.
    *
    * Scale: one user_id-keyed agg (map-side combined), a 1-row
    * window-end broadcast, histogram windows. Output is
    * max-lifetime-days rows — model-sized at any corpus size. */
  def survivalHazard(spark: SparkSession, sfDir: String,
      censorDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_millis(ts) DIV 86400000").as("day"))
    val wEnd = ev.agg(max(col("day")).as("w_end"))
    val users = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      .crossJoin(broadcast(wEnd))
      .select((col("last_day") - col("first_day")).as("lifetime"),
        (col("w_end") - col("last_day") < censorDays).as("censored"))
    val hist = users.groupBy(col("lifetime"))
      .agg(count(lit(1)).as("n_ending"),
        sum(when(!col("censored"), 1L).otherwise(0L)).as("n_churned"))
    // at_risk(d) = users with lifetime >= d: reverse running sum over
    // the lifetime histogram
    val wRev = Window.orderBy(col("lifetime").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("at_risk", sum(col("n_ending")).over(wRev))
      .select(col("lifetime"), col("at_risk"), col("n_churned"))
      .withColumn("hazard_ppm", expr("(n_churned * 1000000) DIV at_risk"))
      .orderBy(col("lifetime"))
  }

  /** Oracle twin of [[survivalHazard]] — `censorDays` interpolated. */
  def survivalHazardSql(censorDays: Int = 7): String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_ms(ts::TIMESTAMP) // 86400000 AS day FROM events),
       |wend AS (SELECT max(day) AS w_end FROM ev),
       |users AS (
       |  SELECT last_day - first_day AS lifetime,
       |    w_end - last_day < $censorDays AS censored
       |  FROM (SELECT user_id, min(day) AS first_day, max(day) AS last_day
       |        FROM ev GROUP BY user_id)
       |  CROSS JOIN wend),
       |hist AS (
       |  SELECT lifetime, CAST(count(*) AS BIGINT) AS n_ending,
       |    CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
       |  FROM users GROUP BY lifetime)
       |SELECT lifetime,
       |  CAST(sum(n_ending) OVER (ORDER BY lifetime DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS at_risk,
       |  n_churned,
       |  CAST(n_churned * 1000000 // CAST(sum(n_ending) OVER (ORDER BY lifetime DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS BIGINT)
       |    AS hazard_ppm
       |FROM hist
       |ORDER BY lifetime""".stripMargin

  // --------------------------------------------------------------------
  // Sequential pattern matching (MATCH_RECOGNIZE / CEP shape)
  // --------------------------------------------------------------------

  /** MATCH_RECOGNIZE-style sequential pattern detection — the CEP
    * primitive (Flink CEP, Oracle/Trino MATCH_RECOGNIZE) a pure
    * groupBy cannot express: find, per user, every occurrence of
    * `view → click → purchase` as CONSECUTIVE rows of the user's
    * event sequence restricted to those three types (ordered by ts
    * then event_id), with the whole triple inside `spanMs` (48 h default — this corpus's
    * per-user event cadence is hours, so tighter spans never fire). Unlike
    * [[funnel]] (first-touch conversion, order-only), this matches
    * the *pattern automaton* semantics: intervening view/click/
    * purchase events break a match, other event types are invisible
    * to the pattern (the standard `PATTERN (A B C)` over a filtered
    * stream).
    *
    * Implementation: the filtered stream is sequenced per user and
    * each row looks ahead two steps (two `lead`s over ONE window —
    * one shuffle, one sort); a row starts a match iff (type, next,
    * next²) = (view, click, purchase) and the span bound holds. All
    * columns are exact integers.
    *
    * Scale: one hash-partitioned window by user (per-user sequences
    * are short and skew-free), then a per-user agg — linear in
    * events, no joins. A 100 TB run shuffles each event once. */
  def seqPattern(spark: SparkSession, sfDir: String, spanMs: Long = 172800000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"), col("event_id"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .withColumn("ts2", lead(col("ts_ms"), 2).over(w))
      .filter(col("event_type") === "view" && col("t1") === "click" &&
        col("t2") === "purchase" && col("ts2") - col("ts_ms") <= spanMs)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("ts2") - col("ts_ms")).as("min_span_ms"),
        max(col("ts2") - col("ts_ms")).as("max_span_ms"))
      .orderBy(col("user_id"))
  }

  /** Oracle twin of [[seqPattern]] — `spanMs` interpolated. */
  def seqPatternSql(spanMs: Long = 172800000L): String =
    s"""WITH f AS (
       |  SELECT user_id, event_type, epoch_ms(ts::TIMESTAMP) AS ts_ms, event_id
       |  FROM events
       |  WHERE event_type IN ('view', 'click', 'purchase')),
       |seq AS (
       |  SELECT user_id, event_type, ts_ms,
       |    lead(event_type, 1) OVER w AS t1,
       |    lead(event_type, 2) OVER w AS t2,
       |    lead(ts_ms, 2) OVER w AS ts2
       |  FROM f
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id))
       |SELECT user_id, count(*) AS n_matches,
       |  CAST(min(ts2 - ts_ms) AS BIGINT) AS min_span_ms,
       |  CAST(max(ts2 - ts_ms) AS BIGINT) AS max_span_ms
       |FROM seq
       |WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
       |  AND ts2 - ts_ms <= $spanMs
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------------
  // Marketing attribution: last-touch channel per purchase
  // --------------------------------------------------------------------

  /** Last-touch attribution — every purchase's value is credited to the
    * LAST non-purchase event type ("channel") the user produced within
    * the lookback window before it; purchases with no in-window prior
    * touch are 'direct'. The standard e-commerce attribution report
    * (first/last/linear-touch family), built the Spark way: ONE
    * per-user window pass with `last(..., ignoreNulls)` carrying the
    * most recent touch (type AND its time — both `last` calls share
    * the frame and the null condition, so they always come from the
    * same row), then a plain channel rollup. No self-join: the
    * carry-forward window replaces the per-purchase as-of lookup, so
    * cost is one user shuffle regardless of purchase density.
    *
    * Exactness: the frame order (ts, event_id) is total; values are
    * integer cents; the window cutoff compares exact µs integers. */
  def attribution(spark: SparkSession, sfDir: String,
      lookbackUs: Long = 7L * 86400 * 1000000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val touchTs = when(col("event_type") =!= "purchase", col("ts"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      // both carry-forwards in ONE projection → one Window node, one
      // user shuffle (separate withColumns plan as two Window ops)
      .select(col("user_id"), col("ts"), col("event_type"), col("cents"),
        last(touch, ignoreNulls = true).over(w).as("ch"),
        last(touchTs, ignoreNulls = true).over(w).as("ch_ts"))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("cents"),
        when(col("ch").isNotNull &&
            unix_micros(col("ts")) - unix_micros(col("ch_ts")) <= lookbackUs,
          col("ch")).otherwise(lit("direct")).as("channel"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).cast("long").as("n_users"),
        sum(col("cents")).cast("long").as("sum_cents"))
      .orderBy(col("channel"))
  }

  /** Linear multi-touch attribution — every purchase's value splits
    * EQUALLY across ALL its in-window prior touches (the other end of
    * the attribution family from [[attribution]]'s last-touch rule);
    * no-touch purchases credit 'direct' in full. Exact conservation:
    * credits are integer e6 units — each touch gets
    * ⌊cents·10⁶ / n⌋ and the REMAINDER goes to the latest touch (a
    * deterministic rule, so Σ credits ≡ cents·10⁶ per purchase,
    * asserted by the spec and re-proven by the oracle hash).
    *
    * Scale: purchase × touch pairing is the BANDED range join (the
    * [[graft.ops.EventOps.eventPairs60s]] rule): the purchase side
    * explodes into its 8 covered day bands, the touch side registers
    * at its band, and the join is a plain hash join on (user, day)
    * with the exact window as a residual — never per-user quadratic.
    * The per-purchase count/rank window partitions by purchase id
    * (bounded by in-window touch count, never corpus-sized). */
  def multiTouch(spark: SparkSession, sfDir: String,
      lookbackUs: Long = 7L * 86400 * 1000000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id").as("t_id"), col("us").as("t_us"),
        col("event_type").as("channel"), floor(col("us") / dayUs).cast("long").as("day"))
    // band count derives from the lookback (ceil in whole days) — a
    // hardcoded 7 would silently drop eligible pairs past day 7 for
    // any longer lookback; the exact window is the residual filter
    val bands = (lookbackUs + dayUs - 1) / dayUs
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("us").as("p_us"),
        col("cents"),
        explode(sequence(floor(col("us") / dayUs).cast("long") - lit(bands),
          floor(col("us") / dayUs).cast("long"))).as("day"))
    val pairs = purchases.join(touches, Seq("user_id", "day"))
      .filter(col("t_us") < col("p_us") && col("p_us") - col("t_us") <= lookbackUs)
      .select(col("p_id"), col("cents"), col("channel"), col("t_us"), col("t_id"))
    val wn = Window.partitionBy(col("p_id"))
    val wr = Window.partitionBy(col("p_id")).orderBy(col("t_us").desc, col("t_id").desc)
    val credited = pairs
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("rn", row_number().over(wr))
      .select(col("p_id"), col("channel"),
        (expr("(cents * 1000000) DIV n") +
          when(col("rn") === 1, expr("(cents * 1000000) % n")).otherwise(lit(0L)))
          .as("credit_e6"))
    val direct = ev.filter(col("event_type") === "purchase")
      .join(credited.select(col("p_id")).distinct()
          .withColumnRenamed("p_id", "event_id"),
        Seq("event_id"), "left_anti")
      .select(lit("direct").as("channel"),
        (col("cents") * lit(1000000L)).as("credit_e6"))
    credited.select(col("channel"), col("credit_e6"))
      .unionByName(direct)
      .groupBy(col("channel"))
      .agg(count(lit(1)).cast("long").as("n_credits"),
        sum(col("credit_e6")).cast("long").as("sum_credit_e6"))
      .orderBy(col("channel"))
  }

  /** The (purchase × in-window prior touch) pair table shared by the
    * weighted attribution family — the banded range join from
    * [[multiTouch]], with the purchase time kept for age-based
    * weights. */
  private def touchPairs(spark: SparkSession, sfDir: String,
      lookbackUs: Long): DataFrame = {
    val dayUs = 86400000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id").as("t_id"), col("us").as("t_us"),
        col("event_type").as("channel"), floor(col("us") / dayUs).cast("long").as("day"))
    // band count from the lookback, as in [[multiTouch]]: lit(7) here
    // silently dropped eligible pairs for any lookbackUs > 7 days
    val bands = (lookbackUs + dayUs - 1) / dayUs
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("us").as("p_us"),
        col("cents"),
        explode(sequence(floor(col("us") / dayUs).cast("long") - lit(bands),
          floor(col("us") / dayUs).cast("long"))).as("day"))
    purchases.join(touches, Seq("user_id", "day"))
      .filter(col("t_us") < col("p_us") && col("p_us") - col("t_us") <= lookbackUs)
      .select(col("p_id"), col("cents"), col("channel"), col("t_us"), col("t_id"),
        col("p_us"))
  }

  /** Weighted-credit rollup shared by the decay and U-shaped variants:
    * given pairs carrying an integer weight `w`, each touch gets
    * ⌊cents·10⁶·w / Σw⌋ and the REMAINDER (cents·10⁶ − Σ bases, an
    * exact integer) goes to the LATEST touch — so Σ credits ≡
    * cents·10⁶ per purchase for ANY weight scheme, the same
    * conservation rule as [[multiTouch]]. No-touch purchases credit
    * 'direct' in full. All windows share the p_id partitioning (one
    * purchase-keyed shuffle, bounded by in-window touch count). */
  private def weightedRollup(spark: SparkSession, sfDir: String,
      weighted: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wn = Window.partitionBy(col("p_id"))
    val wr = Window.partitionBy(col("p_id")).orderBy(col("t_us").desc, col("t_id").desc)
    val credited = weighted
      .withColumn("totw", sum(col("w")).over(wn))
      .withColumn("rn", row_number().over(wr))
      .withColumn("base", expr("(cents * 1000000 * w) DIV totw"))
      .withColumn("sumbase", sum(col("base")).over(wn))
      .select(col("p_id"), col("channel"),
        (col("base") + when(col("rn") === 1,
          col("cents") * lit(1000000L) - col("sumbase")).otherwise(lit(0L)))
          .as("credit_e6"))
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val direct = ev.filter(col("event_type") === "purchase")
      .join(credited.select(col("p_id")).distinct()
          .withColumnRenamed("p_id", "event_id"),
        Seq("event_id"), "left_anti")
      .select(lit("direct").as("channel"),
        (col("cents") * lit(1000000L)).as("credit_e6"))
    credited.select(col("channel"), col("credit_e6"))
      .unionByName(direct)
      .groupBy(col("channel"))
      .agg(count(lit(1)).cast("long").as("n_credits"),
        sum(col("credit_e6")).cast("long").as("sum_credit_e6"))
      .orderBy(col("channel"))
  }

  /** Position-DECAY multi-touch — recency-weighted credit: a touch
    * `a` whole days before the purchase weighs 2^(7−a) (halving per
    * day across the 7-day window), so yesterday's click outweighs last
    * week's view 64:1 but both get credit. Weights are exact powers of
    * two (integer, never floats), so the split arithmetic and its
    * conservation rule ([[weightedRollup]]) hash-match any engine. */
  def multiTouchDecay(spark: SparkSession, sfDir: String,
      lookbackUs: Long = 7L * 86400 * 1000000): DataFrame = {
    val weighted = touchPairs(spark, sfDir, lookbackUs)
      .withColumn("age", expr("(p_us - t_us) DIV 86400000000"))
      .withColumn("w",
        expr("CAST(shiftleft(1, CAST(greatest(0, 7 - age) AS INT)) AS BIGINT)"))
    weightedRollup(spark, sfDir, weighted)
  }

  /** U-SHAPED (position-based) multi-touch — the 40/20/40 industry
    * rule: first and last touch each take 40%, the middle touches
    * share the remaining 20%. Exact in integers: for n ≥ 3 the weights
    * are first = last = 2·(n−2), middle = 1 each (totals 5·(n−2), so
    * first/total = 40% exactly); n ≤ 2 splits evenly. Credit split +
    * conservation via [[weightedRollup]]. */
  def multiTouchUShape(spark: SparkSession, sfDir: String,
      lookbackUs: Long = 7L * 86400 * 1000000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wn = Window.partitionBy(col("p_id"))
    val wa = Window.partitionBy(col("p_id")).orderBy(col("t_us").asc, col("t_id").asc)
    val weighted = touchPairs(spark, sfDir, lookbackUs)
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("ra", row_number().over(wa))
      .withColumn("w", when(col("n") <= 2, lit(1L))
        .when(col("ra") === 1 || col("ra") === col("n"), (col("n") - 2) * 2)
        .otherwise(lit(1L)).cast("long"))
    weightedRollup(spark, sfDir, weighted)
  }

  /** Shared oracle CTE prefix: events + the plain range-join pair
    * table with purchase time (the windowless-band twin that re-proves
    * the banded rewrite). */
  private def pairsCteSql(lookbackUs: Long): String =
    s"""ev AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |pairs AS (
       |  SELECT p.event_id AS p_id, p.cents, t.event_type AS channel,
       |    t.us AS t_us, t.event_id AS t_id, p.us AS p_us
       |  FROM ev p JOIN ev t
       |    ON t.user_id = p.user_id AND t.event_type <> 'purchase'
       |   AND t.us < p.us AND p.us - t.us <= $lookbackUs
       |  WHERE p.event_type = 'purchase')""".stripMargin

  /** Shared oracle suffix: weighted split + remainder-to-latest +
    * direct union + channel rollup, over a `wtd(p_id, cents, channel,
    * t_us, t_id, w)` CTE. */
  private def weightedRollupSql: String =
    s"""based AS (
       |  SELECT p_id, cents, channel, t_us, t_id,
       |    (cents * 1000000 * w) // sum(w) OVER (PARTITION BY p_id) AS base,
       |    row_number() OVER (PARTITION BY p_id ORDER BY t_us DESC, t_id DESC) AS rn
       |  FROM wtd),
       |based2 AS (
       |  SELECT *, sum(base) OVER (PARTITION BY p_id) AS sumbase FROM based),
       |credited AS (
       |  SELECT p_id, channel,
       |    base + CASE WHEN rn = 1 THEN cents * 1000000 - sumbase ELSE 0 END AS credit_e6
       |  FROM based2),
       |direct AS (
       |  SELECT 'direct' AS channel, cents * 1000000 AS credit_e6
       |  FROM ev WHERE event_type = 'purchase'
       |    AND event_id NOT IN (SELECT p_id FROM credited)),
       |unioned AS (
       |  SELECT channel, CAST(credit_e6 AS BIGINT) AS credit_e6 FROM credited
       |  UNION ALL
       |  SELECT channel, CAST(credit_e6 AS BIGINT) AS credit_e6 FROM direct)
       |SELECT channel, count(*) AS n_credits,
       |  CAST(sum(credit_e6) AS BIGINT) AS sum_credit_e6
       |FROM unioned GROUP BY channel ORDER BY channel""".stripMargin

  /** Oracle twin of [[multiTouchDecay]]. */
  def multiTouchDecaySql(lookbackUs: Long = 7L * 86400 * 1000000): String =
    s"""WITH ${pairsCteSql(lookbackUs)},
       |wtd AS (
       |  SELECT p_id, cents, channel, t_us, t_id,
       |    CAST(1 << CAST(greatest(0, 7 - (p_us - t_us) // 86400000000) AS INT) AS BIGINT) AS w
       |  FROM pairs),
       |${weightedRollupSql}""".stripMargin

  /** Oracle twin of [[multiTouchUShape]]. */
  def multiTouchUShapeSql(lookbackUs: Long = 7L * 86400 * 1000000): String =
    s"""WITH ${pairsCteSql(lookbackUs)},
       |pos AS (
       |  SELECT *, count(*) OVER (PARTITION BY p_id) AS n,
       |    row_number() OVER (PARTITION BY p_id ORDER BY t_us ASC, t_id ASC) AS ra
       |  FROM pairs),
       |wtd AS (
       |  SELECT p_id, cents, channel, t_us, t_id,
       |    CAST(CASE WHEN n <= 2 THEN 1
       |              WHEN ra = 1 OR ra = n THEN (n - 2) * 2
       |              ELSE 1 END AS BIGINT) AS w
       |  FROM pos),
       |${weightedRollupSql}""".stripMargin

  /** Oracle twin of [[multiTouch]] — the plain (windowless-band) range
    * join: green re-proves the banded rewrite, like the event-pairs
    * family. */
  def multiTouchSql(lookbackUs: Long = 7L * 86400 * 1000000): String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |pairs AS (
       |  SELECT p.event_id AS p_id, p.cents, t.event_type AS channel,
       |    t.us AS t_us, t.event_id AS t_id
       |  FROM ev p JOIN ev t
       |    ON t.user_id = p.user_id AND t.event_type <> 'purchase'
       |   AND t.us < p.us AND p.us - t.us <= $lookbackUs
       |  WHERE p.event_type = 'purchase'),
       |credited AS (
       |  SELECT p_id, channel,
       |    (cents * 1000000) // count(*) OVER (PARTITION BY p_id) +
       |    CASE WHEN row_number() OVER (PARTITION BY p_id ORDER BY t_us DESC, t_id DESC) = 1
       |         THEN (cents * 1000000) % count(*) OVER (PARTITION BY p_id) ELSE 0 END
       |      AS credit_e6
       |  FROM pairs),
       |direct AS (
       |  SELECT 'direct' AS channel, cents * 1000000 AS credit_e6
       |  FROM ev WHERE event_type = 'purchase'
       |    AND event_id NOT IN (SELECT p_id FROM credited)),
       |unioned AS (
       |  SELECT channel, CAST(credit_e6 AS BIGINT) AS credit_e6 FROM credited
       |  UNION ALL
       |  SELECT channel, CAST(credit_e6 AS BIGINT) AS credit_e6 FROM direct)
       |SELECT channel, count(*) AS n_credits,
       |  CAST(sum(credit_e6) AS BIGINT) AS sum_credit_e6
       |FROM unioned GROUP BY channel ORDER BY channel""".stripMargin

  /** Oracle twin of [[attribution]] — DuckDB's `IGNORE NULLS` window
    * carry-forward, identical µs-integer cutoff. */
  def attributionSql(lookbackUs: Long = 7L * 86400 * 1000000): String =
    s"""WITH tagged AS (
       |  SELECT user_id, event_type, ts,
       |    CAST(round(value * 100) AS BIGINT) AS cents,
       |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch,
       |    last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch_ts
       |  FROM events),
       |pur AS (
       |  SELECT user_id, cents,
       |    CASE WHEN ch IS NOT NULL AND epoch_us(ts) - epoch_us(ch_ts) <= $lookbackUs
       |         THEN ch ELSE 'direct' END AS channel
       |  FROM tagged WHERE event_type = 'purchase')
       |SELECT channel, count(*) AS n_purchases,
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       |  CAST(sum(cents) AS BIGINT) AS sum_cents
       |FROM pur GROUP BY channel ORDER BY channel""".stripMargin

  // --------------------------------------------------------------------
  // Market-basket association rules (Apriori support/confidence/lift)
  // --------------------------------------------------------------------

  /** Association rules over order baskets — the Apriori surface
    * (Agrawal & Srikant, VLDB 1994) every retail/recommendation
    * pipeline computes: brand co-occurrence within orders, reported as
    * the classic support/confidence/lift table for every pair above a
    * minimum support of `minSupPct`% of baskets. Lift > 1e6 (ppm) =
    * brands bought together MORE than independence predicts — the
    * recommendation signal; confidence = P(B | basket has A).
    *
    * Exactness: support counts are integers; confidence is
    * non-negative integer division to ppm; lift is the pure-integer
    * cross-multiplication `(supAB·N·10⁶) DIV (supA·supB)` — no double
    * ever (the weighted-sample multiply-out discipline).
    *
    * Scale: items collapse to the DISTINCT (basket, brand) table
    * first (the dominant reduction), the pair generation is a
    * self-EQUI-join on the basket key — per-basket cost is
    * (brands-per-basket choose 2), never baskets² — and everything
    * downstream is brand²-sized. The lineitem→part brand lookup rides
    * the existing dimension join. */
  def assocRules(spark: SparkSession, sfDir: String,
      minSupPct: Int = 1): DataFrame = {
    // the distinct (basket, brand) table is the corpus pass — a
    // CORPUS-KEYED shared artifact (round 12), so a fresh JVM's first
    // consumer reads orders×brands-bounded parquet instead of
    // re-running the lineitem⋈part join + distinct (the measured cold
    // tail). Bounded repartition, NOT coalesce(1): coalesce would
    // collapse the distinct's final stage to one task at larger
    // corpora (review catch).
    val obDir = s"${Artifacts.sharedRoot}/assoc_ob/k=${
      Artifacts.tableKey(spark, sfDir, Seq("lineitem", "part"))}"
    Artifacts.commit(spark, obDir) { tmp =>
      Tables.lineitem(spark, sfDir)
        .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("basket"), col("p_brand").as("brand"))
        .distinct().repartition(8)
        .write.mode("overwrite").parquet(tmp)
    }
    assocRulesFrom(spark.read.parquet(obDir), minSupPct)
  }

  /** The Apriori frequent-1-itemset prune: only (basket, brand) rows
    * whose brand meets min support can contribute to a pair above min
    * support (`sup_ab ≤ min(sup_a, sup_b)` — the downward-closure
    * lemma), so dropping infrequent brands BEFORE the basket self-join
    * is provably lossless for the pair output while shrinking the
    * join's input (and its shuffle) on a large item vocabulary. */
  private[ops] def frequentBaskets(ob: DataFrame, minSupPct: Int): DataFrame = {
    val n = ob.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val freq = ob.groupBy(col("brand")).agg(count(lit(1)).as("sup"))
      .crossJoin(broadcast(n))
      .filter(col("sup") * 100 >= col("n_baskets") * minSupPct)
      .select(col("brand"))
    ob.join(broadcast(freq), Seq("brand"), "left_semi")
  }

  /** [[assocRules]] over an explicit distinct (basket, brand) table —
    * the testable core (the prune's losslessness and its input
    * shrinkage are pinned in Round9OpsSpec against a rare-brand
    * corpus). */
  private[ops] def assocRulesFrom(ob0: DataFrame, minSupPct: Int): DataFrame = {
    // every stage references the distinct (basket, brand) table — N,
    // the support table, the prune, and BOTH pair-join sides — so
    // truncate it once; without this the upstream join+distinct
    // re-executes per reference (measured 2.5× on the bench)
    val ob = Truncate(ob0, "assoc_ob")
    val n = ob.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val sup = ob.groupBy(col("brand")).agg(count(lit(1)).as("sup"))
    // Apriori downward closure: sup_ab ≤ min(sup_a, sup_b), so brands
    // below min support cannot appear in any reported pair — dropping
    // their rows BEFORE the self-join is lossless (see frequentBaskets)
    val freq = sup.crossJoin(broadcast(n))
      .filter(col("sup") * 100 >= col("n_baskets") * minSupPct)
      .select(col("brand"))
    val obF = ob.join(broadcast(freq), Seq("brand"), "left_semi")
    // NOTE (r15): a collect_set-per-basket + combination-explode
    // rewrite (one exchange fewer on paper) measured ~20% SLOWER here:
    // with ~150k basket groups the set aggregate falls back to
    // sort-based aggregation, re-adding the sort the join shape never
    // pays, and the array lambdas evaluate outside whole-stage
    // codegen. The equi self-join on the basket key stays.
    val b2 = obF.select(col("basket"), col("brand").as("brand_b"))
    val pairs = obF.select(col("basket"), col("brand").as("brand_a"))
      .join(b2, Seq("basket"))
      .filter(col("brand_a") < col("brand_b"))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("sup_ab"))
    pairs
      .join(broadcast(sup.select(col("brand").as("brand_a"), col("sup").as("sup_a"))),
        Seq("brand_a"))
      .join(broadcast(sup.select(col("brand").as("brand_b"), col("sup").as("sup_b"))),
        Seq("brand_b"))
      .crossJoin(broadcast(n))
      .filter(col("sup_ab") * 100 >= col("n_baskets") * minSupPct)
      .select(col("brand_a"), col("brand_b"),
        col("sup_ab").cast("long").as("sup_ab"),
        col("sup_a").cast("long").as("sup_a"),
        col("sup_b").cast("long").as("sup_b"),
        expr("(sup_ab * 1000000) DIV sup_a").as("confidence_ppm"),
        expr("(sup_ab * n_baskets * 1000000) DIV (sup_a * sup_b)").as("lift_ppm"))
      .orderBy(col("brand_a"), col("brand_b"))
  }

  /** Oracle twin of [[assocRules]] — `minSupPct` interpolated. */
  def assocRulesSql(minSupPct: Int = 1): String =
    s"""WITH ob AS (
       |  SELECT DISTINCT l_orderkey AS basket, p_brand AS brand
       |  FROM lineitem JOIN part ON p_partkey = l_partkey),
       |n AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM ob),
       |sup AS (SELECT brand, CAST(count(*) AS BIGINT) AS sup FROM ob GROUP BY brand),
       |pairs AS (
       |  SELECT a.brand AS brand_a, b.brand AS brand_b,
       |    CAST(count(*) AS BIGINT) AS sup_ab
       |  FROM ob a JOIN ob b ON b.basket = a.basket AND a.brand < b.brand
       |  GROUP BY a.brand, b.brand)
       |SELECT brand_a, brand_b, sup_ab,
       |  sa.sup AS sup_a, sb.sup AS sup_b,
       |  CAST(sup_ab * 1000000 // sa.sup AS BIGINT) AS confidence_ppm,
       |  CAST(sup_ab * n_baskets * 1000000 // (sa.sup * sb.sup) AS BIGINT) AS lift_ppm
       |FROM pairs
       |JOIN sup sa ON sa.brand = brand_a
       |JOIN sup sb ON sb.brand = brand_b
       |CROSS JOIN n
       |WHERE sup_ab * 100 >= n_baskets * $minSupPct
       |ORDER BY brand_a, brand_b""".stripMargin
}
