package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2.2 "Window functions"):
  * ranking, lag/lead, running frames, per-group top-k, sessionization.
  *
  * Scale: window state is per-partition-key; Spark shuffles once on
  * partitionBy keys then sorts within partitions. Skewed keys are the
  * risk at 100 TB — all queries here partition on high-cardinality
  * keys (custkey, user_id), and the sessionize pattern is the same
  * shape Structured Streaming's session_window handles incrementally.
  */
object Windows {

  /** Running revenue per customer: row_number + cumulative sum over an
    * ordered frame. Emits one row per order with its running total. */
  def runningCustomerRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    ord.select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        row_number().over(w).cast("long").as("rn"),
        round(sum(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_total"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  def runningCustomerRevenueSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(row_number() OVER w AS BIGINT) AS rn,
      |  round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, rn""".stripMargin

  /** Top-2 orders per customer by totalprice — the distributed top-k
    * idiom (row_number ≤ k), which never materializes a full sort. */
  def topOrdersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= 2)
      .orderBy(col("o_custkey"), col("rk"))
  }

  def topOrdersPerCustomerSql: String =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
      |  FROM orders) t
      |WHERE rk <= 2
      |ORDER BY o_custkey, rk""".stripMargin

  /** lag/lead + rank over the events stream table: per-user inter-event
    * gap in milliseconds. Event time is normalized to epoch-millis
    * BIGINT on both sides (the parquet stores TIMESTAMP(NANOS) which
    * Spark and DuckDB truncate differently — see graft.Events). */
  def eventGaps(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts_ms", unix_millis(col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    ev.select(
        col("user_id"), col("event_id"), col("ts_ms"), col("event_type"),
        (col("ts_ms") - lag(col("ts_ms"), 1).over(w)).as("gap_ms"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        rank().over(w).cast("long").as("rk"))
      .orderBy(col("user_id"), col("rk"))
  }

  def eventGapsSql: String =
    """SELECT user_id, event_id, epoch_ms(ts::TIMESTAMP) AS ts_ms, event_type,
      |  epoch_ms(ts::TIMESTAMP) - lag(epoch_ms(ts::TIMESTAMP), 1) OVER w AS gap_ms,
      |  lead(event_type, 1) OVER w AS next_type,
      |  CAST(rank() OVER w AS BIGINT) AS rk
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts::TIMESTAMP), event_id)
      |ORDER BY user_id, rk""".stripMargin

  /** Sessionization: a new session starts after a >30 min gap; session
    * id = cumulative count of boundaries. This is the batch formulation
    * of the reference's ingest-buffer grouping (SURVEY §2.2 streaming
    * row) and of streaming session_window — same semantics, replayable
    * on history. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame =
    sessions(spark, sfDir).orderBy(col("user_id"), col("session_id"))

  /** The session frame behind [[sessionize]], without the output
    * ordering — reused by [[Behavior.sessionOverlap]] as its interval
    * table. */
  private[graft] def sessions(spark: SparkSession, sfDir: String): DataFrame = {
    val gapMs = 30L * 60 * 1000
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts_ms", unix_millis(col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val flagged = ev.select(
      col("user_id"), col("event_id"), col("ts_ms"),
      when(col("ts_ms") - lag(col("ts_ms"), 1).over(w) > gapMs || lag(col("ts_ms"), 1).over(w).isNull, 1L)
        .otherwise(0L).as("is_start"))
    flagged
      .withColumn("session_id",
        sum(col("is_start")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"))
  }

  /** The session CTE chain shared by [[sessionizeSql]] and
    * [[Behavior.sessionOverlapSql]] — one definition so the interval
    * table in the overlap oracle can never drift from the sessionize
    * oracle. Ends in a `sessions(user_id, session_id, n_events,
    * session_start_ms, session_end_ms)` CTE. */
  private[ops] val SessionsCteSql: String =
    """flagged AS (
      |  SELECT user_id, event_id, epoch_ms(ts::TIMESTAMP) AS ts_ms,
      |    CASE WHEN epoch_ms(ts::TIMESTAMP) - lag(epoch_ms(ts::TIMESTAMP), 1)
      |           OVER (PARTITION BY user_id ORDER BY epoch_ms(ts::TIMESTAMP), event_id) > 1800000
      |         OR lag(epoch_ms(ts::TIMESTAMP), 1)
      |           OVER (PARTITION BY user_id ORDER BY epoch_ms(ts::TIMESTAMP), event_id) IS NULL
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM events),
      |numbered AS (
      |  SELECT user_id, event_id, ts_ms,
      |    CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged),
      |sessions AS (
      |  SELECT user_id, session_id, count(*) AS n_events,
      |    min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms
      |  FROM numbered
      |  GROUP BY user_id, session_id)""".stripMargin

  def sessionizeSql: String =
    s"""WITH $SessionsCteSql
       |SELECT user_id, session_id, n_events, session_start_ms, session_end_ms
       |FROM sessions
       |ORDER BY user_id, session_id""".stripMargin

  /** Ranking-statistics windows — ntile / percent_rank / cume_dist
    * over per-priority price order (the remaining built-in window
    * family). The window ORDER BY carries a unique tiebreaker
    * (orderkey), so every rank function is deterministic; the output
    * is sampled (orderkey mod 100) AFTER the windows are computed, so
    * the full partitions are exercised while the compare set stays
    * small. */
  def rankStats(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        (round(percent_rank().over(w), 4) + lit(0.0)).as("pct_rank"),
        (round(cume_dist().over(w), 4) + lit(0.0)).as("cume"))
      .filter(col("o_orderkey") % 100 === 0)
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  def rankStatsSql: String =
    """SELECT o_orderpriority, o_orderkey, quartile, pct_rank, cume
      |FROM (
      |  SELECT o_orderpriority, o_orderkey,
      |    CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |    round(percent_rank() OVER w, 4) + 0.0 AS pct_rank,
      |    round(cume_dist() OVER w, 4) + 0.0 AS cume
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey))
      |WHERE o_orderkey % 100 = 0
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Value-based RANGE frame — the one window-frame kind the rest of
    * the surface doesn't exercise (running totals use ROWS, top-k uses
    * ranks). Per customer: revenue and order count inside a sliding
    * 28-day window ending at each order's date, i.e. `RANGE BETWEEN 27
    * PRECEDING AND CURRENT ROW` over the epoch-day of the order. RANGE
    * frames aggregate over every peer row whose ORDER BY *value* falls
    * in the interval, so same-day orders contribute to each other's
    * window regardless of physical order — the semantics no ROWS frame
    * can express, and deterministic without a tiebreaker in the frame.
    *
    * Engine parity: revenue is summed in integer cents (prices carry
    * exactly 2 decimals), so the sliding sums are exact and engine-
    * order-independent; the frame bound is an integer day count.
    *
    * Scale: one hash shuffle on o_custkey, then a per-partition sort +
    * sliding two-pointer frame — Spark's WindowExec keeps only the
    * active frame buffered, so window width bounds memory, not
    * partition size. */
  def rollingRangeRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir).select(
      col("o_custkey"), col("o_orderkey"),
      datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as("day"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-27, Window.currentRow)
    ord.select(
        col("o_custkey"), col("o_orderkey"), col("day"),
        sum(col("cents")).over(w).as("win_cents"),
        count(lit(1)).over(w).as("win_orders"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  def rollingRangeRevenueSql: String =
    """SELECT o_custkey, o_orderkey, day,
      |  CAST(sum(cents) OVER w AS BIGINT) AS win_cents,
      |  CAST(count(*) OVER w AS BIGINT) AS win_orders
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders)
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
      |             RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin
}
