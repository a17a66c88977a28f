package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY.md §2.2 "Aggregations"): multi-function
  * aggs, exact + approximate distinct, ROLLUP / CUBE grouping sets.
  *
  * All of these are two-phase HashAggregate (partial map-side combine →
  * final) in Spark — the shuffle carries one row per (group, partition),
  * so at 100 TB the network cost is bounded by group cardinality, not
  * input size.
  */
object Aggregates {

  /** Exact distinct counts per group. count_distinct triggers Spark's
    * two-shuffle expand plan; acceptable because group cardinality is
    * tiny. For high-cardinality groups at scale prefer
    * [[approxDistinct]] (single shuffle, HLL sketch merge). */
  def distinctStats(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))
  }

  def distinctStatsSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_suppkey) AS n_supp,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(*) AS n_lines
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Sketch-only approximate distinct — the ACTUAL 100 TB path
    * (mergeable HLL++, one shuffle, fixed memory, no exact-distinct
    * expansion). [[approxDistinct]] is the VERIFICATION query, which
    * deliberately pays the exact count so the oracle can bound the
    * estimate; production callers and scale probes use this form. */
  def approxDistinctRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))
  }

  /** HLL++ approximate distinct, VERIFICATION form. The raw sketch
    * estimate is implementation-specific, so the oracle-checkable
    * surface is DERIVED: the exact count (hash-compared directly) and
    * `approx_ok` = |approx − exact| / exact < 5·rsd, which the oracle
    * asserts as literal TRUE — if Spark's estimate ever drifts far
    * outside the sigma band the hash mismatches and the row goes red.
    * 5·rsd, not 3: rsd is a standard-DEVIATION target, and the
    * deterministic per-corpus estimate can legitimately land past 3σ
    * on some scale factor — a hard gate there turns a healthy sketch
    * into a permanently red row; 5σ still catches a broken sketch
    * (order-of-magnitude drift) without flaking on tail corpora. The
    * exact companion is the cost of a hard cross-engine check; the
    * sketch-only plan a 100 TB run would use is [[approxDistinctRaw]]
    * (ScaleProbe times that one). */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val rsd = 0.02
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd).as("approx_parts"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"))
      .select(col("l_returnflag"), col("n_parts"), col("n_lines"),
        (abs(col("approx_parts") - col("n_parts")) / col("n_parts") < 5 * rsd).as("approx_ok"))
      .orderBy(col("l_returnflag"))
  }

  def approxDistinctSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(*) AS n_lines,
      |  TRUE AS approx_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** ROLLUP over (returnflag, linestatus): hierarchical subtotals +
    * grand total. NULL group markers are replaced with '(all)' so the
    * oracle compare never depends on engine NULL-ordering defaults. */
  def rollupSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("sum_qty"), col("n_lines"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  def rollupSummarySql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
      |  coalesce(l_linestatus, '(all)') AS linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS n_lines
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** CUBE over (orderstatus, orderpriority): all 4 grouping-set
    * combinations. */
  def cubeSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    ord.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("sum_total"),
        count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("orderpriority"),
        col("sum_total"), col("n_orders"))
      .orderBy(col("orderstatus"), col("orderpriority"))
  }

  def cubeSummarySql: String =
    """SELECT coalesce(o_orderstatus, '(all)') AS orderstatus,
      |  coalesce(o_orderpriority, '(all)') AS orderpriority,
      |  round(sum(o_totalprice), 2) AS sum_total,
      |  count(*) AS n_orders
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY orderstatus, orderpriority""".stripMargin

  /** min/max/stddev/percentile-free stats per month (date_trunc).
    * DuckDB's date_trunc returns DATE, Spark's TIMESTAMP — both sides
    * cast explicitly to TIMESTAMP. */
  def monthlyOrderStats(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    ord.groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(min(col("o_totalprice")), 2).as("min_total"),
        round(max(col("o_totalprice")), 2).as("max_total"),
        round(avg(col("o_totalprice")), 4).as("avg_total"))
      .orderBy(col("month"))
  }

  /** Interpolated percentiles per group (exact, not sketch): Spark's
    * `percentile` and DuckDB's `quantile_cont` share the linear-
    * interpolation definition. (The sketch alternative for 100 TB —
    * `approx_percentile`, mergeable t-digest-style, one pass — is
    * engine-specific in value and therefore tested in ScalaTest, not
    * against the oracle.) Emitted as three scalar columns — ARRAY
    * outputs are unsortable/unhashable in the driver's checker. */
  def priceQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    ord.groupBy(col("o_orderpriority"))
      .agg(percentile(col("o_totalprice"), array(lit(0.25), lit(0.5), lit(0.9))).as("q_raw"),
        count(lit(1)).as("n_orders"))
      .select(col("o_orderpriority"),
        (round(col("q_raw")(0), 4) + lit(0.0)).as("q25"),
        (round(col("q_raw")(1), 4) + lit(0.0)).as("q50"),
        (round(col("q_raw")(2), 4) + lit(0.0)).as("q90"),
        col("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  def priceQuantilesSql: String =
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.25), 4) + 0.0 AS q25,
      |  round(quantile_cont(o_totalprice, 0.5), 4) + 0.0 AS q50,
      |  round(quantile_cont(o_totalprice, 0.9), 4) + 0.0 AS q90,
      |  count(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  def monthlyOrderStatsSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |  count(*) AS n_orders,
      |  round(min(o_totalprice), 2) AS min_total,
      |  round(max(o_totalprice), 2) AS max_total,
      |  round(avg(o_totalprice), 4) AS avg_total
      |FROM orders
      |GROUP BY 1
      |ORDER BY month""".stripMargin

  /** Statistical aggregates — corr / covariance / stddev of
    * (l_quantity, l_extendedprice) per return flag.
    *
    * NOT the built-in corr()/covar_samp()/stddev_samp(): those fold
    * DOUBLEs in partition order, and FP addition is non-associative —
    * the low-order bits (and after rounding, occasionally the 4th
    * decimal) differ between engines and even between partitionings of
    * the same engine. Instead the moments are EXACT decimal sums of
    * integer-scaled values (quantity is integer-valued, price has
    * exactly 2 decimals — checked against the corpus), which are
    * order-independent; the closed-form statistics are then one
    * deterministic double expression over those exact sums, identical
    * in both engines. Same family as the scaled-integer-sum rule used
    * by q_ivf_assign.
    *
    * Scale: one map-side-combinable aggregation — six decimal sums —
    * in a single shuffle on the group key; decimal(38) accumulators
    * hold Σp² to ~10³⁸, enough for 10¹⁶ rows. */
  def corrStats(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val q = col("l_quantity").cast("decimal(18,0)")
    val p = (col("l_extendedprice") * 100).cast("decimal(18,0)")
    val n = col("n").cast("double")
    val sq = col("sq").cast("double"); val sp = col("sp").cast("double")
    val sqq = col("sqq").cast("double"); val spp = col("spp").cast("double")
    val sqp = col("sqp").cast("double")
    l.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(q).as("sq"), sum(p).as("sp"),
        sum(q * q).as("sqq"), sum(p * p).as("spp"), sum(q * p).as("sqp"))
      .select(col("l_returnflag"), col("n"),
        (round((n * sqp - sq * sp) /
          (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)), 4) + lit(0.0))
          .as("corr_qp"),
        // descale: price carries the ×100, covariance one factor of it
        (round((n * sqp - sq * sp) / (n * (n - 1)) / 100.0, 4) + lit(0.0))
          .as("covar_qp"),
        (round(sqrt((n * sqq - sq * sq) / (n * (n - 1))), 4) + lit(0.0)).as("sd_q"),
        (round(sqrt((n * spp - sp * sp) / (n * (n - 1))) / 100.0, 4) + lit(0.0)).as("sd_p"))
      .orderBy(col("l_returnflag"))
  }

  def corrStatsSql: String =
    """WITH sums AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    sum(CAST(l_quantity AS DECIMAL(18,0))) AS sq,
      |    sum(CAST(l_extendedprice * 100 AS DECIMAL(18,0))) AS sp,
      |    sum(CAST(l_quantity AS DECIMAL(18,0)) * CAST(l_quantity AS DECIMAL(18,0))) AS sqq,
      |    sum(CAST(l_extendedprice * 100 AS DECIMAL(18,0)) * CAST(l_extendedprice * 100 AS DECIMAL(18,0))) AS spp,
      |    sum(CAST(l_quantity AS DECIMAL(18,0)) * CAST(l_extendedprice * 100 AS DECIMAL(18,0))) AS sqp
      |  FROM lineitem GROUP BY l_returnflag),
      |d AS (
      |  SELECT l_returnflag, n,
      |    CAST(n AS DOUBLE) AS nd, CAST(sq AS DOUBLE) AS sqd, CAST(sp AS DOUBLE) AS spd,
      |    CAST(sqq AS DOUBLE) AS sqqd, CAST(spp AS DOUBLE) AS sppd, CAST(sqp AS DOUBLE) AS sqpd
      |  FROM sums)
      |SELECT l_returnflag, n,
      |  round((nd * sqpd - sqd * spd) /
      |    (sqrt(nd * sqqd - sqd * sqd) * sqrt(nd * sppd - spd * spd)), 4) + 0.0 AS corr_qp,
      |  round((nd * sqpd - sqd * spd) / (nd * (nd - 1)) / 100.0, 4) + 0.0 AS covar_qp,
      |  round(sqrt((nd * sqqd - sqd * sqd) / (nd * (nd - 1))), 4) + 0.0 AS sd_q,
      |  round(sqrt((nd * sppd - spd * spd) / (nd * (nd - 1))) / 100.0, 4) + 0.0 AS sd_p
      |FROM d
      |ORDER BY l_returnflag""".stripMargin

  /** Per-group z-score outlier detection — the data-quality gate that
    * flags events whose `value` sits more than 3 population standard
    * deviations from its event-type mean. The moment sums (n, Σv, Σv²)
    * are EXACT decimal arithmetic over micro-scaled values (same
    * discipline as [[corrStats]]: the double-folding built-ins are
    * partition-order-dependent); only the final flag comparison and the
    * reported z drop to doubles, computed by the letter-identical
    * formula on both engines so the decision boundary cannot diverge.
    * Decimal envelope: v ≤ 10¹⁸ micros and Σv² ≤ 10²⁵ — ~10⁷ events
    * per type at this value range; widen the casts alongside the data.
    *
    * Flag: (n·v − S)² > 9·(n·Q − S²), i.e. |z| > 3 with
    * z = (n·v − S) / √(n·Q − S²) — the n·x-vs-S form never divides, so
    * no rounding enters the decision.
    *
    * Scale: one hash agg to 5 stat rows (fixed cardinality — the
    * broadcast hint is safe at ANY sf, unlike the linearly-growing dims
    * the plan audits ban), then a broadcast join back over one scan. */
  def anomalyZscore(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 1000000L).cast("decimal(18,0)").as("v"))
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("decimal(13,0)").as("n"),
        sum(col("v")).cast("decimal(19,0)").as("s"),
        sum(col("v") * col("v")).cast("decimal(25,0)").as("q"))
    val nd = col("n").cast("double"); val sd = col("s").cast("double")
    val qd = col("q").cast("double"); val vd = col("v").cast("double")
    val dev = nd * vd - sd
    ev.join(broadcast(stats), "event_type")
      .filter(dev * dev > lit(9.0) * (nd * qd - sd * sd))
      .select(col("event_type"), col("event_id"),
        col("v").cast("long").as("value_e6"),
        col("n").cast("long").as("n"),
        (round(dev / sqrt(nd * qd - sd * sd), 4) + lit(0.0)).as("z"))
      .orderBy(col("event_type"), col("event_id"))
  }

  def anomalyZscoreSql: String =
    """WITH ev AS (
      |  SELECT event_id, event_type,
      |    CAST(round(value * 1000000) AS DECIMAL(18,0)) AS v
      |  FROM events),
      |stats AS (
      |  SELECT event_type,
      |    CAST(count(*) AS DECIMAL(13,0)) AS n,
      |    CAST(sum(v) AS DECIMAL(19,0)) AS s,
      |    CAST(sum(v * v) AS DECIMAL(25,0)) AS q
      |  FROM ev GROUP BY event_type),
      |joined AS (
      |  SELECT ev.event_type, ev.event_id, ev.v,
      |    CAST(st.n AS DOUBLE) AS nd, CAST(st.s AS DOUBLE) AS sd,
      |    CAST(st.q AS DOUBLE) AS qd, CAST(ev.v AS DOUBLE) AS vd,
      |    CAST(st.n AS BIGINT) AS n
      |  FROM ev JOIN stats st ON st.event_type = ev.event_type)
      |SELECT event_type, event_id,
      |  CAST(v AS BIGINT) AS value_e6, n,
      |  round((nd * vd - sd) / sqrt(nd * qd - sd * sd), 4) + 0.0 AS z
      |FROM joined
      |WHERE (nd * vd - sd) * (nd * vd - sd) > 9.0 * (nd * qd - sd * sd)
      |ORDER BY event_type, event_id""".stripMargin

  /** RFM (recency / frequency / monetary) customer segmentation — the
    * classic CRM rollup: per customer, days since last order, order
    * count, and lifetime spend in integer cents; each dimension scored
    * into quartiles 1 (best) … 4 and the population counted per
    * (r, f, m) cell.
    *
    * Quartile assignment is THRESHOLD-based, not ntile: the three
    * quartile boundaries per dimension come from one model-sized
    * (1-row) exact-quantile aggregate broadcast back over the
    * per-customer frame, so equal values always land in the same
    * segment and NO global-rank window (single-partition sort of every
    * customer) exists in the plan — ntile's per-row global rank is the
    * scale-killer shape PlanAuditSpec bans. Spark `percentile` ≡ DuckDB
    * `quantile_cont` (shared linear-interpolation definition, the
    * q_agg_quantiles precedent); thresholds interpolate BIGINTs so the
    * halves are dyadic — exact as doubles — and the strict `>`
    * comparisons cannot diverge. At 100 TB swap the exact quantile for
    * `approx_percentile` (mergeable sketch) and re-pin thresholds.
    *
    * Scale: one custkey shuffle (map-side combined), a 1-row broadcast
    * threshold join, one (r, f, m) rollup — no per-row window. */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val per = o.groupBy(col("o_custkey"))
      .agg(max(unix_millis(col("o_orderdate").cast("timestamp"))).as("last_ms"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("monetary_cents"))
      .crossJoin(broadcast(o.agg(max(unix_millis(col("o_orderdate").cast("timestamp"))).as("max_ms"))))
      .select(col("o_custkey"),
        expr("(max_ms - last_ms) DIV 86400000").as("recency_days"),
        col("freq"), col("monetary_cents"))
    val thr = per.agg(
      percentile(col("recency_days"), array(lit(0.25), lit(0.5), lit(0.75))).as("rq"),
      percentile(col("freq"), array(lit(0.25), lit(0.5), lit(0.75))).as("fq"),
      percentile(col("monetary_cents"), array(lit(0.25), lit(0.5), lit(0.75))).as("mq"))
    def passed(v: Column, q: Column, i: Int): Column =
      when(v.cast("double") > q(i), 1).otherwise(0)
    per.crossJoin(broadcast(thr))
      .select(col("o_custkey"), col("monetary_cents"),
        (lit(1) + passed(col("recency_days"), col("rq"), 0)
          + passed(col("recency_days"), col("rq"), 1)
          + passed(col("recency_days"), col("rq"), 2)).as("r"),
        (lit(4) - passed(col("freq"), col("fq"), 0)
          - passed(col("freq"), col("fq"), 1)
          - passed(col("freq"), col("fq"), 2)).as("f"),
        (lit(4) - passed(col("monetary_cents"), col("mq"), 0)
          - passed(col("monetary_cents"), col("mq"), 1)
          - passed(col("monetary_cents"), col("mq"), 2)).as("m"))
      .groupBy(col("r"), col("f"), col("m"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary_cents")).as("sum_monetary_cents"))
      .orderBy(col("r"), col("f"), col("m"))
  }

  def rfmSegmentsSql: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |    (epoch_ms((SELECT max(o_orderdate) FROM orders)::TIMESTAMP)
      |     - epoch_ms(max(o_orderdate)::TIMESTAMP)) // 86400000 AS recency_days,
      |    count(*) AS freq,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
      |  FROM orders GROUP BY o_custkey),
      |thr AS (
      |  SELECT
      |    quantile_cont(recency_days, 0.25) AS r25, quantile_cont(recency_days, 0.5) AS r50,
      |    quantile_cont(recency_days, 0.75) AS r75,
      |    quantile_cont(freq, 0.25) AS f25, quantile_cont(freq, 0.5) AS f50,
      |    quantile_cont(freq, 0.75) AS f75,
      |    quantile_cont(monetary_cents, 0.25) AS m25, quantile_cont(monetary_cents, 0.5) AS m50,
      |    quantile_cont(monetary_cents, 0.75) AS m75
      |  FROM per),
      |scored AS (
      |  SELECT o_custkey, monetary_cents,
      |    1 + (CASE WHEN CAST(recency_days AS DOUBLE) > r25 THEN 1 ELSE 0 END)
      |      + (CASE WHEN CAST(recency_days AS DOUBLE) > r50 THEN 1 ELSE 0 END)
      |      + (CASE WHEN CAST(recency_days AS DOUBLE) > r75 THEN 1 ELSE 0 END) AS r,
      |    4 - (CASE WHEN CAST(freq AS DOUBLE) > f25 THEN 1 ELSE 0 END)
      |      - (CASE WHEN CAST(freq AS DOUBLE) > f50 THEN 1 ELSE 0 END)
      |      - (CASE WHEN CAST(freq AS DOUBLE) > f75 THEN 1 ELSE 0 END) AS f,
      |    4 - (CASE WHEN CAST(monetary_cents AS DOUBLE) > m25 THEN 1 ELSE 0 END)
      |      - (CASE WHEN CAST(monetary_cents AS DOUBLE) > m50 THEN 1 ELSE 0 END)
      |      - (CASE WHEN CAST(monetary_cents AS DOUBLE) > m75 THEN 1 ELSE 0 END) AS m
      |  FROM per CROSS JOIN thr)
      |SELECT r, f, m, count(*) AS n_customers,
      |  CAST(sum(monetary_cents) AS BIGINT) AS sum_monetary_cents
      |FROM scored
      |GROUP BY r, f, m
      |ORDER BY r, f, m""".stripMargin

  // --------------------------------------------------------------------
  // MAD robust outlier gate
  // --------------------------------------------------------------------

  /** Robust outlier gate per event type on the median absolute
    * deviation — the companion [[anomalyZscore]] needs on heavy-tailed
    * data, where outliers inflate the stddev they are tested against
    * until nothing is 3σ out (masking). Median and MAD don't move for
    * up to 50% contamination: m = median(value_cents),
    * MAD = median(|v − m|), and the Iglewicz–Hobbs modified z-score
    * flags `0.6745·|v − m| / MAD > 3.5`, applied here as the EXACT
    * integer cross-multiplication `6745·|v − m| > 35000·MAD` — no
    * division, no float, no rounding to diverge on.
    *
    * Both medians use the [[Selection.weightedMedian]] histogram
    * formulation (`2·cum ≥ tot` on a (type, value) histogram): windows
    * only ever scan histogram rows, so no per-type corpus sort exists
    * — and the deviation histogram derives from the value histogram
    * (distinct values, not rows), so the second pass is
    * histogram-sized end to end.
    *
    * Scale: two histogram aggs + histogram windows + one broadcast of
    * the #types-row stats table back over the rows. A degenerate type
    * with MAD = 0 (>50% identical values) flags every non-median
    * value — correct for the statistic. */
  def madOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
    val hist = ev.groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("c"))
    val wTot = Window.partitionBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val med = hist
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("tot", sum(col("n")).over(wTot))
      .groupBy(col("event_type"))
      .agg(min(when(col("cum") * 2 >= col("tot"), col("c"))).as("m"))
    // deviation histogram from the VALUE histogram (re-binned |c − m|)
    val devHist = hist.join(med, Seq("event_type"))
      .select(col("event_type"), abs(col("c") - col("m")).as("d"), col("n"))
      .groupBy(col("event_type"), col("d")).agg(sum(col("n")).as("n"))
    val wCumD = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val mad = devHist
      .withColumn("cum", sum(col("n")).over(wCumD))
      .withColumn("tot", sum(col("n")).over(wTot))
      .groupBy(col("event_type"))
      .agg(min(when(col("cum") * 2 >= col("tot"), col("d"))).as("mad"))
    val stats = med.join(mad, Seq("event_type"))
    ev.join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max(col("m")).as("median_c"), max(col("mad")).as("mad_c"),
        sum(when(abs(col("c") - col("m")) * 6745 > col("mad") * 35000, 1L)
          .otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_ppm", expr("(n_outliers * 1000000) DIV n_events"))
      .orderBy(col("event_type"))
  }

  def madOutliersSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
      |hist AS (
      |  SELECT event_type, c, CAST(count(*) AS BIGINT) AS n
      |  FROM ev GROUP BY event_type, c),
      |med AS (
      |  SELECT event_type, min(CASE WHEN cum * 2 >= tot THEN c END) AS m
      |  FROM (
      |    SELECT event_type, c,
      |      CAST(sum(n) OVER (PARTITION BY event_type ORDER BY c) AS BIGINT) AS cum,
      |      CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
      |    FROM hist)
      |  GROUP BY event_type),
      |devhist AS (
      |  SELECT h.event_type, abs(h.c - m.m) AS d, CAST(sum(h.n) AS BIGINT) AS n
      |  FROM hist h JOIN med m USING (event_type)
      |  GROUP BY h.event_type, abs(h.c - m.m)),
      |mad AS (
      |  SELECT event_type, min(CASE WHEN cum * 2 >= tot THEN d END) AS mad
      |  FROM (
      |    SELECT event_type, d,
      |      CAST(sum(n) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS cum,
      |      CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
      |    FROM devhist)
      |  GROUP BY event_type)
      |SELECT ev.event_type, count(*) AS n_events,
      |  CAST(max(m.m) AS BIGINT) AS median_c,
      |  CAST(max(d.mad) AS BIGINT) AS mad_c,
      |  CAST(sum(CASE WHEN abs(ev.c - m.m) * 6745 > d.mad * 35000
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST(CAST(sum(CASE WHEN abs(ev.c - m.m) * 6745 > d.mad * 35000
      |           THEN 1 ELSE 0 END) AS BIGINT) * 1000000
      |       // count(*) AS BIGINT) AS outlier_ppm
      |FROM ev
      |JOIN med m USING (event_type)
      |JOIN mad d USING (event_type)
      |GROUP BY ev.event_type
      |ORDER BY ev.event_type""".stripMargin

  // --------------------------------------------------------------------
  // Incremental aggregate maintenance (materialized-view merge)
  // --------------------------------------------------------------------

  /** Incremental aggregate maintenance — the materialized-view story at
    * 100 TB: a daily (event_type × day) rollup maintained as BASE
    * partials (history before `cutoff`, in production the stored MV)
    * merged with DELTA partials (the new arrivals) by re-aggregating
    * the partial states, instead of recomputing over all history.
    * count/sum/min/max are the classic self-maintainable aggregates:
    * merge(count)=Σ, merge(sum)=Σ, merge(min)=min, merge(max)=max.
    *
    * The ORACLE is the flat one-pass groupBy over the whole table — a
    * green run PROVES partial-merge ≡ full recompute (the same
    * oracle-reproves-the-rewrite pattern as the salted aggs). Values
    * are exact integer cents, so every merge is order-independent.
    *
    * Scale: in production the base side is a stored table that never
    * rescans history (cost = O(delta) + O(mv)) and the event lake is
    * date-partitioned so the delta scan prunes to post-cutoff
    * partitions. Here both sides scan the same parquet and the cutoff
    * is a post-decode filter — the TIMESTAMP(NANOS) escape hatch
    * ([[graft.Events.events]]) rebuilds `ts` from the raw long, so the
    * predicate cannot reach the parquet reader; on a natively-typed or
    * partitioned table it would. The plan property that matters — TWO
    * partial aggs merged by a final agg, no rescan of either side —
    * is pinned in PlanAuditSpec. */
  def incrAggMerge(spark: SparkSession, sfDir: String,
      cutoff: String = "2024-01-16 00:00:00"): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"), to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
    def partials(df: DataFrame): DataFrame =
      df.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
          min(col("cents")).as("mn"), max(col("cents")).as("mx"))
    val base = partials(ev.filter(col("ts") < lit(cutoff).cast("timestamp")))
    val delta = partials(ev.filter(col("ts") >= lit(cutoff).cast("timestamp")))
    base.unionByName(delta)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n")).cast("long").as("n_events"),
        sum(col("s")).cast("long").as("sum_cents"),
        min(col("mn")).cast("long").as("min_cents"),
        max(col("mx")).cast("long").as("max_cents"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Approximate-percentile acceptance audit — the [[approxDistinct]]
    * pattern for order statistics: per event type, the engine's
    * `approx_percentile` (Greenwald–Khanna sketch, accuracy 1000 ⇒
    * rank error ≤ n/1000) at p50/p90/p99 is checked against the EXACT
    * interpolated quantiles at q ± 5ε (the 5× slack precedent of the
    * HLL audit — the sketch returns an actual data value, so the
    * interpolated band needs headroom on tiny/tied strata). The hash
    * gate covers the exact quantiles and counts; the sketch's values
    * surface only through the `ok_*` booleans, which the oracle states
    * as literals — the same derived-column discipline as
    * [[approxDistinctSql]].
    *
    * Why it matters at 100 TB: exact percentile is a full sort per
    * group; the sketch is one mergeable pass. This table is the
    * evidence that swapping one for the other keeps the promised rank
    * bound on THIS data. */
  def approxQuantileAcc(spark: SparkSession, sfDir: String): DataFrame = {
    val qs = Seq(0.5, 0.9, 0.99)
    val slack = 0.005
    val exactProbes = qs.flatMap(q => Seq(q - slack, q, q + slack))
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    val agg = ev.groupBy(col("event_type"))
      .agg(percentile(col("cents"), array(exactProbes.map(lit): _*)).as("ex"),
        approx_percentile(col("cents"), array(qs.map(lit): _*), lit(1000)).as("ap"),
        count(lit(1)).as("n_events"))
    val cols = qs.zipWithIndex.flatMap { case (q, i) =>
      val name = s"p${(q * 100).toInt}"
      Seq((round(col("ex")(i * 3 + 1), 4) + lit(0.0)).as(name),
        (col("ap")(i) >= col("ex")(i * 3) && col("ap")(i) <= col("ex")(i * 3 + 2))
          .as(s"ok_$name"))
    }
    agg.select(col("event_type") +: cols :+ col("n_events"): _*)
      .orderBy(col("event_type"))
  }

  /** Oracle twin of [[approxQuantileAcc]] — exact quantiles hashed,
    * sketch acceptance as TRUE literals (engine-only estimate). */
  def approxQuantileAccSql: String =
    """SELECT event_type,
      |  round(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5), 4) + 0.0 AS p50,
      |  TRUE AS ok_p50,
      |  round(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.9), 4) + 0.0 AS p90,
      |  TRUE AS ok_p90,
      |  round(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.99), 4) + 0.0 AS p99,
      |  TRUE AS ok_p99,
      |  count(*) AS n_events
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Oracle twin of [[incrAggMerge]]: the FLAT full recompute — green
    * proves the base+delta partial merge equals it exactly. */
  def incrAggMergeSql: String =
    """SELECT event_type, CAST(ts AS DATE) AS day,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
      |  CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
      |FROM events
      |GROUP BY event_type, CAST(ts AS DATE)
      |ORDER BY event_type, day""".stripMargin

  /** RETRACTABLE incremental aggregate maintenance — [[incrAggMerge]]
    * handles inserts; this handles DELETES (the arrival the lake's
    * deletion vectors now produce): maintain the (event_type × day)
    * rollup under a delete delta WITHOUT recomputing history.
    * count/sum retract algebraically (n−n_d, s−s_d). min/max are NOT
    * self-maintainable under deletion — so the classic affected-group
    * trick: a group's extrema are recomputed from surviving rows ONLY
    * when the delete delta touched them (deleted min ≤ group min or
    * deleted max ≥ group max); untouched groups keep their stored
    * extrema. Groups fully deleted drop out.
    *
    * The ORACLE is the flat recompute over surviving rows — a green
    * run proves the retraction identity INCLUDING the
    * recompute-only-affected branch (a wrong "safe" classification
    * would surface as a hash mismatch).
    *
    * Scale: the delete delta aggregates in one partial-combined pass;
    * the recompute scan is pruned to affected groups by a semi-join
    * (cost = O(rows of groups whose extremum died), not O(history)).
    * The delete set here is `event_id % 97 = 0` — a deterministic
    * ~1% row-level delete both engines select identically. */
  def incrAggDelete(spark: SparkSession, sfDir: String, mod: Long = 97): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val doomed = col("event_id") % mod === 0
    def partials(df: DataFrame, suffix: String): DataFrame =
      df.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as(s"n$suffix"), sum(col("cents")).as(s"s$suffix"),
          min(col("cents")).as(s"mn$suffix"), max(col("cents")).as(s"mx$suffix"))
    // merged is group-count-sized and referenced twice (safe branch +
    // affected branch); truncating it keeps the corpus from being
    // scanned once per reference
    val merged = Truncate(partials(ev, "").join(
        partials(ev.filter(doomed), "_d"), Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("n_d", "s_d"))
      .withColumn("n2", col("n") - col("n_d"))
      .withColumn("s2", col("s") - col("s_d"))
      .filter(col("n2") > 0), "incr-agg-del")
    val touched = col("mn_d").isNotNull &&
      (col("mn_d") <= col("mn") || col("mx_d") >= col("mx"))
    val affected = merged.filter(touched)
    val recomputed = ev.filter(!doomed)
      .join(affected.select(col("event_type"), col("day")),
        Seq("event_type", "day"), "left_semi")
      .groupBy(col("event_type"), col("day"))
      .agg(min(col("cents")).as("mn_r"), max(col("cents")).as("mx_r"))
    val out = merged.filter(!touched)
      .select(col("event_type"), col("day"), col("n2"), col("s2"),
        col("mn").as("mn_o"), col("mx").as("mx_o"))
      .unionByName(affected
        .join(recomputed, Seq("event_type", "day"))
        .select(col("event_type"), col("day"), col("n2"), col("s2"),
          col("mn_r").as("mn_o"), col("mx_r").as("mx_o")))
    out.select(col("event_type"), col("day"),
        col("n2").cast("long").as("n_events"),
        col("s2").cast("long").as("sum_cents"),
        col("mn_o").cast("long").as("min_cents"),
        col("mx_o").cast("long").as("max_cents"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Oracle twin of [[incrAggDelete]]: the flat recompute over
    * surviving rows — `mod` interpolated. */
  def incrAggDeleteSql(mod: Long = 97): String =
    s"""SELECT event_type, CAST(ts AS DATE) AS day,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       |  CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
       |  CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
       |FROM events
       |WHERE event_id % $mod <> 0
       |GROUP BY event_type, CAST(ts AS DATE)
       |ORDER BY event_type, day""".stripMargin

  // --------------------------------------------------------------------
  // Poisson bootstrap: one-pass uncertainty quantification
  // --------------------------------------------------------------------

  /** Bootstrap confidence interval for the per-type mean value — the
    * POISSON bootstrap (Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", Google 2012): classical resampling needs n
    * draws WITH replacement per replicate — impossible in one pass over
    * distributed data — but each row's multiplicity in a replicate is
    * asymptotically Poisson(1), so every row independently draws its
    * weight per replicate and one groupBy computes all `reps` replicate
    * means simultaneously. The uncertainty attached to every metric this
    * suite reports, as a query.
    *
    * Determinism for the oracle gate: the Poisson draw is SEEDED — the
    * first 48 md5 bits of `event_id:rep` compared against the
    * Poisson(1) inverse-CDF thresholds e⁻¹·Σ1/k! QUANTIZED to 48 bits
    * and baked as 12-char hex literals (capped at 5 — P(K>5) ≈ 6·10⁻⁴
    * truncated identically on both sides). The comparison stays on the
    * hex STRING (lexicographic order on fixed-width lowercase hex IS
    * numeric order), so the per-row cost is one md5 + five string
    * compares — no base-conversion (`conv` walks a BigInteger string
    * parse per evaluation and dominated the draw, measured 2×). Replicate means are exact integer division over
    * non-negative cents; the interval is the 2nd/(count−1)th ORDER
    * STATISTIC of the SURVIVING replicate means (a replicate whose
    * every row drew 0 has no mean and is dropped — P = e^-n per type,
    * real for tiny types and an ANSI /0 error otherwise; rank 2 and 31
    * of 32 ≈ a 94% CI) — rank-based, no percentile interpolation to
    * diverge on.
    *
    * Scale: one explode (×reps, linear) into a map-side-combined
    * (type, rep) agg; the rank window runs over types × reps rows. */
  def bootstrapCi(spark: SparkSession, sfDir: String, reps: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    // the md5 draw costs ~1 µs/row × reps: spread the PRE-explode rows
    // across every core first — with an EXPLICIT partition count, or
    // AQE sizes the exchange on its (tiny, pre-blowup) bytes and
    // coalesces the whole reps× draw back onto one task (measured 4×
    // the wall time at sf0.1)
    val expl = ev
      .repartition(spark.sparkContext.defaultParallelism, col("event_id"))
      .select(col("event_type"), col("event_id"), col("cents"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
    val h = substring(md5(concat(col("event_id").cast("string"), lit(":"),
      col("rep").cast("string"))), 1, 12)
    val t = poissonHexThresholds
    val w = when(h < t(0), 0L).when(h < t(1), 1L).when(h < t(2), 2L)
      .when(h < t(3), 3L).when(h < t(4), 4L).otherwise(5L)
    // a replicate whose every row drew weight 0 (P = e^-n per type —
    // real for tiny types) has no mean: drop it BEFORE the division
    // (ANSI mode makes /0 a runtime error) and rank over the survivors
    val repMeans = expl.withColumn("w", w)
      .groupBy(col("event_type"), col("rep"))
      .agg(sum(col("w") * col("cents")).as("swc"), sum(col("w")).as("sw"))
      .filter(col("sw") > 0)
      .withColumn("mean_e4", expr("(swc * 10000) DIV sw"))
    val rk = Window.partitionBy(col("event_type"))
      .orderBy(col("mean_e4"), col("rep"))
    val cw = Window.partitionBy(col("event_type"))
    val ranked = repMeans
      .withColumn("r", row_number().over(rk))
      .withColumn("cnt", count(lit(1)).over(cw))
      .groupBy(col("event_type"))
      .agg(max(when(col("r") === 2, col("mean_e4"))).as("boot_lo_e4"),
        max(when(col("r") === col("cnt") - 1, col("mean_e4"))).as("boot_hi_e4"))
    val full = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sc"))
      .withColumn("mean_e4", expr("(sc * 10000) DIV n_events"))
    full.join(ranked, Seq("event_type"))
      .select(col("event_type"), col("n_events"), col("mean_e4"),
        col("boot_lo_e4"), col("boot_hi_e4"),
        (col("boot_hi_e4") - col("boot_lo_e4")).as("boot_spread_e4"))
      .orderBy(col("event_type"))
  }

  /** The Poisson(1) inverse-CDF thresholds e⁻¹·Σ1/k! for k = 0..4,
    * quantized to 48 bits as 12-char lowercase hex — ONE definition
    * for the engine, the oracle text, and the spec replay. */
  val poissonHexThresholds: Seq[String] =
    Seq(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563)
      .map(c => f"${math.round(c * 281474976710656.0)}%012x")

  /** Oracle twin of [[bootstrapCi]] — `reps` interpolated, identical
    * seeded hex-threshold draw. */
  def bootstrapCiSql(reps: Int = 32): String = {
    val h = "substr(md5(CAST(event_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)), 1, 12)"
    val t = poissonHexThresholds
    s"""WITH ev AS (
       |  SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |expl AS (
       |  SELECT event_type, event_id, cents, r.rep
       |  FROM ev CROSS JOIN (SELECT unnest(generate_series(0, ${reps - 1})) AS rep) r),
       |weighted AS (
       |  SELECT event_type, rep, cents,
       |    CASE WHEN $h < '${t(0)}' THEN 0
       |         WHEN $h < '${t(1)}' THEN 1
       |         WHEN $h < '${t(2)}' THEN 2
       |         WHEN $h < '${t(3)}' THEN 3
       |         WHEN $h < '${t(4)}' THEN 4
       |         ELSE 5 END AS w
       |  FROM expl),
       |rep_means AS (
       |  SELECT event_type, rep,
       |    CAST(sum(w * cents) AS BIGINT) * 10000 // CAST(sum(w) AS BIGINT) AS mean_e4
       |  FROM weighted GROUP BY event_type, rep
       |  HAVING sum(w) > 0),
       |ranked AS (
       |  SELECT event_type, mean_e4,
       |    row_number() OVER (PARTITION BY event_type ORDER BY mean_e4, rep) AS r,
       |    count(*) OVER (PARTITION BY event_type) AS cnt
       |  FROM rep_means),
       |ci AS (
       |  SELECT event_type,
       |    CAST(max(CASE WHEN r = 2 THEN mean_e4 END) AS BIGINT) AS boot_lo_e4,
       |    CAST(max(CASE WHEN r = cnt - 1 THEN mean_e4 END) AS BIGINT) AS boot_hi_e4
       |  FROM ranked GROUP BY event_type),
       |full_mean AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       |    CAST(sum(cents) AS BIGINT) * 10000 // CAST(count(*) AS BIGINT) AS mean_e4
       |  FROM ev GROUP BY event_type)
       |SELECT event_type, n_events, CAST(mean_e4 AS BIGINT) AS mean_e4,
       |  boot_lo_e4, boot_hi_e4,
       |  CAST(boot_hi_e4 - boot_lo_e4 AS BIGINT) AS boot_spread_e4
       |FROM full_mean JOIN ci USING (event_type)
       |ORDER BY event_type""".stripMargin
  }
}
