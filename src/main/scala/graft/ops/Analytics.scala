package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic warehouse-analytics query shapes (TPC-H Q5/Q10/Q14-like),
  * composed from the engine's join/agg surface — these exercise
  * multi-way fact⋈fact⋈dim-chain plans end-to-end, plus GROUPING SETS
  * through the SQL surface.
  *
  * Plan shapes at scale: facts shuffle once on the equi key,
  * aggregation is two-phase; GROUPING SETS expands after aggregation
  * input is reduced. Broadcast hints appear ONLY on fixed-cardinality
  * dims (nation = 25 rows, region = 5 rows, forever). customer /
  * supplier / part grow linearly with scale factor (customer ≈ 15 M
  * rows at sf100), and a hint is a mandate — a forced broadcast there
  * OOMs at 100× instead of degrading to a shuffle join. Those sides
  * are left unhinted so AQE picks broadcast when the runtime size
  * allows and sort-merge when it doesn't.
  */
object Analytics {

  private def ts(s: String) = to_timestamp(lit(s))

  /** Q5-shape: revenue by nation where customer and supplier share the
    * nation (two independent fact joins + a dim chain). */
  def localSupplierVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
    val l = Tables.lineitem(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  def localSupplierVolumeSql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Q10-shape: top returned-revenue customers in a quarter. */
  def returnedItemRanking(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1996-07-01 00:00:00"))
    val l = Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R")
    val n = Tables.nation(spark, sfDir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  def returnedItemRankingSql: String =
    """SELECT c_custkey, c_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Q14-shape: share of revenue from a part-type family in a window —
    * conditional aggregation over a broadcast join. */
  def promoRevenueShare(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1996-04-01 00:00:00"))
    val p = Tables.part(spark, sfDir)
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        round(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))), 2)
          .as("promo_revenue"),
        round(sum(rev), 2).as("total_revenue"),
        round(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) * 100.0 /
          sum(rev), 4).as("promo_pct"))
  }

  def promoRevenueShareSql: String =
    """SELECT
      |  round(sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2) AS promo_revenue,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
      |  round(sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) * 100.0 /
      |        sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin

  /** GROUPING SETS through the SQL surface (the engine registers the
    * lake tables as views; rollup/cube cover the DataFrame route). */
  def groupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |  coalesce(l_linestatus, '(all)') AS linestatus,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  count(*) AS n
        |FROM lineitem_v
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  def groupingSetsSql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
      |  coalesce(l_linestatus, '(all)') AS linestatus,
      |  round(sum(l_extendedprice), 2) AS sum_price,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY returnflag, linestatus""".stripMargin

  // --------------------------------------------------------------------
  // Distribution-drift monitor: PSI per event type
  // --------------------------------------------------------------------

  /** Population Stability Index per event type — the standard
    * ML-monitoring drift metric (PSI = Σ_b (p_b − q_b)·ln(p_b/q_b))
    * between the first and second half of the corpus window, over a
    * FIXED 10-bucket integer-cent grid (fixed buckets, not quantiles:
    * the grid must be identical across runs for drift to be
    * comparable). Add-one smoothing keeps empty buckets finite and the
    * smoothed shares summing to 1. `is_drifted` applies the
    * conventional PSI > 0.1 alert threshold.
    *
    * Exactness: bucket counts are exact ints over the CLOSED event-type
    * vocabulary × bucket grid (absent cells materialized as 0 — a
    * missing bucket must contribute its smoothing mass, not vanish);
    * each PSI term is one fixed double tree over four ints, rounded
    * once to e6; the per-type Σ is then exact BIGINT.
    *
    * Scale: two filtered aggs over the fact table (map-side combined),
    * then everything is |types|×|buckets| rows. The same shape
    * monitors any feature column at 100 TB — swap the bucket
    * expression. */
  def valueDrift(spark: SparkSession, sfDir: String,
      cutoff: String = "2024-01-16 00:00:00",
      nBuckets: Int = 10, bucketCents: Int = 5000): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"),
        least(floor(round(col("value") * 100) / lit(bucketCents)),
          lit(nBuckets - 1).cast("double")).cast("long").as("bucket"))
    val cut = lit(cutoff).cast("timestamp")
    def counts(pred: org.apache.spark.sql.Column, name: String): DataFrame =
      ev.filter(pred).groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as(name))
    val grid = Tables.eventTypes.toDF("event_type")
      .crossJoin((0 until nBuckets).map(_.toLong).toDF("bucket"))
    val joined = grid
      .join(counts(col("ts") < cut, "a"), Seq("event_type", "bucket"), "left")
      .join(counts(col("ts") >= cut, "b"), Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"),
        coalesce(col("a"), lit(0L)).as("a"), coalesce(col("b"), lit(0L)).as("b"))
    psiFromCounts(joined, nBuckets)
  }

  /** The PSI fold over a materialized (event_type, bucket, a, b) cell
    * grid — shared verbatim by the batch query and the streaming store
    * ([[graft.streaming.StreamDrift]]), so stream ≡ batch is the
    * identity of ONE code path, not two implementations agreeing. */
  def psiFromCounts(joined: DataFrame, nBuckets: Int): DataFrame = {
    val totals = joined.groupBy(col("event_type"))
      .agg(sum(col("a")).cast("long").as("n_ref"), sum(col("b")).cast("long").as("n_cur"))
    val pa = (col("a") + lit(1.0)) / (col("n_ref") + lit(nBuckets))
    val qb = (col("b") + lit(1.0)) / (col("n_cur") + lit(nBuckets))
    joined.join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        round((pa - qb) * log(pa / qb) * 1000000).cast("long").as("t_e6"))
      .groupBy(col("event_type"))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        sum(col("t_e6")).cast("long").as("psi_e6"))
      .withColumn("is_drifted", col("psi_e6") > 100000L)
      .orderBy(col("event_type"))
  }

  /** Oracle twin of [[valueDrift]] — grid via unnest of the closed
    * vocabulary, identical smoothing and term trees. */
  def valueDriftSql(cutoff: String = "2024-01-16 00:00:00",
      nBuckets: Int = 10, bucketCents: Int = 5000): String = {
    val types = graft.Tables.eventTypes.map(t => s"'$t'").mkString(", ")
    s"""WITH ev AS (
       |  SELECT event_type, ts,
       |    CAST(least(floor(round(value * 100) / $bucketCents),
       |      CAST(${nBuckets - 1} AS DOUBLE)) AS BIGINT) AS bucket
       |  FROM events),
       |grid AS (
       |  SELECT t.event_type, CAST(b AS BIGINT) AS bucket
       |  FROM (SELECT unnest([$types]) AS event_type) t
       |  CROSS JOIN range($nBuckets) r(b)),
       |ref AS (
       |  SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS a FROM ev
       |  WHERE ts < TIMESTAMP '$cutoff' GROUP BY event_type, bucket),
       |cur AS (
       |  SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS b FROM ev
       |  WHERE ts >= TIMESTAMP '$cutoff' GROUP BY event_type, bucket),
       |cells AS (
       |  SELECT g.event_type, g.bucket,
       |    coalesce(ref.a, 0) AS a, coalesce(cur.b, 0) AS b
       |  FROM grid g
       |  LEFT JOIN ref ON ref.event_type = g.event_type AND ref.bucket = g.bucket
       |  LEFT JOIN cur ON cur.event_type = g.event_type AND cur.bucket = g.bucket),
       |totals AS (
       |  SELECT event_type, CAST(sum(a) AS BIGINT) AS n_ref,
       |    CAST(sum(b) AS BIGINT) AS n_cur
       |  FROM cells GROUP BY event_type),
       |terms AS (
       |  SELECT c.event_type, t.n_ref, t.n_cur,
       |    CAST(round(((c.a + 1.0) / (t.n_ref + $nBuckets) - (c.b + 1.0) / (t.n_cur + $nBuckets))
       |      * ln(((c.a + 1.0) / (t.n_ref + $nBuckets)) / ((c.b + 1.0) / (t.n_cur + $nBuckets)))
       |      * 1000000) AS BIGINT) AS t_e6
       |  FROM cells c JOIN totals t USING (event_type))
       |SELECT event_type, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
       |  CAST(sum(t_e6) AS BIGINT) AS psi_e6,
       |  (CAST(sum(t_e6) AS BIGINT) > 100000) AS is_drifted
       |FROM terms
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
  }
}
