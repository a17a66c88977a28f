package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY.md §2.2): projection/filter, joins,
  * aggregation, sort/limit/top-k — each a named, oracle-checked query.
  *
  * Design rules (100 TB posture, SURVEY §4.3):
  *  - declarative DataFrame plans only → Catalyst pushes filters/prunes
  *    columns into the parquet scan; nothing materializes on the driver;
  *  - `broadcast(...)` hints only on FIXED-cardinality dims (nation,
  *    region); sf-scaling tables (customer/part/supplier) are left to
  *    AQE — a hint is a mandate and would OOM at 100×; fact⋈fact joins
  *    stay sort-merge + AQE;
  *  - every query ends in a deterministic ORDER BY on its *output*
  *    columns (rounded before ordering, unique tiebreaker) so the
  *    DuckDB-oracle hash compare is order-stable across engines.
  *
  * Reference semantics covered here: O6 projection, O11 conjunctive
  * filter + time-range predicate (`src/event_replayer/lambda_function
  * .py:15-41`) re-expressed relationally over the testdata tables.
  */
object Relational {

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** TPC-H Q1-shaped pricing summary: scan → filter (pushed down) →
    * hash agg (partial+final, automatic) → sort. The GROUP BY keys are
    * low-cardinality, so at 100 TB this is a map-side-combine-dominated
    * agg with a tiny shuffle. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= ts("2000-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-shaped forecast-revenue filter: the whole WHERE clause is
    * pushed into the parquet scan (PushedFilters); single-row result. */
  def revenueFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(
        col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00") &&
        col("l_discount").between(0.02, 0.06) &&
        col("l_quantity") < 24)
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  def revenueFilterSql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.06
      |  AND l_quantity < 24""".stripMargin

  /** Sort + limit (top-k): Spark's TakeOrderedAndProject — per-partition
    * top-k then driver merge of k·P rows, never a full sort at scale. */
  def topOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  def topOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q3-shaped shipping-priority: filtered customer dim joins
    * into orders, sort-merge orders⋈lineitem (both facts), agg, top-k.
    * At 100 TB: customer grows with sf (≈15 M rows at sf100), so it is
    * NOT hinted — AQE broadcasts the filtered side when the runtime
    * size allows and falls back to shuffle join when it doesn't; the
    * fact join shuffles on orderkey once; AQE coalesces. */
  def joinAggTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, sfDir).filter(col("o_orderdate") < ts("1999-03-15 00:00:00"))
    val li = Tables.lineitem(spark, sfDir).filter(col("l_shipdate") > ts("1996-03-15 00:00:00"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def joinAggTopKSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Top-1 per group WITHOUT a window: `max(struct(ordering, payload))`
    * aggregates the argmax in ONE partial-combining shuffle — at scale
    * this beats the ranked-window formulation, which must shuffle AND
    * sort every group's full row set just to keep one row. The
    * ordering struct carries the unique orderkey tiebreaker, so the
    * argmax is total and engine-deterministic.
    *
    * The ORACLE deliberately states the semantics through the window
    * formulation (`row_number = 1`) — two independent implementations
    * that must land on the same rows, re-proved green every run. */
  def argmaxOrder(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_custkey"))
      .agg(max(struct(col("cents"), col("o_orderkey"))).as("m"))
      .select(col("o_custkey"),
        col("m.o_orderkey").as("top_orderkey"),
        col("m.cents").as("top_cents"))
      .orderBy(col("o_custkey"))
  }

  def argmaxOrderSql: String =
    """SELECT o_custkey, o_orderkey AS top_orderkey, cents AS top_cents
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey DESC) AS rn
      |  FROM orders)
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin
}
