package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join surface (SURVEY.md §2.2 "Joins"): broadcast-hash, sort-merge,
  * semi, anti. The reference has no joins at all — this is the engine
  * surface mandated by the north star.
  *
  * Scale notes per query are in each Scaladoc; the common rules:
  * only FIXED-cardinality dims (`nation` 25 rows, `region` 5 rows)
  * carry explicit `broadcast` hints — a hint is a mandate, and
  * `customer`/`supplier`/`part` grow linearly with scale factor, so
  * their join strategy is left to AQE (broadcast when the runtime
  * size allows, shuffle join when not); fact⋈fact
  * (`lineitem`⋈`orders`) shuffles on the join key once and relies on
  * AQE for skew splitting.
  */
object Joins {

  /** Fact⋈dim join: lineitem⋈part on partkey, revenue by brand.
    * `part` grows with sf (≈20 M rows at sf100) so it is not hinted —
    * AQE broadcasts it at small scale (no lineitem shuffle; the agg
    * shuffle is 25 rows) and degrades to a shuffle join at 100×
    * instead of OOMing on a mandated broadcast. */
  def brandRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))
  }

  def brandRevenueSql: String =
    """SELECT p_brand,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** Sort-merge join fact⋈fact: lineitem⋈orders, priority stats.
    * Both sides shuffle on orderkey; at 100 TB this is the canonical
    * SMJ + AQE-coalesced plan (bucketing both tables on orderkey would
    * remove the shuffle entirely — documented, not needed here). */
  def priorityStats(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  def priorityStatsSql: String =
    """SELECT o_orderpriority,
      |  count(*) AS n_lines,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(sum(l_extendedprice), 2) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Left-semi join (EXISTS): orders that contain at least one
    * high-quantity line. Semi joins stream the probe side and never
    * duplicate rows — the right side is reduced to its join keys. */
  def ordersWithBigLines(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).filter(col("l_quantity") >= 48)
    Tables.orders(spark, sfDir)
      .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_total"))
      .orderBy(col("o_orderpriority"))
  }

  def ordersWithBigLinesSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS sum_total
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    Tables.customer(spark, sfDir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  def customersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Multi-way dim chain with two broadcasts: customer⋈nation⋈region,
    * account balance stats per region. Dims chain-broadcast; the only
    * shuffle is the 5-row final agg. */
  def regionBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("sum_bal"),
        round(avg(col("c_acctbal")), 4).as("avg_bal"))
      .orderBy(col("r_name"))
  }

  def regionBalanceSql: String =
    """SELECT r_name, count(*) AS n_customers,
      |  round(sum(c_acctbal), 2) AS sum_bal,
      |  round(avg(c_acctbal), 4) AS avg_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  /** CDC upsert (MERGE INTO semantics) expressed relationally — the
    * lakehouse write path as a query, and the surface's one FULL OUTER
    * join. Target: customers whose key is not ≡0 mod 3 (simulating a
    * dimension table that predates some customers). Changes: each
    * customer's order spend. MERGE rules: matched rows ADD the spend to
    * the balance (update), change-only keys INSERT with the spend as
    * opening balance, target-only keys KEEP unchanged — every row is
    * labeled with the op that produced it, so the oracle re-proves the
    * merge routing row-by-row, not just the final numbers.
    *
    * Money is integer cents end-to-end (both inputs carry exactly 2
    * decimals), so update arithmetic is exact on both engines.
    *
    * Scale: FULL OUTER preserves both sides, so no broadcast is legal —
    * this is the one join kind that MUST hash-shuffle both inputs on
    * the key; AQE can still pick the partition count. A real MERGE
    * additionally rewrites only the files whose keys changed — that
    * file-pruning layer lives with the table format, not the join. */
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val target = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").as("key"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val changes = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("key"))
      .agg(round(sum(round(col("o_totalprice") * 100))).cast("long").as("spend_cents"))
    target.join(changes, Seq("key"), "full_outer")
      .select(col("key"),
        (coalesce(col("bal_cents"), lit(0L)) + coalesce(col("spend_cents"), lit(0L)))
          .as("new_bal_cents"),
        when(col("bal_cents").isNull, "insert")
          .when(col("spend_cents").isNull, "keep")
          .otherwise("update").as("op"))
      .orderBy(col("key"))
  }

  def mergeUpsertSql: String =
    """WITH target AS (
      |  SELECT c_custkey AS key,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      |  FROM customer WHERE c_custkey % 3 <> 0),
      |changes AS (
      |  SELECT o_custkey AS key,
      |    CAST(round(sum(round(o_totalprice * 100))) AS BIGINT) AS spend_cents
      |  FROM orders GROUP BY o_custkey)
      |SELECT COALESCE(t.key, c.key) AS key,
      |  COALESCE(t.bal_cents, 0) + COALESCE(c.spend_cents, 0) AS new_bal_cents,
      |  CASE WHEN t.key IS NULL THEN 'insert'
      |       WHEN c.key IS NULL THEN 'keep'
      |       ELSE 'update' END AS op
      |FROM target t FULL OUTER JOIN changes c ON t.key = c.key
      |ORDER BY key""".stripMargin

  /** TPC-H Q8-shaped national market share: inside one region's
    * customer market, each supplier nation's share of yearly revenue.
    * The 6-table join tree is the benchmark's canonical star-chain —
    * lineitem⋈orders drives, customer⋈nation⋈region restricts the
    * market, supplier⋈nation labels the seller.
    *
    * Revenue is integer cents (per-row round of the discounted price —
    * letter-identical in both engines — then exact BIGINT sums); share
    * is integer ppm via truncating DIV against a per-year total from a
    * window over the GROUPED (year × nation, bounded-cardinality)
    * frame — never over row-level data.
    *
    * Scale: fixed-cardinality dims (nation, region) carry explicit
    * broadcast hints; supplier and customer SCALE with sf, so their
    * joins get no hint (a hint is a mandate — OOM at 100×; the
    * repo-wide PlanAuditSpec hint audit enforces this) and AQE picks
    * broadcast at runtime when a side happens to be small. The grouped
    * frame is years × nations ≈ hundreds of rows; its window is cheap
    * everywhere. */
  def marketShare(spark: SparkSession, sfDir: String,
      regionName: String = "ASIA"): DataFrame = {
    val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
      .cast("long")
    val mktCust = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir).filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val supNation = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val grouped = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(mktCust, col("o_custkey") === col("c_custkey"))
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"), col("supp_nation"))
      .agg(sum(cents).as("nation_cents"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_year"))
    grouped
      .withColumn("year_cents", sum(col("nation_cents")).over(w))
      .withColumn("share_ppm", expr("(nation_cents * 1000000) DIV year_cents"))
      .orderBy(col("o_year"), col("supp_nation"))
  }

  /** Oracle twin of [[marketShare]] — region interpolated so a
    * non-default call cannot silently break parity. */
  def marketShareSql(regionName: String = "ASIA"): String =
    s"""WITH grouped AS (
       |  SELECT year(o_orderdate) AS o_year, n2.n_name AS supp_nation,
       |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
       |      AS nation_cents
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = '$regionName'
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |  GROUP BY 1, 2)
       |SELECT o_year, supp_nation, nation_cents,
       |  CAST(sum(nation_cents) OVER (PARTITION BY o_year) AS BIGINT) AS year_cents,
       |  CAST((nation_cents * 1000000)
       |       // CAST(sum(nation_cents) OVER (PARTITION BY o_year) AS BIGINT) AS BIGINT)
       |    AS share_ppm
       |FROM grouped
       |ORDER BY o_year, supp_nation""".stripMargin
}
