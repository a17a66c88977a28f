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
}
