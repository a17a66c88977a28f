package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers here as a named query over the
  * driver testdata plus (where SQL-expressible) a DuckDB oracle. Column
  * names are aliased identically on both sides; every query orders by
  * its own (rounded) output columns with a unique tiebreaker so the
  * hash compare is engine-order-independent.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q_revenue_filter" -> ((s, d) => Relational.revenueFilter(s, d)),
    "q_top_orders" -> ((s, d) => Relational.topOrders(s, d)),
    "q_join_agg_topk" -> ((s, d) => Relational.joinAggTopK(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_pricing_summary" -> Relational.pricingSummarySql,
    "q_revenue_filter" -> Relational.revenueFilterSql,
    "q_top_orders" -> Relational.topOrdersSql,
    "q_join_agg_topk" -> Relational.joinAggTopKSql,
  )
}
