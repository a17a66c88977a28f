package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text front-end: every corpus table (and the lake's queryable
  * surfaces) registered as SQL views, so `spark.sql("SELECT …")` is a
  * first-class user surface next to the Scala query functions — with
  * [[graft.functions.GraftExtensions]] supplying the engine's native
  * functions to the same SQL namespace. The reference has no query
  * language at all (its whole query surface is the replayer's
  * hand-built range scan, `/root/reference/src/event_replayer/
  * lambda_function.py:15-41`); this goes past parity: the SAME ANSI
  * SQL text runs verbatim on this engine and on the DuckDB oracle,
  * which is exactly how [[SparkEntry]] gates it.
  *
  * Scale: views are lazy plans over the parquet scans — registration
  * costs nothing; Catalyst prunes/pushes through them like any
  * DataFrame. */
object Views {

  /** Register the full test corpus as temp views under their bare
    * table names (`events` through [[Events.events]] so its NANOS
    * timestamps arrive usable). Idempotent. */
  def register(spark: SparkSession, sfDir: String): Unit = {
    Tables.names.filterNot(_ == "events")
      .foreach(n => Tables.table(spark, sfDir, n).createOrReplaceTempView(n))
    Events.events(spark, sfDir).createOrReplaceTempView("events")
  }

  /** Register the lake's queryable surfaces: the catalog table and the
    * committed distribution view of one source. */
  def registerLake(spark: SparkSession, layout: graft.lake.Layout,
      sources: Seq[String] = Seq.empty): Unit = {
    graft.lake.Catalog.load(spark, layout).createOrReplaceTempView("lake_catalog")
    sources.foreach { s =>
      graft.lake.Distribution.subscribeSnapshot(spark, layout, s)
        .createOrReplaceTempView(s"dist_$s")
    }
  }

  /** The demonstration text: a three-table TPC-H-style join that runs
    * VERBATIM on both engines (kept to the ANSI intersection; exact
    * integer cents via round). */
  val nationOrdersSql: String =
    """SELECT n.n_name AS nation, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders o
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |GROUP BY n.n_name
      |ORDER BY n.n_name""".stripMargin

  /** `q_sql_text`: the SQL-surface gate — register the views, run the
    * text through `spark.sql`. The oracle runs the IDENTICAL string. */
  def nationOrders(spark: SparkSession, sfDir: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(nationOrdersSql)
  }
}
