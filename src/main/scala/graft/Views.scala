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
  * DataFrame.
  *
  * ONE SQL story: temp views here cover the ad-hoc corpus; the
  * COMMITTED lake is SQL-addressable through the DSv2 catalog
  * ([[graft.sql.GraftCatalog]] — `spark.sql.catalog.<name>` +
  * `.root`), which adds `VERSION/TIMESTAMP AS OF`, `DELETE`, the
  * evolution `ALTER`s, and the [[graft.sql.TableChanges]]
  * `table_changes(...)` TVF on top of the same manifest-log plans —
  * prefer it over [[registerLake]] snapshot views for anything beyond
  * a quick look. */
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

  /** Run verbatim-shared ANSI text through `spark.sql` over the
    * registered corpus views. */
  private def sql(spark: SparkSession, sfDir: String, text: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(text)
  }

  /** `q_sql_window`: window functions through SQL text — top-2 orders
    * per (sampled) customer by cents with the rank filter in an outer
    * query; the ANSI intersection runs verbatim on both engines. */
  val windowTopOrdersSql: String =
    """SELECT o_custkey, o_orderkey, cents, rk FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY round(o_totalprice * 100) DESC, o_orderkey) AS BIGINT) AS rk
      |  FROM orders) t
      |WHERE rk <= 2 AND o_custkey % 100 = 0
      |ORDER BY o_custkey, rk""".stripMargin

  def windowTopOrders(spark: SparkSession, sfDir: String): DataFrame =
    sql(spark, sfDir, windowTopOrdersSql)

  /** `q_sql_having`: aggregate subquery + HAVING through SQL text,
    * verbatim-shared. */
  val havingUrgentSql: String =
    """SELECT c.c_custkey, c.c_name, t.n_urgent
      |FROM customer c
      |JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_urgent
      |      FROM orders WHERE o_orderpriority = '1-URGENT'
      |      GROUP BY o_custkey HAVING count(*) >= 3) t
      |  ON t.o_custkey = c.c_custkey
      |ORDER BY c.c_custkey""".stripMargin

  def havingUrgent(spark: SparkSession, sfDir: String): DataFrame =
    sql(spark, sfDir, havingUrgentSql)

  /** `q_sql_cdc`: a REGISTERED NATIVE FUNCTION exercised through SQL
    * text — `fastcdc_chunks` ([[graft.functions.GraftExtensions]])
    * chunks each document inside `spark.sql`; the DuckDB oracle
    * replays the identical byte fold as the recursive CTE
    * ([[graft.ops.Dedup.cdcChunksCteSql]]), restricted to the same
    * doc set. Green means the SQL registry serves the same expression
    * the DataFrame surface uses. */
  val sqlCdcText: String =
    """SELECT doc_id,
      |  CAST(size(fastcdc_chunks(text)) AS BIGINT) AS n_chunks,
      |  CAST(aggregate(fastcdc_chunks(text), CAST(0 AS BIGINT),
      |    (a, c) -> a + c.len) AS BIGINT) AS total_len
      |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin

  def sqlCdc(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftExtensions.register(spark)
    sql(spark, sfDir, sqlCdcText)
  }

  def sqlCdcOracleSql: String =
    s"""WITH RECURSIVE ${graft.ops.Dedup.cdcChunksCteSql("doc_id < 20")}
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(len) AS BIGINT) AS total_len
       |FROM chunks GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** `q_sql_simhash`: the native SimHash fingerprint through SQL text
    * (`simhash_fields(split(text,' '), 1)`), oracle-replayed by the
    * declarative md5 bit-sum SQL. */
  val sqlSimhashText: String =
    """SELECT doc_id,
      |  element_at(simhash_fields(split(text, ' '), 1), 1) AS simhash
      |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin

  def sqlSimhash(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftExtensions.register(spark)
    sql(spark, sfDir, sqlSimhashText)
  }

  /** `q_sql_recursive`: a RECURSIVE CTE through SQL text, verbatim on
    * both engines (Spark 4's `UnionLoop` execution vs DuckDB's native
    * recursion) — the calendar-spine pattern: the spine months are
    * generated by integer recursion (84 rows, driver-bounded), the
    * orders aggregate is computed ONCE corpus-side, and the LEFT JOIN
    * zero-fills empty months — the monthly report no calendar table
    * exists for. Kept to the ANSI intersection: integer recursion (no
    * dialect-specific INTERVAL arithmetic), `make_date`, float `/`
    * rounded through CAST on non-negatives only. */
  val recursiveSpineSql: String =
    """WITH RECURSIVE months(m) AS (
      |  SELECT 0
      |  UNION ALL
      |  SELECT m + 1 FROM months WHERE m < 83
      |),
      |agg AS (
      |  SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS m,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1
      |)
      |SELECT make_date(1995 + CAST((m - (m % 12)) / 12 AS INT), (m % 12) + 1, 1) AS month_start,
      |  CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
      |  CAST(COALESCE(cents, 0) AS BIGINT) AS cents
      |FROM months LEFT JOIN agg USING (m)
      |ORDER BY month_start""".stripMargin

  def recursiveSpine(spark: SparkSession, sfDir: String): DataFrame =
    sql(spark, sfDir, recursiveSpineSql)

  def sqlSimhashOracleSql: String = {
    val h = "(('0x' || substr(md5(token), 1, 4))::BIGINT)"
    val bitSums = (0 until 16).map(j => s"sum((($h >> $j) & 1) * 2 - 1) AS s$j").mkString(", ")
    val simhash = (0 until 16).map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |  FROM documents WHERE doc_id < 50),
       |sums AS (SELECT doc_id, $bitSums FROM toks GROUP BY doc_id)
       |SELECT doc_id, CAST($simhash AS BIGINT) AS simhash
       |FROM sums ORDER BY doc_id""".stripMargin
  }
}
