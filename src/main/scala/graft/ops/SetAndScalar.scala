package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations + scalar-function surface (SURVEY.md §2.2 "Set ops"
  * and "Scalar functions"). All Catalyst-native; set ops shuffle on the
  * full row (distinct semantics) — at scale prefer key-only projections
  * before the set op, as done here.
  */
object SetAndScalar {

  /** UNION (distinct) of two customer-key sets: buyers of urgent orders
    * ∪ BUILDING-segment customers. */
  def unionCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))
    val building = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    urgent.union(building).distinct().orderBy(col("custkey"))
  }

  def unionCustomersSql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION
      |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |ORDER BY custkey""".stripMargin

  /** INTERSECT: customers who bought in both 1995 and 2000. */
  def intersectCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val y95 = ord.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("custkey"))
    val y00 = ord.filter(year(col("o_orderdate")) === 2000).select(col("o_custkey").as("custkey"))
    y95.intersect(y00).orderBy(col("custkey"))
  }

  def intersectCustomersSql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
      |INTERSECT
      |SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 2000
      |ORDER BY custkey""".stripMargin

  /** EXCEPT: parts never shipped. */
  def exceptParts(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir).select(col("p_partkey").as("partkey"))
    val shipped = Tables.lineitem(spark, sfDir).select(col("l_partkey").as("partkey"))
    p.except(shipped).orderBy(col("partkey"))
  }

  def exceptPartsSql: String =
    """SELECT p_partkey AS partkey FROM part
      |EXCEPT
      |SELECT l_partkey AS partkey FROM lineitem
      |ORDER BY partkey""".stripMargin

  /** Column profiling (data-quality surface for pipeline tables): per
    * column — null count, distinct count, min/max as strings. The
    * union-of-aggs shape profiles k columns in k cheap passes; a
    * single-pass variant would pivot, but per-column scans let
    * Catalyst prune to exactly one column each. */
  def profileOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    def arm(c: String): DataFrame =
      ord.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .map(arm).reduce(_ union _)
      .orderBy(col("column_name"))
  }

  def profileOrdersSql: String = {
    def arm(c: String) =
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
         |FROM orders""".stripMargin
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .map(arm).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** Date arithmetic + array aggregation: per-priority shipping delay
    * (datediff over the order⋈lineitem join) and the sorted distinct
    * status set as a csv string. (Month-difference is deliberately
    * absent: Spark's months_between is fractional while DuckDB's
    * date_diff('month') counts boundary crossings — no portable
    * semantics.) */
  def shipDelays(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), col("o_orderstatus"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("delay_days"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(avg(col("delay_days")), 4).as("avg_delay_days"),
        max(col("delay_days")).as("max_delay_days"),
        concat_ws(",", array_sort(collect_set(col("o_orderstatus")))).as("statuses"))
      .orderBy(col("o_orderpriority"))
  }

  def shipDelaysSql: String =
    """SELECT o_orderpriority,
      |  count(*) AS n_lines,
      |  round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_delay_days,
      |  CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_delay_days,
      |  array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Edit-distance matrix over the priority vocabulary — levenshtein
    * parity (both engines implement classic Wagner–Fischer). */
  def editDistances(spark: SparkSession, sfDir: String): DataFrame = {
    val prios = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("p")).distinct()
    prios.crossJoin(prios.select(col("p").as("q")))
      .select(col("p"), col("q"),
        levenshtein(col("p"), col("q")).cast("long").as("edit_dist"))
      .orderBy(col("p"), col("q"))
  }

  def editDistancesSql: String =
    """SELECT a.p, b.q, CAST(levenshtein(a.p, b.q) AS BIGINT) AS edit_dist
      |FROM (SELECT DISTINCT o_orderpriority AS p FROM orders) a
      |CROSS JOIN (SELECT DISTINCT o_orderpriority AS q FROM orders) b
      |ORDER BY p, q""".stripMargin

  /** Scalar-function sampler over orders: string (upper/substr/concat/
    * length), date (year/month/date_trunc), math (round/abs/mod),
    * conditional (CASE). One row per order, fully deterministic. */
  def scalarFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    ord.select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 1, 3)).as("prio3"),
        concat(col("o_orderstatus"), lit("_"), col("o_orderpriority")).as("status_prio"),
        length(col("o_orderpriority")).cast("long").as("prio_len"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"),
        date_trunc("month", col("o_orderdate")).as("order_month_start"),
        round(col("o_totalprice") / 1000.0, 1).as("total_k"),
        abs(col("o_totalprice") - 100000.0).as("dist_100k"),
        (col("o_orderkey") % 7).as("key_mod7"),
        when(col("o_totalprice") > 150000, "big")
          .when(col("o_totalprice") > 50000, "mid")
          .otherwise("small").as("bucket"))
      .orderBy(col("o_orderkey"))
  }

  def scalarFuncsSql: String =
    """SELECT o_orderkey,
      |  upper(substring(o_orderpriority, 1, 3)) AS prio3,
      |  o_orderstatus || '_' || o_orderpriority AS status_prio,
      |  CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
      |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
      |  CAST(month(o_orderdate) AS BIGINT) AS order_month,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
      |  round(o_totalprice / 1000.0, 1) AS total_k,
      |  abs(o_totalprice - 100000.0) AS dist_100k,
      |  o_orderkey % 7 AS key_mod7,
      |  CASE WHEN o_totalprice > 150000 THEN 'big'
      |       WHEN o_totalprice > 50000 THEN 'mid'
      |       ELSE 'small' END AS bucket
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Array-function surface: per-order line aggregation into arrays,
    * consumed through SCALAR derivations only — the driver's checker
    * cannot sort/hash ARRAY output columns (the q_agg_quantiles
    * lesson), so the arrays are exercised (collect → sort → join/
    * element access/reduction) but emitted as strings and numbers.
    * collect_list order is nondeterministic under parallelism; every
    * consumer sorts first, so the output is partition-layout-proof. */
  def arrayFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_orderkey") % 500 === 0)
      .groupBy(col("l_orderkey"))
      .agg(collect_list(col("l_linenumber").cast("long")).as("lines"),
        collect_list(col("l_quantity").cast("double")).as("qtys"))
      .select(col("l_orderkey"),
        size(col("lines")).cast("long").as("n_lines"),
        array_join(sort_array(col("lines")), ",").as("line_csv"),
        element_at(sort_array(col("lines")), 1).as("first_line"),
        element_at(sort_array(col("lines"), asc = false), 1).as("last_line"),
        (round(array_max(col("qtys")), 2) + lit(0.0)).as("max_qty"),
        // scaled-integer sum: a double fold over collect_list's
        // nondeterministic order is the non-associative-FP trap the
        // oracle gate exists to catch — integer addition commutes
        aggregate(col("qtys"), lit(0L), (a, x) => a + round(x * 100).cast("long"))
          .as("sum_qty_c2"))
      .orderBy(col("l_orderkey"))
  }

  def arrayFuncsSql: String =
    """SELECT l_orderkey,
      |  CAST(len(lines) AS BIGINT) AS n_lines,
      |  array_to_string(list_sort(lines), ',') AS line_csv,
      |  list_sort(lines)[1] AS first_line,
      |  list_reverse_sort(lines)[1] AS last_line,
      |  round(list_max(qtys), 2) + 0.0 AS max_qty,
      |  CAST(list_sum(list_transform(qtys, x -> CAST(round(x * 100) AS BIGINT))) AS BIGINT) AS sum_qty_c2
      |FROM (
      |  SELECT l_orderkey,
      |    list(CAST(l_linenumber AS BIGINT)) AS lines,
      |    list(CAST(l_quantity AS DOUBLE)) AS qtys
      |  FROM lineitem
      |  WHERE l_orderkey % 500 = 0
      |  GROUP BY l_orderkey)
      |ORDER BY l_orderkey""".stripMargin

  /** Fuzzy string JOIN (edit distance ≤ 2) over the part-name
    * dictionary — entity-resolution's core primitive, built the way it
    * scales: (1) dedupe the corpus to its DISTINCT strings first (the
    * dictionary is orders of magnitude smaller than the fact table —
    * 64 names under 20k parts here), (2) block candidates by length
    * band so the verify never goes n²: one side registers at band
    * `len DIV 3`, the other explodes into its ±1 neighbor bands, and an
    * EQUI join on band meets every pair with |len diff| ≤ 2 — a
    * necessary condition for distance ≤ 2 (each edit changes length by
    * at most 1) — while same-band duplicates are impossible because
    * each pair shares exactly one (band_a, offset) combination, (3)
    * levenshtein-verify only the blocked candidates.
    *
    * Per-name part counts ride along so the result ranks pairs by how
    * much data a dictionary merge would coalesce. */
  def fuzzyNamePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val names = Tables.part(spark, sfDir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
    val band = expr("CAST(length(p_name) AS BIGINT) DIV 3")
    val a = names
      .select(col("p_name").as("name_a"), col("n_parts").as("parts_a"),
        band.as("band"))
    val b = names
      .select(col("p_name").as("name_b"), col("n_parts").as("parts_b"),
        explode(sequence(band - 1, band + 1)).as("band"))
    a.join(b, Seq("band"))
      .filter(col("name_a") < col("name_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= 2)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("edit_dist"),
        (col("parts_a") + col("parts_b")).as("n_parts"))
      .filter(col("edit_dist") <= 2 && col("edit_dist") > 0)
      .distinct()
      .orderBy(col("edit_dist"), col("name_a"), col("name_b"))
  }

  /** Entity-resolution CONSOLIDATION (the golden record): the step
    * after [[fuzzyNamePairs]] finds match candidates — connected
    * components over the match graph, then survivorship: each
    * multi-member cluster elects its canonical member (most data
    * behind it: max part count, ties to the lexicographically
    * smallest name) and reports the mass a merge would coalesce. The
    * MDM/dedupe-consolidation operator every customer-data pipeline
    * runs after blocking+matching.
    *
    * Scale: the match graph lives over the DISTINCT-name dictionary
    * (an aggregate of the fact table — orders of magnitude smaller),
    * so components run as driver union-find under the same loud
    * [[Dedup.maxCollectedEdges]]-style guard as
    * [[Dedup.nearDupClusters]]; the cluster map broadcasts back and
    * survivorship is one hash agg with a min-struct argmax (no window
    * over the corpus). The oracle computes components as a recursive
    * min-reachable-label CTE, so a green run re-proves the union-find
    * against declarative transitive closure. */
  def goldenRecord(spark: SparkSession, sfDir: String): DataFrame =
    goldenRecord(spark, sfDir, Dedup.maxCollectedEdges)

  /** Cap-injectable form (tests pin the loud over-cap failure without
    * a corpus that big). The guard COUNTS first — a distributed 1-row
    * aggregate — and only then collects, so an over-cap match graph
    * fails loud without ever materializing on the driver (collect-
    * then-require would OOM the driver before the error fired). */
  private[ops] def goldenRecord(spark: SparkSession, sfDir: String,
      maxEdges: Long): DataFrame = {
    val pairs = fuzzyNamePairs(spark, sfDir)
      .select(col("name_a"), col("name_b"))
    val nEdges = pairs.count()
    require(nEdges <= maxEdges,
      s"golden record: $nEdges match edges exceed the driver guard " +
        s"($maxEdges) — route through the distributed component path")
    val edges = pairs.collect()
      .map(r => (r.getString(0), r.getString(1)))
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra)
        parent(hi) = lo
      }
    }
    import spark.implicits._
    val reps = spark.createDataset(parent.keys.toSeq.sorted.map(n => (n, find(n))))
      .toDF("p_name", "rep")
    val names = Tables.part(spark, sfDir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
    names.join(broadcast(reps), Seq("p_name"))
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("n_parts")).cast("long").as("n_parts_total"),
        min(struct((-col("n_parts")).as("neg"), col("p_name").as("nm"))).as("c"))
      .filter(col("n_members") >= 2)
      .select(col("c.nm").as("canonical_name"), col("n_members"),
        col("n_parts_total"), (-col("c.neg")).cast("long").as("canonical_parts"))
      .orderBy(col("canonical_name"))
  }

  /** Oracle twin of [[goldenRecord]] — components as a recursive
    * min-reachable-label closure (the [[Dedup.nearDupClustersSql]]
    * pattern over the fuzzy match graph). */
  def goldenRecordSql: String =
    """WITH RECURSIVE names AS (
      |  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts FROM part GROUP BY p_name),
      |a AS (
      |  SELECT p_name AS name_a, CAST(len(p_name) AS BIGINT) // 3 AS band FROM names),
      |b AS (
      |  SELECT p_name AS name_b, CAST(len(p_name) AS BIGINT) // 3 + d.d AS band
      |  FROM names CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) d),
      |pairs AS (
      |  SELECT DISTINCT name_a, name_b
      |  FROM a JOIN b USING (band)
      |  WHERE name_a < name_b
      |    AND abs(len(name_a) - len(name_b)) <= 2
      |    AND levenshtein(name_a, name_b) BETWEEN 1 AND 2),
      |edges AS (
      |  SELECT name_a AS src, name_b AS dst FROM pairs
      |  UNION ALL SELECT name_b, name_a FROM pairs),
      |reach(name, label) AS (
      |  SELECT DISTINCT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.name),
      |comp AS (SELECT name, min(label) AS rep FROM reach GROUP BY name),
      |members AS (
      |  SELECT c.rep, n.p_name, n.n_parts
      |  FROM comp c JOIN names n ON n.p_name = c.name),
      |surv AS (
      |  SELECT rep, CAST(count(*) AS BIGINT) AS n_members,
      |    CAST(sum(n_parts) AS BIGINT) AS n_parts_total
      |  FROM members GROUP BY rep),
      |canon AS (
      |  SELECT rep, p_name AS canonical_name, n_parts AS canonical_parts,
      |    row_number() OVER (PARTITION BY rep ORDER BY n_parts DESC, p_name) AS rk
      |  FROM members)
      |SELECT canonical_name, n_members, n_parts_total,
      |  CAST(canonical_parts AS BIGINT) AS canonical_parts
      |FROM surv JOIN canon USING (rep)
      |WHERE rk = 1 AND n_members >= 2
      |ORDER BY canonical_name""".stripMargin

  def fuzzyNamePairsSql: String =
    """WITH names AS (
      |  SELECT p_name, count(*) AS n_parts FROM part GROUP BY p_name),
      |a AS (
      |  SELECT p_name AS name_a, n_parts AS parts_a,
      |    CAST(len(p_name) AS BIGINT) // 3 AS band
      |  FROM names),
      |b AS (
      |  SELECT p_name AS name_b, n_parts AS parts_b,
      |    CAST(len(p_name) AS BIGINT) // 3 + d.d AS band
      |  FROM names CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) d)
      |SELECT DISTINCT name_a, name_b,
      |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist,
      |  parts_a + parts_b AS n_parts
      |FROM a JOIN b USING (band)
      |WHERE name_a < name_b
      |  AND abs(len(name_a) - len(name_b)) <= 2
      |  AND levenshtein(name_a, name_b) BETWEEN 1 AND 2
      |ORDER BY edit_dist, name_a, name_b""".stripMargin
}
