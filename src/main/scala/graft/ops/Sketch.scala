package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frequency-sketch surface: Count-Min heavy hitters (Cormode &
  * Muthukrishnan 2005). The reference has no sketches at all; this is
  * engine-surface depth for the 100 TB regime, where "how often does
  * each key occur" must be answerable in O(d·w) memory instead of one
  * counter per distinct key.
  *
  * The sketch here is DETERMINISTIC and engine-portable: row `i`'s hash
  * is the first 32 md5 bits of `"i:key"` taken modulo the width — the
  * same md5-prefix arithmetic the MinHash scheme pins across Spark,
  * DuckDB and the JVM ([[graft.functions.MinHashScheme]]), so the
  * oracle can rebuild the identical sketch cell-for-cell in SQL and the
  * gate hash-compares ESTIMATES, not just exact counts.
  */
object Sketch {

  /** Depth (independent hash rows) and width (buckets per row). */
  val Depth = 3
  val Width = 1024

  /** CMS bucket of `key` under hash row `i`: first 32 md5 bits of
    * `"i:key"`, mod width. Non-negative, so `%` agrees across engines. */
  private[graft] def bucketOf(i: Int, key: Column): Column = bucket(i, key)

  private def bucket(i: Int, key: Column): Column =
    (conv(substring(md5(concat_ws(":", lit(i), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % Width).as(s"b$i")

  /** Top-10 heaviest lineitem part keys with their EXACT count and the
    * count-min ESTIMATE read back from the sketch, plus the estimate's
    * overcount (≥ 0 by construction — CMS never undercounts).
    *
    * Build: one scan of lineitem explodes each row into `Depth`
    * `(row_no, bucket)` cells and hash-aggregates into the d×w = 3×1024
    * cell table — fixed size regardless of input rows, with map-side
    * partial aggregation collapsing the fan-out before the shuffle (the
    * entire point of a mergeable sketch: partition sketches add).
    * Probe: only the 10 candidate keys re-hash and equi-join the cell
    * table (model-sized, broadcast), then take min over rows.
    *
    * At 100 TB the exact-count side of this query is itself a fine
    * two-phase agg; it is kept because the gate then verifies the
    * sketch's overcount row-by-row instead of trusting it. */
  /** The d×w cell table of a key frame: one generator pass exploding
    * each key into its `Depth` (row, bucket) cells, then a fixed-size
    * hash agg. Cell tables are a MONOID (cell-wise sum merges two
    * sketches), which is what makes the sketch shard across partitions,
    * batches, and streams — [[graft.streaming.StreamSketch]] merges
    * per-micro-batch cell tables produced by this same function. */
  def cellsOf(keys: DataFrame, key: Column): DataFrame =
    keys
      .select(explode(array((0 until Depth).map(i =>
        struct(lit(i).as("row_no"), bucket(i, key).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.row_no").as("row_no"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  def cmsHeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(col("l_partkey"))
    // build the sketch from the per-KEY counts, not the raw rows: a
    // CMS cell is Σ count over keys hashing into it, so regrouping the
    // (key, count) table is algebraically identical while the md5 work
    // drops from rows×depth (18M at sf0.1) to distinctKeys×depth —
    // and the key-counts exchange is shared with the exact-top branch
    // (ReuseExchange), so lineitem is scanned once
    val keyCounts = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("exact"))
    val cells = keyCounts
      .select(col("exact"),
        explode(array((0 until Depth).map(i =>
          struct(lit(i).as("row_no"), bucket(i, col("l_partkey")).as("bucket"))): _*)).as("p"))
      .groupBy(col("p.row_no").as("row_no"), col("p.bucket").as("bucket"))
      .agg(sum(col("exact")).as("cnt"))
    val top = keyCounts
      .orderBy(col("exact").desc, col("l_partkey"))
      .limit(10)
    val probes = top
      .select(col("l_partkey"), col("exact"),
        explode(array((0 until Depth).map(i =>
          struct(lit(i).as("row_no"), bucket(i, col("l_partkey")).as("bucket"))): _*)).as("p"))
      .select(col("l_partkey"), col("exact"),
        col("p.row_no").as("row_no"), col("p.bucket").as("bucket"))
    probes.join(cells, Seq("row_no", "bucket"))
      .groupBy(col("l_partkey"), col("exact"))
      .agg(min(col("cnt")).as("est"))
      .select(col("l_partkey"), col("exact"), col("est"),
        (col("est") - col("exact")).as("overcount"))
      .orderBy(col("exact").desc, col("l_partkey"))
  }

  /** Bloom filter bit size and hash count for [[bloomSemiJoin]]. */
  val BloomBits = 65536
  val BloomK = 3

  /** Bloom bit position of `key` under hash `i` — same md5-prefix
    * arithmetic as the CMS rows, different modulus. */
  private def bloomPos(i: Int, key: Column): Column =
    conv(substring(md5(concat_ws(":", lit(i), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % BloomBits

  /** Bloom-filter pre-join: audit of the build-side filter every
    * distributed engine pushes into big probe scans (Spark's own
    * runtime bloom pushdown included). The "hot set" is the orders
    * with a lineitem shipped in March 1995; its Bloom filter — modeled
    * RELATIONALLY as the distinct table of set bit positions, so the
    * oracle rebuilds the identical filter — is probed by every order
    * (`all k positions present` ⇔ `hits = k`), and the exact semi-join
    * then splits passers into members vs false positives, per order
    * priority. A green row certifies both bloom properties on this
    * data: no member is missed, and the false-positive count is
    * exactly what these hash bits produce.
    *
    * Scale: the bit table is bounded by BloomBits REGARDLESS of input
    * size — the broadcast hint is safe at any sf (the entire point of
    * blooming a join); the probe side never shuffles for the filter,
    * only for its final fixed-cardinality agg. */
  def bloomSemiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val hot = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1995-03-01") && col("l_shipdate") < lit("1995-04-01"))
      .select(col("l_orderkey")).distinct()
    val bits = hot
      .select(explode(array((0 until BloomK).map(i =>
        bloomPos(i, col("l_orderkey"))): _*)).as("pos"))
      .distinct()
    val orders = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderpriority"))
    val hits = orders
      .select(col("o_orderkey"),
        explode(array((0 until BloomK).map(i =>
          bloomPos(i, col("o_orderkey"))): _*)).as("pos"))
      .join(broadcast(bits), Seq("pos"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("hits"))
    orders
      .join(hits, Seq("o_orderkey"), "left")
      .join(hot.select(col("l_orderkey").as("o_orderkey"), lit(1L).as("member")),
        Seq("o_orderkey"), "left")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("hits") === BloomK, 1L).otherwise(0L)).as("pass_bloom"),
        sum(coalesce(col("member"), lit(0L))).as("members"),
        sum(when(col("hits") === BloomK && col("member").isNull, 1L).otherwise(0L))
          .as("false_pos"))
      .orderBy(col("o_orderpriority"))
  }

  def bloomSemiJoinSql: String = {
    def posSql(i: String, key: String): String =
      s"(('0x' || substr(md5($i::VARCHAR || ':' || $key::VARCHAR), 1, 8))::BIGINT % 65536)"
    s"""WITH ks_cte AS (SELECT unnest([0, 1, 2]) AS i),
       |hot AS (
       |  SELECT DISTINCT l_orderkey FROM lineitem
       |  WHERE l_shipdate >= '1995-03-01' AND l_shipdate < '1995-04-01'),
       |bits AS (
       |  SELECT DISTINCT ${posSql("k.i", "hot.l_orderkey")} AS pos
       |  FROM hot CROSS JOIN ks_cte k),
       |hits AS (
       |  SELECT o_orderkey, count(*) AS hits
       |  FROM (SELECT o.o_orderkey, ${posSql("k.i", "o.o_orderkey")} AS pos
       |        FROM orders o CROSS JOIN ks_cte k) p
       |  JOIN bits USING (pos)
       |  GROUP BY o_orderkey)
       |SELECT o.o_orderpriority, count(*) AS n_orders,
       |  CAST(sum(CASE WHEN h.hits = 3 THEN 1 ELSE 0 END) AS BIGINT) AS pass_bloom,
       |  CAST(sum(CASE WHEN m.l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS members,
       |  CAST(sum(CASE WHEN h.hits = 3 AND m.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS false_pos
       |FROM orders o
       |LEFT JOIN hits h ON h.o_orderkey = o.o_orderkey
       |LEFT JOIN hot m ON m.l_orderkey = o.o_orderkey
       |GROUP BY o.o_orderpriority
       |ORDER BY o.o_orderpriority""".stripMargin
  }

  def cmsHeavyHittersSql: String = {
    def bucketSql(i: String, key: String): String =
      s"(('0x' || substr(md5($i::VARCHAR || ':' || $key::VARCHAR), 1, 8))::BIGINT % 1024)"
    s"""WITH rows_cte AS (SELECT unnest([0, 1, 2]) AS row_no),
       |cells AS (
       |  SELECT r.row_no, ${bucketSql("r.row_no", "l_partkey")} AS bucket,
       |    count(*) AS cnt
       |  FROM lineitem CROSS JOIN rows_cte r
       |  GROUP BY 1, 2),
       |top AS (
       |  SELECT l_partkey, count(*) AS exact
       |  FROM lineitem GROUP BY l_partkey
       |  ORDER BY exact DESC, l_partkey LIMIT 10),
       |est AS (
       |  SELECT t.l_partkey, min(c.cnt) AS est
       |  FROM top t CROSS JOIN rows_cte r
       |  JOIN cells c ON c.row_no = r.row_no
       |   AND c.bucket = ${bucketSql("r.row_no", "t.l_partkey")}
       |  GROUP BY t.l_partkey)
       |SELECT t.l_partkey, CAST(t.exact AS BIGINT) AS exact,
       |  CAST(e.est AS BIGINT) AS est,
       |  CAST(e.est - t.exact AS BIGINT) AS overcount
       |FROM top t JOIN est e ON e.l_partkey = t.l_partkey
       |ORDER BY exact DESC, t.l_partkey""".stripMargin
  }

  // --------------------------------------------------------------------
  // KMV (k-minimum-values) distinct-count sketch
  // --------------------------------------------------------------------

  /** Sketch size for [[kmvDistinct]]: the k smallest hash values are
    * retained per group; relative error ~ 1/sqrt(k-2) ≈ 13%. */
  val KmvK = 64

  /** KMV distinct-count sketch per orders priority class, verified
    * against the exact distinct count it estimates. A group's sketch is
    * its `k` SMALLEST 32-bit key hashes; the estimator is the classic
    * `(k-1) · 2³² / h₍ₖ₎` (k−1 uniform points below the k-th order
    * statistic), with the standard exact fallback when a group holds
    * fewer than `k` distinct hashes. Everything is integer arithmetic
    * on non-negative operands (hashes are BIGINT in [0, 2³²); one
    * integer division), so the estimate — not just the machinery — is
    * bit-identical across engines, which is what the oracle pins.
    *
    * Why KMV next to the CMS/bloom/HLL surface: it is the MERGEABLE
    * distinct sketch whose merge is trivially expressible relationally
    * — union two sketches, keep the k smallest — so partition sketches
    * combine associatively exactly like the CMS cell monoid. At 100 TB
    * the per-partition top-k runs map-side (k rows per partition cross
    * the wire, not the key set); here the same math is expressed as
    * distinct-hash + ranked window per group, whose shuffle carries
    * only (group, hash) pairs. The exact count alongside is itself a
    * sound two-phase distinct agg, kept so every green run certifies
    * the estimator's error instead of trusting it. */
  def kmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val k = KmvK
    val h = conv(substring(md5(col("o_custkey").cast("string")), 1, 8), 16, 10).cast("long")
    val hashes = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("grp"), h.as("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("h"))
    val sketch = hashes
      .withColumn("rn", row_number().over(w))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_hashes"),
        max(when(col("rn") === k, col("h"))).as("kth"))
    val exact = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    sketch.join(exact, Seq("grp"))
      .select(col("grp"), col("n_exact"),
        when(col("n_hashes") < k, col("n_hashes"))
          .otherwise(expr(s"(${k - 1} * 4294967296) DIV kth")).as("kmv_est"))
      .withColumn("err_bp",
        expr("(abs(kmv_est - n_exact) * 10000) DIV n_exact"))
      .orderBy(col("grp"))
  }

  def kmvDistinctSql: String = {
    val k = KmvK
    s"""WITH hashes AS (
       |  SELECT DISTINCT o_orderpriority AS grp,
       |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS h
       |  FROM orders),
       |ranked AS (
       |  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
       |  FROM hashes),
       |sk AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS n_hashes,
       |    max(CASE WHEN rn = $k THEN h END) AS kth
       |  FROM ranked GROUP BY grp),
       |ex AS (
       |  SELECT o_orderpriority AS grp,
       |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
       |  FROM orders GROUP BY o_orderpriority),
       |est AS (
       |  SELECT grp, n_exact,
       |    CAST(CASE WHEN n_hashes < $k THEN n_hashes
       |              ELSE (${k - 1} * 4294967296) // kth END AS BIGINT) AS kmv_est
       |  FROM sk JOIN ex USING (grp))
       |SELECT grp, n_exact, kmv_est,
       |  CAST((abs(kmv_est - n_exact) * 10000) // n_exact AS BIGINT) AS err_bp
       |FROM est
       |ORDER BY grp""".stripMargin
  }

  /** KMV SET ALGEBRA (Beyer et al., "On Synopses for Distinct-Value
    * Estimation Under Multiset Operations", SIGMOD 2007) — the reason
    * KMV beats HLL in a pipeline: sketches support union AND
    * intersection. For every event-type pair (A, B) over the per-type
    * distinct-user sets: merge the two k-min sketches (k smallest of
    * S_A ∪ S_B) → union estimate `(k−1)·2³²/h₍ₖ₎`; K_∩ = merged
    * hashes present in BOTH input sketches → intersection estimate
    * `K_∩/k · est_union` and Jaccard `K_∩/k` — the audience-overlap /
    * co-occurrence table ("how many users did A and B?") computed from
    * 64-row synopses instead of a corpus self-join. Exact companions
    * sit alongside so every green run certifies the estimator error.
    * Under k distinct hashes the sketches are complete and all three
    * estimates fall back to exact sketch-set arithmetic.
    *
    * Scale: ONE corpus-wide (type, user-hash) distinct; sketch rows
    * are ≤ types·k, so all pair joins are model-sized. The exact
    * intersection is one equi-join keyed on the user (each user
    * carries ≤ |types| rows). Every estimator term is integer (hash
    * order statistics, one integer division per estimate), so the
    * ESTIMATES hash-match across engines, not just the machinery. */
  def kmvSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val k = KmvK
    // ONE corpus pass: the distinct (type, user) table feeds the
    // sketches (hashed on the distinct pairs, not on every event row),
    // the exact sizes, and the exact intersection — committed as a
    // CORPUS-KEYED shared artifact (the buildIncrementalProbe pattern,
    // round 12) so a fresh JVM's first consumer pays one metadata read
    // instead of the family build; within a JVM it also serves every
    // reference without re-scanning events
    val duDir = s"${Artifacts.sharedRoot}/kmv_du/k=${
      Artifacts.tableKey(spark, sfDir, Seq("events"))}"
    Artifacts.commit(spark, duDir) { tmp =>
      // bounded repartition, NOT coalesce(1): the distinct is
      // types×users-sized, and coalesce would collapse its final
      // stage to one task at larger corpora (review catch)
      Tables.events(spark, sfDir)
        .select(col("event_type").as("t"), col("user_id").as("u"))
        .distinct().repartition(8)
        .write.mode("overwrite").parquet(tmp)
    }
    val du = spark.read.parquet(duDir)
    val h = conv(substring(md5(col("u").cast("string")), 1, 8), 16, 10).cast("long")
    // hashed-distinct table feeds the sketch AND the type list;
    // the k-minimum sketch feeds FOUR consumers (both merge sides,
    // both membership joins): truncate each once or the md5+distinct
    // and the per-type rank window re-execute per consumer (r14:
    // 6 recomputations → 2 passes, measured)
    val hashes = Truncate(du.select(col("t"), h.as("h")).distinct(), "kmv-hashes", big = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("t")).orderBy(col("h"))
    val sk = Truncate(hashes.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select(col("t"), col("h")), "kmv-sk")
    val types = hashes.select(col("t")).distinct()
    val pairs = types.select(col("t").as("ta"))
      .join(types.select(col("t").as("tb")), col("ta") < col("tb"))
    val merged = pairs.join(sk, col("ta") === col("t")).select(col("ta"), col("tb"), col("h"))
      .unionByName(
        pairs.join(sk, col("tb") === col("t")).select(col("ta"), col("tb"), col("h")))
      .distinct()
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ta"), col("tb")).orderBy(col("h"))
    val m = merged.withColumn("rn", row_number().over(wu)).filter(col("rn") <= k)
    val agg = m
      .join(sk.select(col("t").as("ta"), col("h"), lit(1).as("in_a")), Seq("ta", "h"), "left")
      .join(sk.select(col("t").as("tb"), col("h"), lit(1).as("in_b")), Seq("tb", "h"), "left")
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("m_cnt"),
        max(when(col("rn") === k, col("h"))).as("kth"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L)).as("k_inter"))
    val sizes = du.groupBy(col("t")).agg(count(lit(1)).as("n"))
    // NOTE (r15): a collect_set-per-user + combination-explode rewrite
    // (one exchange fewer on paper) measured slower — the per-user set
    // aggregate falls back to sort-based aggregation at corpus user
    // counts and the array lambdas evaluate outside codegen. The equi
    // self-join on the user key stays.
    val eInter = du.select(col("t").as("ta"), col("u"))
      .join(du.select(col("t").as("tb"), col("u")), Seq("u"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_inter"))
    agg
      .join(sizes.select(col("t").as("ta"), col("n").as("n_a")), Seq("ta"))
      .join(sizes.select(col("t").as("tb"), col("n").as("n_b")), Seq("tb"))
      .join(eInter, Seq("ta", "tb"), "left")
      .na.fill(0L, Seq("n_inter"))
      .withColumn("n_union", expr("n_a + n_b - n_inter"))
      .withColumn("kmv_union",
        when(col("m_cnt") < k, col("m_cnt"))
          .otherwise(expr(s"(${k - 1} * 4294967296) DIV kth")))
      .withColumn("kmv_inter",
        when(col("m_cnt") < k, col("k_inter"))
          .otherwise(expr(s"(k_inter * kmv_union) DIV $k")))
      .withColumn("union_err_bp", expr("(abs(kmv_union - n_union) * 10000) DIV n_union"))
      .withColumn("jac_ppm", expr("(n_inter * 1000000) DIV n_union"))
      .withColumn("kmv_jac_ppm",
        when(col("m_cnt") < k, expr("(k_inter * 1000000) DIV m_cnt"))
          .otherwise(expr(s"(k_inter * 1000000) DIV $k")))
      .select(col("ta"), col("tb"), col("n_union"), col("kmv_union").cast("long"),
        col("union_err_bp").cast("long"), col("n_inter"),
        col("kmv_inter").cast("long"), col("jac_ppm").cast("long"),
        col("kmv_jac_ppm").cast("long"))
      .orderBy(col("ta"), col("tb"))
  }

  def kmvSetOpsSql: String = {
    val k = KmvK
    s"""WITH du AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
       |hashes AS (
       |  SELECT DISTINCT t,
       |    ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 8))::BIGINT AS h
       |  FROM du),
       |sk AS (
       |  SELECT t, h FROM (
       |    SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn
       |    FROM hashes) WHERE rn <= $k),
       |types AS (SELECT DISTINCT t FROM hashes),
       |pairs AS (
       |  SELECT a.t AS ta, b.t AS tb FROM types a JOIN types b ON a.t < b.t),
       |merged AS (
       |  SELECT DISTINCT ta, tb, h FROM (
       |    SELECT p.ta, p.tb, s.h FROM pairs p JOIN sk s ON s.t = p.ta
       |    UNION ALL
       |    SELECT p.ta, p.tb, s.h FROM pairs p JOIN sk s ON s.t = p.tb)),
       |m AS (
       |  SELECT ta, tb, h, rn FROM (
       |    SELECT ta, tb, h,
       |      row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
       |    FROM merged) WHERE rn <= $k),
       |agg AS (
       |  SELECT m.ta, m.tb, CAST(count(*) AS BIGINT) AS m_cnt,
       |    max(CASE WHEN m.rn = $k THEN m.h END) AS kth,
       |    CAST(sum(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS k_inter
       |  FROM m
       |  LEFT JOIN sk sa ON sa.t = m.ta AND sa.h = m.h
       |  LEFT JOIN sk sb ON sb.t = m.tb AND sb.h = m.h
       |  GROUP BY m.ta, m.tb),
       |sizes AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM du GROUP BY t),
       |einter AS (
       |  SELECT a.t AS ta, b.t AS tb, CAST(count(*) AS BIGINT) AS n_inter
       |  FROM du a JOIN du b ON a.u = b.u AND a.t < b.t
       |  GROUP BY 1, 2),
       |est AS (
       |  SELECT g.ta, g.tb, g.m_cnt, g.k_inter,
       |    sa.n + sb.n - COALESCE(e.n_inter, 0) AS n_union,
       |    COALESCE(e.n_inter, 0) AS n_inter,
       |    CASE WHEN g.m_cnt < $k THEN g.m_cnt
       |         ELSE (${k - 1} * 4294967296) // g.kth END AS kmv_union
       |  FROM agg g
       |  JOIN sizes sa ON sa.t = g.ta
       |  JOIN sizes sb ON sb.t = g.tb
       |  LEFT JOIN einter e ON e.ta = g.ta AND e.tb = g.tb)
       |SELECT ta, tb, n_union, CAST(kmv_union AS BIGINT) AS kmv_union,
       |  CAST((abs(kmv_union - n_union) * 10000) // n_union AS BIGINT) AS union_err_bp,
       |  n_inter,
       |  CAST(CASE WHEN m_cnt < $k THEN k_inter
       |       ELSE (k_inter * kmv_union) // $k END AS BIGINT) AS kmv_inter,
       |  CAST((n_inter * 1000000) // n_union AS BIGINT) AS jac_ppm,
       |  CAST(CASE WHEN m_cnt < $k THEN (k_inter * 1000000) // m_cnt
       |       ELSE (k_inter * 1000000) // $k END AS BIGINT) AS kmv_jac_ppm
       |FROM est
       |ORDER BY ta, tb""".stripMargin
  }

  // --------------------------------------------------------------------
  // MinHash signature-width accuracy audit
  // --------------------------------------------------------------------

  /** Wide-signature mix constants, deterministically generated and
    * interpolated LITERALLY into the oracle SQL — the same universal-
    * hash family as [[graft.functions.MinHashScheme]] (a·h + b mod P),
    * bounded so a·h + b never overflows a long: a, b < P ≈ 2^31 and
    * h < 2^32 keep the product ≤ ~9.22e18 < Long.MaxValue (the bound
    * the 4-hash scheme already relies on). */
  private val AccP: Long = graft.functions.MinHashScheme.P
  private def accA(i: Int): Long = {
    val a = (1103515245L * (i + 1) + 12345L) % AccP
    if (a == 0L) 1L else a
  }
  private def accB(i: Int): Long = (987654321L * (i + 1) + 555555555L) % AccP

  /** The sketch-width engineering table: for every CONFIRMED near-dup
    * candidate pair (the shared pair table — so `jaccard` is the exact
    * token-set truth), the k-hash MinHash signature agreement and its
    * error against that truth, in integer ppm. E[matches/k] = J, so
    * this is how a pipeline picks its signature width: run once, read
    * the error column, know what k buys at YOUR similarity threshold
    * (64 halves the standard error of k = 16, at 4× the bytes).
    *
    * Scale: the signature build is the minhash family's explode ×k
    * with map-side partial min-agg (corpus-token-linear, one
    * doc_id-keyed shuffle); the audit join is pair-table-sized × k.
    */
  def minhashAccuracy(spark: SparkSession, sfDir: String,
      k: Int = 64): DataFrame = {
    val pairs = Dedup.nearDupPairTable(spark, sfDir)
    // only pair PARTICIPANTS need signatures — the pair table is tiny
    // relative to the corpus, so the semi-join prunes the heavy
    // explode+agg to the audited docs (output identical)
    val participants = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val toks = Tables.documents(spark, sfDir)
      .join(broadcast(participants), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("t"))
      .select(col("doc_id"),
        conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long").as("h"))
    // ONE pass, k min-aggs over the already-hashed token stream — the
    // k-explode alternative shuffles k× the token rows for the same
    // result (measured 29 s → this shape at 10×); h is a materialized
    // column, so the k expressions share it instead of re-tokenizing
    val minCols = (0 until k).map(i =>
      min((lit(accA(i)) * col("h") + lit(accB(i))) % lit(AccP)).as(s"m$i"))
    val wide = toks.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    val sigs = wide.select(col("doc_id"),
        explode(array((0 until k).map(i =>
          struct(lit(i.toLong).as("k"), col(s"m$i").as("mv"))): _*)).as("s"))
      .select(col("doc_id"), col("s.k"), col("s.mv"))
    val sa = sigs.select(col("doc_id").as("doc_a"), col("k"), col("mv").as("va"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("k"), col("mv").as("vb"))
    pairs
      .join(sa, Seq("doc_a"))
      .join(sb, Seq("doc_b", "k"))
      .groupBy(col("doc_a"), col("doc_b"), col("jaccard"))
      .agg(sum(when(col("va") === col("vb"), 1L).otherwise(0L)).as("matches"))
      .select(col("doc_a"), col("doc_b"), col("matches"),
        expr(s"(matches * 1000000) DIV $k").as("est_ppm"),
        round(col("jaccard") * 1000000).cast("long").as("true_ppm"))
      .withColumn("abs_err_ppm", abs(col("est_ppm") - col("true_ppm")))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Oracle twin of [[minhashAccuracy]] — the pair derivation is
    * [[Dedup.lshNearDupPairsSql]] verbatim (the same truth the engine
    * probes); the k mix constants interpolate literally. */
  def minhashAccuracySql(k: Int = 64): String = {
    val values = (0 until k)
      .map(i => s"(${i}, ${accA(i)}, ${accB(i)})").mkString(", ")
    s"""WITH pairsj AS (
       |${Dedup.lshNearDupPairsSql}
       |), hs AS (
       |  SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h
       |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
       |        FROM documents)
       |), mix(k, a, b) AS (
       |  VALUES $values
       |), sigs AS (
       |  SELECT doc_id, k, min((a * h + b) % $AccP) AS mv
       |  FROM hs CROSS JOIN mix
       |  GROUP BY doc_id, k
       |)
       |SELECT p.doc_a, p.doc_b,
       |  CAST(sum(CASE WHEN sa.mv = sb.mv THEN 1 ELSE 0 END) AS BIGINT) AS matches,
       |  CAST(CAST(sum(CASE WHEN sa.mv = sb.mv THEN 1 ELSE 0 END) AS BIGINT)
       |       * 1000000 // $k AS BIGINT) AS est_ppm,
       |  CAST(round(p.jaccard * 1000000) AS BIGINT) AS true_ppm,
       |  CAST(abs(CAST(CAST(sum(CASE WHEN sa.mv = sb.mv THEN 1 ELSE 0 END) AS BIGINT)
       |       * 1000000 // $k AS BIGINT)
       |       - CAST(round(p.jaccard * 1000000) AS BIGINT)) AS BIGINT) AS abs_err_ppm
       |FROM pairsj p
       |JOIN sigs sa ON p.doc_a = sa.doc_id
       |JOIN sigs sb ON p.doc_b = sb.doc_id AND sa.k = sb.k
       |GROUP BY p.doc_a, p.doc_b, p.jaccard
       |ORDER BY doc_a, doc_b""".stripMargin
  }
}
