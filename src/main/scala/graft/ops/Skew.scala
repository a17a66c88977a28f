package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §4.3) — the manual tool
  * for the hot-key joins AQE's skew handling can't fully rescue (e.g.
  * one key holding >10% of a 100 TB fact table).
  *
  * Shape: the skewed (big) side gets a deterministic salt in [0, n)
  * derived from a high-entropy payload column; the small side is
  * replicated n× with every salt value. The join key becomes
  * (key, salt), splitting each hot key's rows across n reducers.
  * Results are identical to the unsalted join (tested) — salting only
  * changes the partitioning.
  */
object Skew {

  /** Deterministic salt from an existing column (no rand(): results
    * stay reproducible and retry-stable — nondeterministic salts break
    * task retries at scale). */
  def saltColumn(entropy: Column, n: Int): Column =
    pmod(xxhash64(entropy), lit(n)).cast("int")

  /** Salted inner equi-join of a skewed `big` side with a `small`
    * side. `entropy` must be a big-side column with per-row variance
    * (an id, a timestamp). */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      entropy: String, n: Int): DataFrame = {
    val salted = big.withColumn("__salt", saltColumn(col(entropy), n))
    val replicated = small.withColumn("__salt",
      explode(array((0 until n).map(lit): _*)))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Salted two-phase aggregation over a pathologically low-cardinality
    * key: `events` has only 5 event types, so a plain `groupBy` funnels
    * the whole fact table through 5 reducers. The salt splits each key
    * across `n` partial groups (phase 1, map-side combinable), and
    * phase 2 merges the `5·n` partials — the classic hot-key
    * aggregation rewrite for a 100 TB fact table.
    *
    * Every aggregate is a count or an integer sum (`floor(value·10³)`),
    * so re-associating the addition across salt groups cannot change a
    * bit — which is exactly what the oracle checks: the DuckDB side is
    * the PLAIN single-phase `GROUP BY`, so a green run proves
    * salted ≡ unsalted. */
  def saltedEventStats(spark: SparkSession, sfDir: String, n: Int = 16): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_type"),
        saltColumn(col("event_id"), n).as("__salt"),
        floor(col("value") * 1000).cast("long").as("v_e3"))
    ev.groupBy(col("event_type"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(col("v_e3")).as("pv"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n_events"), sum(col("pv")).as("sum_value_e3"))
      .orderBy(col("event_type"))
  }

  def saltedEventStatsSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_e3
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** The skew PROFILE — the decision table the salting tools above
    * consume: per join/agg key, its row count, corpus share in ppm,
    * whether it is HOT for a `parallelism`-way shuffle (share above
    * one reducer's fair slice), and the salt factor that splits it
    * back under the fair slice (`⌈share · parallelism⌉`, min 1 —
    * [[saltedEventStats]]'s `n` read off the data instead of
    * guessed). On a 100 TB run this query is the cheap first pass
    * that decides which keys get salted joins and which ride the
    * plain hash partition; the share arithmetic is pure integer so
    * the verdict is engine-exact.
    *
    * Scale: ONE map-side-combined agg to key granularity (output =
    * key cardinality), a 1-row total broadcast back. */
  def skewProfile(spark: SparkSession, sfDir: String,
      parallelism: Int = 32): DataFrame = {
    val keyed = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val total = keyed.agg(sum(col("n")).as("n_total"))
    keyed.crossJoin(broadcast(total))
      .select(col("event_type"), col("n"),
        expr("n * 1000000 DIV n_total").as("share_ppm"))
      .withColumn("is_hot", col("share_ppm") * parallelism > lit(1000000L))
      .withColumn("salt",
        greatest(lit(1L), expr(s"(share_ppm * $parallelism + 999999) DIV 1000000")))
      .orderBy(col("event_type"))
  }

  /** Oracle twin of [[skewProfile]] — `parallelism` interpolated. */
  def skewProfileSql(parallelism: Int = 32): String =
    s"""WITH keyed AS (
       |  SELECT event_type, count(*) AS n FROM events GROUP BY event_type),
       |total AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM keyed)
       |SELECT event_type, n,
       |  CAST(n * 1000000 // n_total AS BIGINT) AS share_ppm,
       |  (CAST(n * 1000000 // n_total AS BIGINT) * $parallelism > 1000000) AS is_hot,
       |  greatest(1, CAST((CAST(n * 1000000 // n_total AS BIGINT) * $parallelism
       |    + 999999) // 1000000 AS BIGINT)) AS salt
       |FROM keyed CROSS JOIN total
       |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------
  // Join-size estimation without running the join
  // --------------------------------------------------------------------

  /** Join cardinality estimation — the optimizer-style sizing audit a
    * planner runs BEFORE committing to a join strategy: the size of
    * the `events ⋈ events ON user_id` self-join is Σ_u c(u)², computed
    * from the per-key COUNT table (one agg pass) without ever
    * materializing a single join row; the sampled variants estimate
    * the same quantity from a deterministic 1-in-m key sample scaled
    * ×m (the key-sample estimator — Σc² concentrates on heavy keys, so
    * key-sampling keeps its accuracy where row-sampling loses it).
    * One row per modulus m ∈ {1, 2, 5, 10}: sampled key count,
    * estimate, exact, and the signed error ppm. m = 1 IS the exact
    * computation (err 0 by construction — the self-check row).
    *
    * At 100 TB this table is the difference between knowing a join
    * would explode (Σc² ≫ n) before running it and discovering it as
    * a dead executor; the same count-table pass also feeds
    * [[skewProfile]]'s salting decision.
    *
    * Exactness: counts and Σc² are BIGINTs; each error pays one double
    * divide rounded to ppm. Scale: one groupBy(key) over the fact
    * table; everything after is |keys| × |moduli| rows collapsing to
    * |moduli|. */
  def joinCardEst(spark: SparkSession, sfDir: String,
      moduli: Seq[Int] = Seq(1, 2, 5, 10)): DataFrame = {
    val c = graft.Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val mods = {
      import spark.implicits._
      moduli.toDF("m").select(col("m").cast("long").as("m"))
    }
    val per = c.crossJoin(broadcast(mods))
      .filter(pmod(col("user_id"), col("m")) === lit(1) % col("m"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_keys_sampled"),
        (sum(col("c") * col("c")) * col("m").cast("long")).as("est_rows"))
      .select(col("m"), col("n_keys_sampled"), col("est_rows").cast("long").as("est_rows"))
    val exact = per.filter(col("m") === 1)
      .select(col("est_rows").as("exact_rows"))
    per.crossJoin(broadcast(exact))
      .select(col("m"), col("n_keys_sampled"), col("est_rows"), col("exact_rows"),
        round((col("est_rows") - col("exact_rows")) * lit(1000000.0) / col("exact_rows"))
          .cast("long").as("err_ppm"))
      .orderBy(col("m"))
  }

  /** Oracle twin of [[joinCardEst]] — moduli interpolated, identical
    * integer folds and the one ppm divide. */
  def joinCardEstSql(moduli: Seq[Int] = Seq(1, 2, 5, 10)): String = {
    val list = moduli.mkString(", ")
    s"""WITH c AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY user_id),
       |per AS (
       |  SELECT CAST(m AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS n_keys_sampled,
       |    CAST(sum(c * c) * m AS BIGINT) AS est_rows
       |  FROM c CROSS JOIN (SELECT unnest([$list]) AS m) mods
       |  WHERE user_id % m = 1 % m
       |  GROUP BY m),
       |ex AS (SELECT est_rows AS exact_rows FROM per WHERE m = 1)
       |SELECT m, n_keys_sampled, est_rows, exact_rows,
       |  CAST(round((est_rows - exact_rows) * 1000000.0 / exact_rows) AS BIGINT) AS err_ppm
       |FROM per CROSS JOIN ex
       |ORDER BY m""".stripMargin
  }
}
