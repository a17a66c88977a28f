package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-selection and corpus-report operators: the measurements a
  * curation run uses to DECIDE what to keep, after the filters
  * (`Text`, `Dedup`) have said what is keepable — importance weighting
  * against a target domain, exact budget apportionment, weighted
  * medians for length policy, and diversity/entropy health metrics.
  *
  * The reference (`fernandogoncalves-me/serverless-datalake`) has no
  * analytics surface (SURVEY.md §2.2); this file is part of the
  * mandated north-star extension set.
  *
  * Every query keeps the repo's oracle discipline: integer-exact
  * arithmetic wherever a fold could be order-dependent, `ln` only via
  * the round-to-tenth-milli-nats pattern proven by `q_tfidf` /
  * `q_lm_score`, identical column aliases on both sides, and a total
  * output order with a unique tiebreaker.
  */
object Selection {

  private def wsTokens: Column = size(split(col("text"), " ")).cast("long")

  /** md5-derived bucket in [0, buckets) — the engine half of the
    * cross-engine hash trick (`('0x'||substr(md5(x),1,8))::BIGINT` in
    * DuckDB). 32 bits of md5 so the value fits a long exactly. */
  private def md5Bucket(c: Column, buckets: Int): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long") % lit(buckets.toLong)

  // --------------------------------------------------------------------
  // DSIR-style importance weights (target-domain selection)
  // --------------------------------------------------------------------

  /** Importance weight of every document against a TARGET domain, the
    * hashed-n-gram importance-resampling scheme (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * unigram features hash into `buckets` counts, target and raw
    * (everything else) bucket distributions are Laplace-smoothed, and a
    * document's weight is the sum over its token occurrences of the
    * per-bucket log-likelihood ratio ln p_target(b) − ln p_raw(b). A
    * positive weight reads "more target-like than background"; sampling
    * proportional to exp(weight) recovers the target distribution from
    * the raw pool.
    *
    * The per-bucket ratio is rounded ONCE to integer tenth-milli-nats
    * (the `q_lm_score` discipline), so every downstream sum is an exact
    * BIGINT fold — no FP accumulation can diverge between engines.
    *
    * Output is the per-source selection report: doc counts, total /
    * min / max weight, and how many docs score target-like (> 0).
    * The target source tops the PER-TOKEN mean weight (its own tokens
    * trained the numerator) — pinned by SelectionSpec alongside a full
    * JVM replay of the integer-nats arithmetic.
    *
    * Scale: one token explode feeding (a) a `buckets`-row count table
    * (map-side combine, broadcast back) and (b) a doc_id-keyed weight
    * sum — one corpus-wide shuffle on doc_id plus a #sources-row agg.
    * The model (the llr table) is buckets-sized at ANY corpus size.
    */
  /** TRAIN half of the DSIR scheme: the buckets-row log-likelihood-
    * ratio model from a labeled corpus — build once (batch), apply
    * anywhere ([[dsirDocWeights]]), including inside a streaming
    * intake gate (model broadcast per micro-batch; see
    * StreamIntakeSpec's gate test). */
  def dsirLlrTable(docs: DataFrame, target: String,
      buckets: Int = 512): DataFrame = {
    val tok = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .select(col("source"), md5Bucket(col("tok"), buckets).as("b"))
    val seen = tok.groupBy(col("b"))
      .agg(sum(when(col("source") === target, 1L).otherwise(0L)).as("c_t"),
        sum(when(col("source") =!= target, 1L).otherwise(0L)).as("c_r"))
    // DENSE model: a bucket no training token hashed to still carries
    // its Laplace-smoothed score (counts 0) — an applied frame whose
    // tokens land in unseen buckets must get the smoothed background
    // ratio, not silently drop out of the sum (the streaming-gate
    // apply path scores out-of-vocabulary content wrong otherwise;
    // in-corpus weights are unchanged because a training doc's own
    // buckets are by definition seen)
    val counts = docs.sparkSession.range(buckets).select(col("id").as("b"))
      .join(seen, Seq("b"), "left")
      .select(col("b"), coalesce(col("c_t"), lit(0L)).as("c_t"),
        coalesce(col("c_r"), lit(0L)).as("c_r"))
    val tots = counts.agg(sum(col("c_t")).as("tt"), sum(col("c_r")).as("tr"))
    counts.crossJoin(broadcast(tots))
      .select(col("b"),
        round((log((col("c_t") + lit(1.0)) / (col("tt") + lit(buckets))) -
          log((col("c_r") + lit(1.0)) / (col("tr") + lit(buckets)))) * 10000)
          .cast("long").as("llr_tmn"))
  }

  /** APPLY half: per-doc weight of any (doc_id, text) frame under a
    * trained llr model — exact integer sum of the model's rounded
    * per-bucket scores (the model is DENSE, so every token scores).
    * Docs with no tokens (NULL text) yield no rows. `carryCols` ride
    * along through the aggregate (grouping keys — doc_id is unique,
    * so e.g. `source` adds no groups and saves the caller a
    * corpus-wide join-back). */
  def dsirDocWeights(docs: DataFrame, llr: DataFrame,
      buckets: Int = 512, carryCols: Seq[String] = Nil): DataFrame = {
    val keys = ("doc_id" +: carryCols).map(col)
    docs.select(keys :+ explode(split(col("text"), " ")).as("tok"): _*)
      .select(keys :+ md5Bucket(col("tok"), buckets).as("b"): _*)
      .join(broadcast(llr), Seq("b"))
      .groupBy(keys: _*)
      .agg(sum(col("llr_tmn")).as("w_tmn"))
  }

  def dsirWeights(spark: SparkSession, sfDir: String,
      target: String = "src0", buckets: Int = 512): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val llr = dsirLlrTable(docs, target, buckets)
    dsirDocWeights(docs, llr, buckets, carryCols = Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w_tmn")).as("sum_w_tmn"),
        min(col("w_tmn")).as("min_w_tmn"),
        max(col("w_tmn")).as("max_w_tmn"),
        sum(when(col("w_tmn") > 0, 1L).otherwise(0L)).as("n_target_like"))
      .orderBy(col("source"))
  }

  /** Oracle twin of [[dsirWeights]] — `target`/`buckets` interpolated
    * so a non-default call cannot silently break parity. */
  def dsirWeightsSql(target: String = "src0", buckets: Int = 512): String =
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % $buckets AS b
       |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
       |        FROM documents)
       |), counts AS (
       |  SELECT b,
       |    CAST(sum(CASE WHEN source = '$target' THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
       |    CAST(sum(CASE WHEN source <> '$target' THEN 1 ELSE 0 END) AS BIGINT) AS c_r
       |  FROM tok GROUP BY b
       |), tots AS (
       |  SELECT CAST(sum(c_t) AS BIGINT) AS tt, CAST(sum(c_r) AS BIGINT) AS tr
       |  FROM counts
       |), llr AS (
       |  SELECT b,
       |    CAST(round((ln((c_t + 1.0) / (tt + $buckets)) -
       |                ln((c_r + 1.0) / (tr + $buckets))) * 10000) AS BIGINT) AS llr_tmn
       |  FROM counts CROSS JOIN tots
       |), docw AS (
       |  SELECT doc_id, source, CAST(sum(llr_tmn) AS BIGINT) AS w_tmn
       |  FROM tok JOIN llr USING (b)
       |  GROUP BY doc_id, source
       |)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(w_tmn) AS BIGINT) AS sum_w_tmn,
       |  min(w_tmn) AS min_w_tmn,
       |  max(w_tmn) AS max_w_tmn,
       |  CAST(sum(CASE WHEN w_tmn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_target_like
       |FROM docw
       |GROUP BY source
       |ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // Largest-remainder budget apportionment
  // --------------------------------------------------------------------

  /** Apportions a fixed sample budget across sources proportionally to
    * token mass with the largest-remainder (Hamilton) method: each
    * source gets `floor(budget·src/total)` base slots, and the slots
    * truncation left over go to the largest fractional remainders (ties
    * to source asc). Unlike per-source rounding, Σ quota == budget
    * EXACTLY — the property a fixed fine-tuning budget or eval-suite
    * size needs (pinned by SelectionSpec). The remainder comparison is
    * `budget·src % total` — pure integer, no FP rate anywhere.
    * Product bound: `budget · src_tokens` must fit a long — fine to
    * ~9e18/budget tokens per source (a 100 TB corpus is ~2.5e13);
    * past that Spark's ANSI overflow throws LOUDLY rather than
    * silently diverging from DuckDB's HUGEINT promotion.
    *
    * Scale: the doc scan collapses to a #sources-row frame before any
    * window runs; the unpartitioned windows see only that model-sized
    * frame (single-task by design, #sources rows at ANY corpus size).
    */
  /** Largest-remainder (Hamilton) apportionment of `budget` slots over
    * a model-sized (source, w) weight frame: base = floor share, the
    * truncation leftover goes to the largest integer remainders (ties
    * to source asc). Shared by [[proportionalAlloc]] (w = token mass)
    * and [[temperatureMix]] (w = token mass^α). */
  private def hamilton(weights: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = weights.agg(sum(col("w")).as("total"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRem = Window.orderBy(col("rem").desc, col("source"))
    weights.crossJoin(broadcast(tot))
      .withColumn("base_quota", expr(s"($budget * w) DIV total"))
      .withColumn("rem", expr(s"($budget * w) % total"))
      .withColumn("leftover", lit(budget) - sum(col("base_quota")).over(wAll))
      .withColumn("extra",
        when(row_number().over(wRem) <= col("leftover"), 1L).otherwise(0L))
      .withColumn("quota", col("base_quota") + col("extra"))
  }

  def proportionalAlloc(spark: SparkSession, sfDir: String,
      budget: Long = 1000): DataFrame = {
    val bySrc = Tables.documents(spark, sfDir)
      .select(col("source"), wsTokens.as("n_tokens"))
      .groupBy(col("source")).agg(sum(col("n_tokens")).as("src_tokens"))
    hamilton(bySrc.withColumn("w", col("src_tokens")), budget)
      .select(col("source"), col("src_tokens"), col("base_quota"),
        col("extra"), col("quota"))
      .orderBy(col("source"))
  }

  /** Oracle twin of [[proportionalAlloc]] — `budget` interpolated. */
  def proportionalAllocSql(budget: Long = 1000): String =
    s"""WITH by_src AS (
       |  SELECT source,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
       |  FROM documents GROUP BY source
       |), tot AS (
       |  SELECT CAST(sum(src_tokens) AS BIGINT) AS total FROM by_src
       |), alloc AS (
       |  SELECT source, src_tokens,
       |    CAST($budget * src_tokens // total AS BIGINT) AS base_quota,
       |    CAST($budget * src_tokens % total AS BIGINT) AS rem,
       |    CAST($budget - sum($budget * src_tokens // total) OVER () AS BIGINT) AS leftover
       |  FROM by_src CROSS JOIN tot
       |)
       |SELECT source, src_tokens, base_quota,
       |  CAST(CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <= leftover
       |       THEN 1 ELSE 0 END AS BIGINT) AS extra,
       |  CAST(base_quota + CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <= leftover
       |       THEN 1 ELSE 0 END AS BIGINT) AS quota
       |FROM alloc
       |ORDER BY source""".stripMargin

  /** Temperature-flattened mixture allocation: slots ∝ (token mass)^α
    * with α < 1 — the standard multilingual/multi-domain rebalance
    * (α ≈ 0.7 in the mT5/XLM-R lineage): big sources are damped, small
    * sources boosted, without the hard uniform cap of [[sourceMix]].
    * Weights are `pow` doubles rounded ONCE to 1e4-scaled integers
    * (the `q_lm_score` discipline — the only FP step, absorbed by
    * rounding); the apportionment itself is the exact-integer Hamilton
    * scheme, so Σ quota == budget still holds exactly. Product bound:
    * `budget · w` with w ≈ tokens^α·1e4 — a 100 TB source (w ≈ 2.4e13)
    * overflows a long only past budget ≈ 4e5; Spark ANSI throws loudly
    * there, it cannot silently diverge.
    *
    * Scale: identical to [[proportionalAlloc]] — one partial-agg scan
    * to the #sources frame; everything after is model-sized.
    */
  def temperatureMix(spark: SparkSession, sfDir: String,
      budget: Long = 1000, alpha: Double = 0.7): DataFrame = {
    val bySrc = Tables.documents(spark, sfDir)
      .select(col("source"), wsTokens.as("n_tokens"))
      .groupBy(col("source")).agg(sum(col("n_tokens")).as("src_tokens"))
    hamilton(bySrc.withColumn("w",
        round(pow(col("src_tokens").cast("double"), alpha) * 10000).cast("long")),
      budget)
      .select(col("source"), col("src_tokens"), col("w").as("weight_tmn"),
        col("quota"))
      .orderBy(col("source"))
  }

  /** Oracle twin of [[temperatureMix]] — `budget`/`alpha`
    * interpolated. */
  def temperatureMixSql(budget: Long = 1000, alpha: Double = 0.7): String =
    s"""WITH by_src AS (
       |  SELECT source,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
       |  FROM documents GROUP BY source
       |), weighted AS (
       |  SELECT source, src_tokens,
       |    CAST(round(pow(CAST(src_tokens AS DOUBLE), $alpha) * 10000) AS BIGINT) AS w
       |  FROM by_src
       |), tot AS (
       |  SELECT CAST(sum(w) AS BIGINT) AS total FROM weighted
       |), alloc AS (
       |  SELECT source, src_tokens, w,
       |    CAST($budget * w // total AS BIGINT) AS base_quota,
       |    CAST($budget * w % total AS BIGINT) AS rem,
       |    CAST($budget - sum($budget * w // total) OVER () AS BIGINT) AS leftover
       |  FROM weighted CROSS JOIN tot
       |)
       |SELECT source, src_tokens, w AS weight_tmn,
       |  CAST(base_quota + CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <= leftover
       |       THEN 1 ELSE 0 END AS BIGINT) AS quota
       |FROM alloc
       |ORDER BY source""".stripMargin

  /** UniMax allocation (Chung et al., "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", 2023) — the THIRD allocator beside proportional
    * (largest-remainder) and temperature (w ∝ T^α): spread the token
    * budget as uniformly as possible across sources, but never draw
    * more than `epochCapX10/10` epochs from any one source — the
    * published answer to temperature sampling's over-repetition of
    * small sources. The waterfilling solution: sort sources by their
    * epoch cap ascending; a PREFIX gets capped (they can't absorb an
    * equal share), the rest split the remaining budget equally, with
    * the integer remainder going to the first uncapped sources in cap
    * order. Everything is integer arithmetic over window prefix sums
    * on the source-count-sized frame, so the allocation — not just the
    * machinery — is bit-identical across engines. Budget is
    * data-derived (`budgetX10/10` epochs of the whole corpus) so both
    * branches stay live at every scale factor. */
  def uniMaxAlloc(spark: SparkSession, sfDir: String,
      epochCapX10: Long = 20, budgetX10: Long = 19): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySrc = Tables.documents(spark, sfDir)
      .select(col("source"), wsTokens.as("n_tokens"))
      .groupBy(col("source")).agg(sum(col("n_tokens")).cast("long").as("t"))
      .withColumn("cap", expr(s"(t * $epochCapX10) DIV 10"))
    val all = Window.partitionBy()
    val byCap = Window.partitionBy().orderBy(col("cap"), col("source"))
    val run = Window.partitionBy().orderBy(col("cap"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = bySrc
      .withColumn("b", expr(s"(sum(t) OVER () * $budgetX10) DIV 10"))
      .withColumn("s_cnt", count(lit(1)).over(all))
      .withColumn("i", row_number().over(byCap))
      .withColumn("p", sum(col("cap")).over(run))
      .withColumn("p_prev", col("p") - col("cap"))
      .withColumn("capped",
        expr("cap * (s_cnt - i + 1) + p_prev <= b"))
    staged
      .withColumn("k", sum(when(col("capped"), 1L).otherwise(0L)).over(all))
      .withColumn("p_k", coalesce(
        max(when(col("capped"), col("p"))).over(all), lit(0L)))
      .withColumn("q", when(col("s_cnt") > col("k"),
        expr("(b - p_k) DIV (s_cnt - k)")).otherwise(lit(0L)))
      .withColumn("r", when(col("s_cnt") > col("k"),
        expr("(b - p_k) % (s_cnt - k)")).otherwise(lit(0L)))
      .withColumn("alloc_tokens", when(col("capped"), col("cap"))
        .otherwise(col("q") + when(col("i") - col("k") <= col("r"), 1L).otherwise(0L)))
      .select(col("source"), col("t").as("src_tokens"),
        col("cap").as("cap_tokens"), col("capped"),
        col("alloc_tokens").cast("long"),
        expr("(alloc_tokens * 1000) DIV t").as("epochs_milli"))
      .orderBy(col("source"))
  }

  /** Oracle twin of [[uniMaxAlloc]] — parameters interpolated. */
  def uniMaxAllocSql(epochCapX10: Long = 20, budgetX10: Long = 19): String =
    s"""WITH by_src AS (
       |  SELECT source,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t
       |  FROM documents GROUP BY source
       |), capd AS (
       |  SELECT source, t, (t * $epochCapX10) // 10 AS cap,
       |    (CAST(sum(t) OVER () AS BIGINT) * $budgetX10) // 10 AS b,
       |    CAST(count(*) OVER () AS BIGINT) AS s_cnt,
       |    CAST(row_number() OVER (ORDER BY (t * $epochCapX10) // 10, source) AS BIGINT) AS i,
       |    CAST(sum((t * $epochCapX10) // 10) OVER (
       |      ORDER BY (t * $epochCapX10) // 10, source
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
       |  FROM by_src
       |), flagged AS (
       |  SELECT *, p - cap AS p_prev,
       |    cap * (s_cnt - i + 1) + (p - cap) <= b AS capped
       |  FROM capd
       |), agg AS (
       |  SELECT *,
       |    CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS BIGINT) AS k,
       |    COALESCE(CAST(max(CASE WHEN capped THEN p END) OVER () AS BIGINT), 0) AS p_k
       |  FROM flagged
       |), alloc AS (
       |  SELECT *,
       |    CASE WHEN s_cnt > k THEN (b - p_k) // (s_cnt - k) ELSE 0 END AS q,
       |    CASE WHEN s_cnt > k THEN (b - p_k) % (s_cnt - k) ELSE 0 END AS r
       |  FROM agg
       |)
       |SELECT source, t AS src_tokens, cap AS cap_tokens, capped,
       |  CAST(CASE WHEN capped THEN cap
       |       ELSE q + CASE WHEN i - k <= r THEN 1 ELSE 0 END END AS BIGINT)
       |    AS alloc_tokens,
       |  CAST((CASE WHEN capped THEN cap
       |       ELSE q + CASE WHEN i - k <= r THEN 1 ELSE 0 END END * 1000) // t
       |    AS BIGINT) AS epochs_milli
       |FROM alloc
       |ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // Exact-quota sample execution (distributed order statistic)
  // --------------------------------------------------------------------

  /** EXECUTES the [[proportionalAlloc]] plan: per source, keep exactly
    * `quota` documents — the quota-th order statistic of a
    * deterministic id-hash, so the selection is reproducible and
    * unbiased by content. This is the distributed-selection algorithm,
    * not a sort: doc hashes histogram into `buckets` contiguous ranges,
    * the per-(source, bucket) counts (a model-sized table: sources ×
    * buckets rows at ANY corpus size) locate each source's boundary
    * bucket by cumulative count, every doc in a bucket strictly below
    * the boundary is kept outright, and ONLY the boundary bucket's
    * ~n/buckets docs pay a rank. No per-source corpus sort exists
    * anywhere.
    *
    * The oracle is the PLAIN formulation — one rank over each source's
    * full doc list — so a green run proves the histogram path selects
    * the identical set (the `q_skew_agg` pattern). `id_check` pins the
    * exact membership, not just the counts.
    */
  def exactSample(spark: SparkSession, sfDir: String,
      budget: Long = 1000, buckets: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(concat(lit("sample:"), col("doc_id"))), 1, 8), 16, 10)
      .cast("long")
    // the hashed-and-bucketed doc table feeds the histogram AND the
    // tagged spine (which itself fans out to the full/edge branches):
    // truncate once or the scan + token-split + md5 re-executes per
    // consumer (r14: 3 corpus passes → 1, measured)
    val docs = Truncate(Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), wsTokens.as("n_tokens"), h.as("h"))
      .withColumn("b", expr(s"h DIV ${(1L << 32) / buckets}")), // contiguous hash ranges
      "exactsample-docs")
    val quotas = proportionalAlloc(spark, sfDir, budget)
      .select(col("source"), col("quota"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("b"))
    val hist = docs.groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("cum_below", col("cum") - col("cnt"))
      .join(broadcast(quotas), Seq("source"))
    // two consumers (the kept-whole-bucket filter and the boundary
    // rank) — truncate so the histogram join runs once (r14). The
    // branches stay SEPARATE on purpose: merging them would put a full
    // per-source rank over the corpus; only the boundary bucket may
    // pay a window (the operator's scale contract).
    val tagged = Truncate(docs
      .join(broadcast(hist.select(col("source"), col("b"),
        col("cum"), col("cum_below"), col("quota"))), Seq("source", "b")),
      "exactsample-tagged")
    val keptFull = tagged.filter(col("cum") <= col("quota"))
    // only the boundary bucket (cum_below < quota < cum) pays a rank,
    // over ~corpus/buckets rows per source
    val wEdge = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val keptEdge = tagged
      .filter(col("cum_below") < col("quota") && col("quota") < col("cum"))
      .withColumn("r", row_number().over(wEdge))
      .filter(col("r") <= col("quota") - col("cum_below"))
      .drop("r")
    keptFull.unionByName(keptEdge)
      .groupBy(col("source"))
      .agg(max(col("quota")).as("quota"),
        count(lit(1)).as("kept_docs"),
        sum(col("n_tokens")).as("kept_tokens"),
        sum(col("doc_id") % lit(1000003L)).as("id_check"))
      .orderBy(col("source"))
  }

  /** Oracle twin of [[exactSample]] — the PLAIN one-rank-per-source
    * selection (the histogram engine path must choose the identical
    * set); `budget` interpolated, quota CTE = [[proportionalAllocSql]]
    * verbatim. */
  def exactSampleSql(budget: Long = 1000): String =
    s"""WITH alloc AS (
       |${proportionalAllocSql(budget)}
       |), hashed AS (
       |  SELECT source, doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    ('0x' || substr(md5('sample:' || doc_id), 1, 8))::BIGINT AS h
       |  FROM documents
       |), ranked AS (
       |  SELECT source, doc_id, n_tokens,
       |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS r
       |  FROM hashed
       |)
       |SELECT r.source, CAST(max(a.quota) AS BIGINT) AS quota,
       |  count(*) AS kept_docs,
       |  CAST(sum(r.n_tokens) AS BIGINT) AS kept_tokens,
       |  CAST(sum(r.doc_id % 1000003) AS BIGINT) AS id_check
       |FROM ranked r JOIN alloc a ON r.source = a.source
       |WHERE r.r <= a.quota
       |GROUP BY r.source
       |ORDER BY r.source""".stripMargin

  // --------------------------------------------------------------------
  // Weighted median document length (histogram formulation)
  // --------------------------------------------------------------------

  /** Per-source document-length medians, both doc-weighted (the length
    * of the middle DOCUMENT) and token-weighted (the length at which
    * half the corpus TOKENS sit in shorter docs) — the two numbers a
    * truncation/packing policy is set from, and they differ a lot on
    * heavy-tailed corpora. Median m = the smallest length whose
    * cumulative mass reaches half the total (`2·cum ≥ tot` — integer,
    * no midpoint interpolation, so both engines pick the identical
    * order statistic).
    *
    * Scale: the corpus collapses to a (source, n_tokens) HISTOGRAM
    * first — the windows scan per-source histogram rows (≤ distinct
    * lengths, ~100 here), never documents, so there is no per-source
    * corpus-sized sort anywhere (the formulation a naive
    * `percentile(…) OVER (PARTITION BY source)` would hide).
    */
  def weightedMedian(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL-text docs have NULL length and are excluded: a NULL sort key
    // orders FIRST in Spark but LAST in DuckDB, so keeping them would
    // silently break cross-engine parity the moment a corpus has one
    val hist = Tables.documents(spark, sfDir)
      .select(col("source"), wsTokens.as("n_tokens"))
      .filter(col("n_tokens").isNotNull)
      .groupBy(col("source"), col("n_tokens"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("bucket_tokens", col("n_tokens") * col("n_docs"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("n_tokens"))
    val wTot = Window.partitionBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("cum_docs", sum(col("n_docs")).over(wCum))
      .withColumn("cum_tokens", sum(col("bucket_tokens")).over(wCum))
      .withColumn("tot_docs", sum(col("n_docs")).over(wTot))
      .withColumn("tot_tokens", sum(col("bucket_tokens")).over(wTot))
      .groupBy(col("source"))
      .agg(max(col("tot_docs")).as("n_docs"),
        max(col("tot_tokens")).as("total_tokens"),
        min(when(col("cum_docs") * 2 >= col("tot_docs"), col("n_tokens")))
          .as("median_len"),
        min(when(col("cum_tokens") * 2 >= col("tot_tokens"), col("n_tokens")))
          .as("token_weighted_median_len"))
      .orderBy(col("source"))
  }

  def weightedMedianSql: String =
    """WITH hist AS (
      |  SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) IS NOT NULL
      |  GROUP BY 1, 2
      |), cum AS (
      |  SELECT source, n_tokens, n_docs, n_tokens * n_docs AS bucket_tokens,
      |    CAST(sum(n_docs) OVER (PARTITION BY source ORDER BY n_tokens) AS BIGINT) AS cum_docs,
      |    CAST(sum(n_tokens * n_docs) OVER (PARTITION BY source ORDER BY n_tokens) AS BIGINT) AS cum_tokens,
      |    CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT) AS tot_docs,
      |    CAST(sum(n_tokens * n_docs) OVER (PARTITION BY source) AS BIGINT) AS tot_tokens
      |  FROM hist
      |)
      |SELECT source, max(tot_docs) AS n_docs, max(tot_tokens) AS total_tokens,
      |  min(CASE WHEN cum_docs * 2 >= tot_docs THEN n_tokens END) AS median_len,
      |  min(CASE WHEN cum_tokens * 2 >= tot_tokens THEN n_tokens END)
      |    AS token_weighted_median_len
      |FROM cum
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // Distribution drift (two-sample Kolmogorov–Smirnov)
  // --------------------------------------------------------------------

  /** Pairwise distribution-shift audit: the two-sample Kolmogorov–
    * Smirnov statistic D = max |CDF_a − CDF_b| over every pair of
    * sources' document-LENGTH distributions, in scaled-integer ppm
    * (each CDF value truncates once via `cum·10⁶ DIV N`; the max-of-
    * abs-differences is then exact). This is the drift detector a
    * curation run points at source-vs-source, epoch-vs-epoch, or
    * raw-vs-kept to answer "did the filter change the shape of the
    * corpus?" — a large D on a pair that should match is the alarm.
    *
    * Scale: the corpus collapses to the (source, n_tokens) HISTOGRAM
    * immediately (the [[weightedMedian]] discipline); everything after
    * — merged support, CDF fill via ignoreNulls window, the pair max —
    * runs on #sources × #distinct-lengths rows, model-sized at any
    * corpus scale. NULL-length docs are excluded by the same contract
    * as [[weightedMedian]].
    */
  def lengthDrift(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.documents(spark, sfDir)
      .select(col("source"), wsTokens.as("len"))
      .filter(col("len").isNotNull)
      .groupBy(col("source"), col("len"))
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("len"))
    val wTot = Window.partitionBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val points = hist
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("total", sum(col("n")).over(wTot))
      .select(col("source"), col("len"),
        expr("(cum * 1000000) DIV total").as("cdf_ppm"))
    // merged support × sources, step-filled so every source has a CDF
    // value at every corpus-wide length (0 before its first point)
    val support = hist.select(col("len")).distinct()
    val sources = hist.select(col("source")).distinct()
    val wFill = Window.partitionBy(col("source")).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = support.crossJoin(sources)
      .join(points, Seq("source", "len"), "left")
      .withColumn("cdf", coalesce(
        last(col("cdf_ppm"), ignoreNulls = true).over(wFill), lit(0L)))
      .select(col("source"), col("len"), col("cdf"))
    val a = grid.select(col("source").as("source_a"), col("len"), col("cdf").as("cdf_a"))
    val b = grid.select(col("source").as("source_b"), col("len"), col("cdf").as("cdf_b"))
    a.join(b, Seq("len"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(max(abs(col("cdf_a") - col("cdf_b"))).as("ks_d_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def lengthDriftSql: String =
    """WITH hist AS (
      |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) IS NOT NULL
      |  GROUP BY 1, 2
      |), points AS (
      |  SELECT source, len,
      |    CAST(CAST(sum(n) OVER (PARTITION BY source ORDER BY len) AS BIGINT)
      |         * 1000000 // CAST(sum(n) OVER (PARTITION BY source) AS BIGINT)
      |         AS BIGINT) AS cdf_ppm
      |  FROM hist
      |), grid AS (
      |  SELECT s.source, l.len,
      |    COALESCE(last_value(p.cdf_ppm IGNORE NULLS) OVER (
      |      PARTITION BY s.source ORDER BY l.len
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cdf
      |  FROM (SELECT DISTINCT len FROM hist) l
      |  CROSS JOIN (SELECT DISTINCT source FROM hist) s
      |  LEFT JOIN points p ON p.source = s.source AND p.len = l.len
      |)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  CAST(max(abs(a.cdf - b.cdf)) AS BIGINT) AS ks_d_ppm
      |FROM grid a JOIN grid b ON a.len = b.len AND a.source < b.source
      |GROUP BY a.source, b.source
      |ORDER BY source_a, source_b""".stripMargin

  // --------------------------------------------------------------------
  // N-gram diversity (type-token ratios)
  // --------------------------------------------------------------------

  /** Per-source lexical-diversity report: distinct/total ratios (ppm)
    * for unigrams and word 3-grams. A source whose 3-gram TTR collapses
    * is template/boilerplate-heavy even when its unigram TTR looks
    * healthy — the corpus-card diversity metric that complements the
    * per-doc repetition filter (`q_doc_repetition`). Docs under 3
    * tokens contribute zero 3-grams (same guard as
    * `q_boilerplate_ngrams`). All-integer, ppm via truncating DIV.
    *
    * Scale: one explode per n; distinct counts are per-source
    * `countDistinct` over (source, gram) — two-level partial agg, the
    * same shuffle budget as `q_term_freq` at any corpus size.
    */
  def ngramDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    val t = split(col("text"), " ")
    val docs = Tables.documents(spark, sfDir)
    val uni = docs.select(col("source"), explode(t).as("g"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("g")).as("distinct_tokens"))
    val tri = docs.select(col("source"),
        explode(when(size(t) >= 3,
            transform(sequence(lit(1), size(t) - 2),
              i => array_join(slice(t, i, lit(3)), " ")))
          .otherwise(array().cast("array<string>"))).as("g"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_3grams"),
        countDistinct(col("g")).as("distinct_3grams"))
    // LEFT join: a source whose docs are all under 3 tokens has zero
    // 3-grams but must still appear in the report (ratio NULL — both
    // engines would THROW on DIV 0 under ANSI semantics, and 0 would
    // read as "no diversity", the opposite of "no data")
    uni.join(tri, Seq("source"), "left")
      .select(col("source"), col("n_tokens"), col("distinct_tokens"),
        expr("(distinct_tokens * 1000000) DIV n_tokens").as("uni_ttr_ppm"),
        coalesce(col("n_3grams"), lit(0L)).as("n_3grams"),
        coalesce(col("distinct_3grams"), lit(0L)).as("distinct_3grams"))
      .withColumn("tri_ttr_ppm",
        when(col("n_3grams") > 0, expr("(distinct_3grams * 1000000) DIV n_3grams")))
      .orderBy(col("source"))
  }

  def ngramDiversitySql: String =
    """WITH uni AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(count(DISTINCT g) AS BIGINT) AS distinct_tokens
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS g FROM documents)
      |  GROUP BY source
      |), tri AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_3grams,
      |    CAST(count(DISTINCT g) AS BIGINT) AS distinct_3grams
      |  FROM (
      |    SELECT source, array_to_string(t[i:i+2], ' ') AS g
      |    FROM (SELECT source, string_split(text, ' ') AS t,
      |            unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS i
      |          FROM documents))
      |  GROUP BY source
      |)
      |SELECT source, n_tokens, distinct_tokens,
      |  CAST(distinct_tokens * 1000000 // n_tokens AS BIGINT) AS uni_ttr_ppm,
      |  coalesce(n_3grams, 0) AS n_3grams,
      |  coalesce(distinct_3grams, 0) AS distinct_3grams,
      |  CAST(CASE WHEN coalesce(n_3grams, 0) > 0
      |       THEN distinct_3grams * 1000000 // n_3grams END AS BIGINT) AS tri_ttr_ppm
      |FROM uni LEFT JOIN tri USING (source)
      |ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // Character entropy (per-doc quality signal)
  // --------------------------------------------------------------------

  /** Per-document character-level Shannon entropy in tenth-milli-nats:
    * H = Σ_c (c/n)·ln(n/c) over the doc's character counts. Encoding
    * junk, base64 blobs and repeated-char padding sit at the extremes
    * of this signal, which is why it's a standard pre-training quality
    * gate alongside length/punctuation ratios (`q_quality_score`).
    * Per-class cost rounds ONCE to integer tenth-milli-nats; the doc
    * value is the exact integer Σ c·cost DIV n. Empty docs have no
    * characters and drop out of the output (both engines derive rows
    * from character positions only).
    *
    * Scale: explode over character positions, two doc_id-keyed partial
    * aggs — per-row work linear in bytes, no join wider than the doc.
    */
  def charEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    // guard: Spark's sequence(1, 0) counts DOWN ([1, 0]) where DuckDB's
    // generate_series(1, 0) is empty — empty docs must yield no rows
    val chars = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        explode(when(length(col("text")) > 0,
            sequence(lit(1), length(col("text"))))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), length(col("text")).cast("long").as("n"),
        col("text").substr(col("i"), lit(1)).as("ch"))
    chars.groupBy(col("doc_id"), col("n"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("n"),
        (col("c") * round(log(col("n").cast("double") / col("c")) * 10000)
          .cast("long")).as("cost"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_chars_counted"),
        sum(col("cost")).as("ent_sum_tmn"))
      .withColumn("ent_tmn", expr("ent_sum_tmn DIV n_chars_counted"))
      .select(col("doc_id"), col("n_chars_counted"), col("ent_tmn"))
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------------------------------
  // Head-prefix duplicate cohorts
  // --------------------------------------------------------------------

  /** Documents sharing an identical head (first `prefixTokens` tokens)
    * with at least one other document — the template-intro detector:
    * scraped corpora are full of pages whose BODIES differ but whose
    * boilerplate openings are byte-identical, which full-document
    * exact dedup misses and shingle near-dup under-weights (the head
    * is a small fraction of a long doc). Cohorts are computed
    * CORPUS-WIDE (a cross-source shared head still counts), then
    * attributed per source as a ppm rate.
    *
    * Scale: the head collapses to one md5 per doc; cohort sizing is an
    * equi-join on that digest (never text×text), the `q_dedup_exact`
    * shuffle budget.
    */
  def prefixDup(spark: SparkSession, sfDir: String,
      prefixTokens: Int = 8): DataFrame = {
    val t = split(col("text"), " ")
    val heads = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        md5(array_join(slice(t, 1, prefixTokens), " ")).as("h"))
    val cohorts = heads.groupBy(col("h")).agg(count(lit(1)).as("cohort_n"))
    heads.join(cohorts, Seq("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cohort_n") > 1, 1L).otherwise(0L)).as("dup_head_docs"),
        countDistinct(when(col("cohort_n") > 1, col("h"))).as("dup_head_groups"))
      .withColumn("dup_head_ppm", expr("(dup_head_docs * 1000000) DIV n_docs"))
      .orderBy(col("source"))
  }

  /** Oracle twin of [[prefixDup]] — `prefixTokens` interpolated. */
  def prefixDupSql(prefixTokens: Int = 8): String =
    s"""WITH heads AS (
       |  SELECT source, doc_id,
       |    md5(array_to_string(string_split(text, ' ')[1:$prefixTokens], ' ')) AS h
       |  FROM documents
       |), cohorts AS (
       |  SELECT h, CAST(count(*) AS BIGINT) AS cohort_n FROM heads GROUP BY h
       |)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN cohort_n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_head_docs,
       |  CAST(count(DISTINCT CASE WHEN cohort_n > 1 THEN h END) AS BIGINT) AS dup_head_groups,
       |  CAST(CAST(sum(CASE WHEN cohort_n > 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
       |       // CAST(count(*) AS BIGINT) AS BIGINT) AS dup_head_ppm
       |FROM heads JOIN cohorts USING (h)
       |GROUP BY source
       |ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // Length × quality curriculum grid
  // --------------------------------------------------------------------

  /** The packing/curriculum planning table: documents cross-tabbed by
    * length band (16-token steps, capped at band 7) × quality decile
    * ([[Text.qualityDecile]] — the SAME predicate the filter stage
    * runs), with doc and token mass per cell. A curriculum scheduler
    * reads this to decide what a "short high-quality warmup epoch"
    * actually costs in tokens; a batcher reads the marginals to size
    * its length buckets ([[Pipeline.packEfficiency]] gives the padding
    * consequence).
    *
    * Scale: stateless per-row banding + one grid-sized hash agg (≤ 80
    * cells at any corpus size) — map-side combine does all the work.
    */
  def lengthQualityGrid(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      // Spark's Column./ is FRACTIONAL division even on longs — band
      // with integer DIV so both engines truncate identically
      .select(wsTokens.as("n_tokens"), Text.qualityDecile.as("decile"))
      .select(least(expr("n_tokens DIV 16"), lit(7L)).as("len_band"),
        col("decile"), col("n_tokens"))
      .groupBy(col("len_band"), col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("len_band"), col("decile"))
  }

  def lengthQualityGridSql: String =
    s"""WITH graded AS (
       |  SELECT least(CAST(len(string_split(text, ' ')) AS BIGINT) // 16, 7) AS len_band,
       |    (${Text.qualityDecileSqlExpr}) AS decile,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |)
       |SELECT len_band, decile, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
       |FROM graded
       |GROUP BY len_band, decile
       |ORDER BY len_band, decile""".stripMargin

  def charEntropySql: String =
    """WITH chars AS (
      |  SELECT doc_id, CAST(len(text) AS BIGINT) AS n, substr(text, i, 1) AS ch
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, len(text))) AS i
      |        FROM documents)
      |), classes AS (
      |  SELECT doc_id, n,
      |    CAST(count(*) AS BIGINT)
      |      * CAST(round(ln(CAST(n AS DOUBLE) / count(*)) * 10000) AS BIGINT) AS cost
      |  FROM chars GROUP BY doc_id, n, ch
      |)
      |SELECT doc_id, max(n) AS n_chars_counted,
      |  CAST(CAST(sum(cost) AS BIGINT) // max(n) AS BIGINT) AS ent_tmn
      |FROM classes
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // Quality-decile × near-dup cross audit (filter-correlation lift)
  // --------------------------------------------------------------------

  /** Does the quality filter's victim set overlap the dedup filter's?
    * Per quality decile ([[Text.qualityDecile]], the oracle-proven
    * gate), the fraction of docs participating in ≥1 confirmed
    * near-dup pair (the shared [[Dedup]] pair table), plus the LIFT
    * vs the corpus base rate in per-mille. Curation pipelines need
    * this table to order their gates: if low deciles carry most dup
    * mass (lift ≫ 1000), quality-first saves the dedup pass most of
    * its candidate volume; if lift ≈ 1000 the filters are
    * independent and order is a pure cost choice.
    *
    * Engine parity: rates and lift are truncating integer division
    * over exact counts; a dup-free corpus makes lift NULL on both
    * sides (the [[Dedup.lshBandTune]] degenerate-input rule).
    *
    * Scale: the pair table is the amortized banded-LSH build; the
    * dup-id set is pair-bounded; one broadcast-able distinct join
    * against the corpus scan and a 10-row agg. */
  def qualityDupLift(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Dedup.nearDupPairTable(spark, sfDir)
    val dup = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct().withColumn("is_dup", lit(1L))
    val flagged = Tables.documents(spark, sfDir)
      .select(col("doc_id"), Text.qualityDecile.as("decile"))
      .join(dup, Seq("doc_id"), "left")
      .select(col("decile"), coalesce(col("is_dup"), lit(0L)).as("is_dup"))
    val totals = flagged.agg(count(lit(1)).as("n_total"),
      sum(col("is_dup")).as("n_dup_total"))
    flagged.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("is_dup")).as("n_dup"))
      .crossJoin(broadcast(totals))
      .select(col("decile"), col("n_docs"), col("n_dup"),
        expr("n_dup * 1000000 DIV n_docs").as("dup_ppm"),
        when(col("n_dup_total") === 0, lit(null).cast("long"))
          .otherwise(expr("n_dup * n_total * 1000 DIV (n_docs * n_dup_total)"))
          .as("lift_pm"))
      .orderBy(col("decile"))
  }

  /** Oracle twin of [[qualityDupLift]] — the graph oracles' pair CTE
    * chain plus the shared decile expression. */
  def qualityDupLiftSql: String =
    s"""WITH ${Graph.nearDupEdgesCteSql},
       |dup AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_a AS doc_id FROM pairs
       |    UNION ALL SELECT doc_b AS doc_id FROM pairs)),
       |flagged AS (
       |  SELECT (${Text.qualityDecileSqlExpr}) AS decile,
       |    CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
       |  FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id),
       |totals AS (
       |  SELECT count(*) AS n_total, CAST(sum(is_dup) AS BIGINT) AS n_dup_total
       |  FROM flagged)
       |SELECT decile, count(*) AS n_docs,
       |  CAST(sum(is_dup) AS BIGINT) AS n_dup,
       |  CAST(sum(is_dup) * 1000000 // count(*) AS BIGINT) AS dup_ppm,
       |  CASE WHEN max(t.n_dup_total) = 0 THEN NULL
       |       ELSE CAST(sum(is_dup) * max(t.n_total) * 1000 //
       |            (count(*) * max(t.n_dup_total)) AS BIGINT)
       |  END AS lift_pm
       |FROM flagged CROSS JOIN totals t
       |GROUP BY decile
       |ORDER BY decile""".stripMargin

  // --------------------------------------------------------------------
  // Unigram KL divergence: source vs corpus distribution shift
  // --------------------------------------------------------------------

  /** Per-source unigram KL divergence from the corpus distribution —
    * the information-theoretic drift measure next to
    * [[lengthDrift]]'s KS statistic: KL(pₛ ‖ p_c) over add-1-smoothed
    * token unigrams says how many nats a code built for the CORPUS
    * mix wastes on THIS source. The number a data-mixing pipeline
    * thresholds when deciding which sources need their own sampling
    * temperature, and the contamination signal when a "new" crawl
    * slice turns out to be an old one (KL ≈ 0).
    *
    * Exactness (the LM-ladder rule): smoothing keeps every
    * probability strictly positive over the shared corpus vocab, each
    * word's term is ONE double tree over exact integer counts —
    * (c_s+1)·ln( (c_s+1)·(N_c+V) / ((c_c+1)·(N_s+V)) ) — rounded ONCE
    * to tenth-milli-nats; the per-source sum of those integers is
    * exact, and the reported value is the sum scaled by the
    * (integer) smoothed source mass via truncating DIV:
    * kl_tmn ≈ KL · 10⁴. Unseen-in-source words enter with c_s = 0
    * (the LEFT join), so the sum runs over the FULL vocab like the
    * definition demands.
    *
    * Scale: one tokenize+explode into per-(source, word) counts
    * (map-side combined), corpus marginals derived from that SAME
    * counts table, one |V|×|sources| left join — the tf-idf shape;
    * never doc×doc. */
  def klUnigram(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = graft.Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val sw = toks.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c_s"))
    val cw = sw.groupBy(col("w")).agg(sum(col("c_s")).as("c_c"))
    val totals = sw.groupBy(col("source")).agg(sum(col("c_s")).as("n_s"))
    val nc = cw.agg(sum(col("c_c")).as("n_c"), count(lit(1)).as("v"))
    val terms = cw.crossJoin(broadcast(nc))
      .crossJoin(broadcast(totals)) // |V| x |sources| grid
      .join(sw, Seq("source", "w"), "left")
      .withColumn("cs", coalesce(col("c_s"), lit(0L)))
      .withColumn("term_tmn",
        round((col("cs") + 1).cast("double") *
          log(((col("cs") + 1) * (col("n_c") + col("v"))).cast("double") /
            ((col("c_c") + 1) * (col("n_s") + col("v"))).cast("double")) * 10000)
          .cast("long"))
    terms.groupBy(col("source"))
      .agg(max(col("n_s")).cast("long").as("n_tokens"),
        max(col("v")).cast("long").as("n_vocab"),
        sum(col("term_tmn")).cast("long").as("sum_term_tmn"))
      .withColumn("kl_tmn", expr("sum_term_tmn DIV (n_tokens + n_vocab)"))
      .orderBy(col("source"))
  }

  /** Oracle twin of [[klUnigram]] — identical smoothing, identical
    * one-rounding-per-term rule. */
  def klUnigramSql: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      |sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c_s FROM toks GROUP BY source, w),
      |cw AS (SELECT w, CAST(sum(c_s) AS BIGINT) AS c_c FROM sw GROUP BY w),
      |totals AS (SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s FROM sw GROUP BY source),
      |nc AS (SELECT CAST(sum(c_c) AS BIGINT) AS n_c, CAST(count(*) AS BIGINT) AS v FROM cw),
      |terms AS (
      |  SELECT t.source, cw.w, coalesce(sw.c_s, 0) AS cs, cw.c_c, t.n_s, nc.n_c, nc.v
      |  FROM cw CROSS JOIN nc CROSS JOIN totals t
      |  LEFT JOIN sw ON sw.source = t.source AND sw.w = cw.w),
      |scored AS (
      |  SELECT source, n_s, v,
      |    CAST(round((cs + 1) * ln(CAST((cs + 1) * (n_c + v) AS DOUBLE) /
      |      CAST((c_c + 1) * (n_s + v) AS DOUBLE)) * 10000) AS BIGINT) AS term_tmn
      |  FROM terms)
      |SELECT source,
      |  CAST(max(n_s) AS BIGINT) AS n_tokens,
      |  CAST(max(v) AS BIGINT) AS n_vocab,
      |  CAST(sum(term_tmn) AS BIGINT) AS sum_term_tmn,
      |  CAST(CAST(sum(term_tmn) AS BIGINT) // (max(n_s) + max(v)) AS BIGINT) AS kl_tmn
      |FROM scored GROUP BY source ORDER BY source""".stripMargin
}
