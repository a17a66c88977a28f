package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data pipeline assembly operators: sequence packing, domain
  * mixing, and PII redaction. These are the stages that sit BETWEEN the
  * filtering/dedup surface (`Text`, `Dedup`) and the trainer: decide how
  * much of each source to keep, scrub what must not be trained on, and
  * pack the survivors into fixed context windows.
  *
  * The reference (`fernandogoncalves-me/serverless-datalake`) has no
  * analytics surface at all (see SURVEY.md §2.2); these operators are
  * part of the mandated north-star extension surface.
  *
  * All three queries are integer-exact by construction (no FP folds), so
  * the DuckDB hash-compare is bit-stable at any scale factor.
  */
object Pipeline {

  /** Whitespace token count, identical in Spark and DuckDB:
    * `split('', ' ')` yields one element in both engines. */
  private def wsTokens: Column = size(split(col("text"), " ")).cast("long")

  // --------------------------------------------------------------------
  // Sequence packing (concat-and-chunk)
  // --------------------------------------------------------------------

  /** Packs documents into fixed token-budget context windows per source:
    * docs are laid out in deterministic doc_id order and a window starts
    * every `budget` tokens of the running (exclusive) prefix sum — the
    * concat-then-chunk layout used to build fixed-length training
    * batches. A document whose prefix straddles a boundary stays with
    * the pack its FIRST token falls in (greedy-by-offset), so pack sizes
    * may overshoot by at most one document — the standard trade against
    * splitting documents mid-sequence.
    *
    * Scale: the prefix sum is computed as a two-level distributed scan,
    * NOT one window per source (which would sort a source's entire
    * multi-TB corpus in a single task at 100 TB). Each source's doc_id
    * value range is split into `shards` contiguous buckets; the heavy
    * window runs per (source, bucket) — `shards`× the parallelism — and
    * the exclusive cross-bucket carry comes from a window over the tiny
    * per-bucket totals table (sources × shards rows, broadcast back).
    * Because buckets are CONTIGUOUS doc_id ranges, local_offset +
    * bucket_carry is bit-identical to the single global window — which
    * is exactly what the oracle checks: the DuckDB side is the PLAIN
    * per-source window, so a green run proves sharded ≡ unsharded
    * (the `q_skew_agg` pattern). `shards = 1` degenerates to the plain
    * formulation (used by the equivalence spec).
    *
    * The prefix sums are longs; overflow needs a single source over
    * 2^63 tokens.
    */
  /** The sharding step of [[seqPack]], exposed so the plan audit can
    * count shard groups: contiguous value-range buckets over each
    * source's doc_id span. doc_ids are dense, so ranges shard evenly.
    * bounds is one row per source — broadcast, and an Aggregate subtree
    * (bounded at any SF). */
  private[graft] def packBuckets(spark: SparkSession, sfDir: String,
      shards: Int): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), wsTokens.as("n_tokens"))
    val bounds = toks.groupBy(col("source"))
      .agg(min(col("doc_id")).as("__lo"), max(col("doc_id")).as("__hi"))
    toks.join(broadcast(bounds), "source")
      .withColumn("__bucket", least(lit(shards - 1L),
        expr(s"((doc_id - __lo) * $shards) DIV (__hi - __lo + 1)")))
      .drop("__lo", "__hi")
  }

  /** The distributed exclusive prefix sum both packers share: yields
    * (source, doc_id, n_tokens, offset) with `offset` = total tokens
    * of all earlier docs (doc_id order) in the same source, computed
    * via the two-level sharded scan documented at [[seqPack]]. */
  private[graft] def packOffsets(spark: SparkSession, sfDir: String,
      shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val bucketed = packBuckets(spark, sfDir, shards)
    // level 1: exclusive prefix sum WITHIN each (source, bucket) shard
    val wLocal = Window.partitionBy(col("source"), col("__bucket"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("__local_off",
      coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    // level 2: exclusive carry across buckets — sources × shards rows
    val wCarry = Window.partitionBy(col("source")).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bucketed.groupBy(col("source"), col("__bucket"))
      .agg(sum(col("n_tokens")).as("__btot"))
      .withColumn("__carry", coalesce(sum(col("__btot")).over(wCarry), lit(0L)))
      .select(col("source"), col("__bucket"), col("__carry"))
    local.join(broadcast(carry), Seq("source", "__bucket"))
      .withColumn("offset", col("__local_off") + col("__carry"))
      .select(col("source"), col("doc_id"), col("n_tokens"), col("offset"))
  }

  def seqPack(spark: SparkSession, sfDir: String, budget: Int = 512,
      shards: Int = 8): DataFrame = {
    packOffsets(spark, sfDir, shards)
      .withColumn("pack_id", expr(s"offset DIV $budget"))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("pack_id"))
  }

  /** Oracle twin of [[seqPack]] — the PLAIN per-source window (the
    * sharded engine path must be bit-identical); `budget` interpolated
    * with the same default so non-default calls keep parity. */
  def seqPackSql(budget: Int = 512): String =
    s"""WITH toks AS (
      |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), offs AS (
      |  SELECT source, doc_id, n_tokens,
      |    COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS "offset"
      |  FROM toks
      |)
      |SELECT source, CAST("offset" // $budget AS BIGINT) AS pack_id,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM offs GROUP BY 1, 2 ORDER BY source, pack_id""".stripMargin

  /** The OTHER packing policy: split documents at window boundaries so
    * every context window carries EXACTLY `budget` tokens (the last
    * window of a source may run short) — the GPT-style dense layout,
    * where [[seqPack]] is the greedy keep-docs-whole layout that
    * overshoots. A document occupies the half-open token range
    * [offset, offset+n) of its source's global concatenation and
    * contributes one FRAGMENT to every window that range intersects:
    * fragment length in window w = min((w+1)·B, offset+n) − max(w·B,
    * offset). The report per (source, window): fragment count, docs
    * kept whole, and the window's token fill (the exactly-B invariant
    * is pinned in PipelineSpec; the oracle hash pins the layout).
    *
    * Scale: the offsets come from the SAME two-level sharded prefix
    * sum as [[seqPack]] ([[packOffsets]]); the fan-out is a generator
    * explode (≤ n/B + 1 windows per doc, corpus-token-linear) and one
    * partial-combined agg on (source, pack) — no new shuffle shape.
    */
  def seqPackSplit(spark: SparkSession, sfDir: String, budget: Int = 512,
      shards: Int = 8): DataFrame = {
    val b = budget.toLong
    packOffsets(spark, sfDir, shards)
      .withColumn("pack_id", explode(sequence(
        expr(s"offset DIV $b"), expr(s"(offset + n_tokens - 1) DIV $b"))))
      .withColumn("frag_tokens",
        least(lit(b) * (col("pack_id") + 1), col("offset") + col("n_tokens"))
          - greatest(lit(b) * col("pack_id"), col("offset")))
      .withColumn("whole", (col("frag_tokens") === col("n_tokens")).cast("long"))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_fragments"),
        sum(col("whole")).as("n_whole_docs"),
        sum(col("frag_tokens")).as("pack_tokens"))
      .orderBy(col("source"), col("pack_id"))
  }

  /** Oracle twin of [[seqPackSplit]] — plain per-source window offsets
    * (the sharded path must be bit-identical), `budget` interpolated. */
  def seqPackSplitSql(budget: Int = 512): String =
    s"""WITH toks AS (
      |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), offs AS (
      |  SELECT source, doc_id, n_tokens,
      |    COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS "offset"
      |  FROM toks
      |), frags AS (
      |  SELECT source, doc_id, n_tokens, "offset",
      |    unnest(generate_series(CAST("offset" // $budget AS BIGINT),
      |      CAST(("offset" + n_tokens - 1) // $budget AS BIGINT))) AS pack_id
      |  FROM offs
      |)
      |SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
      |  count(*) AS n_fragments,
      |  CAST(sum(CASE WHEN least($budget * (pack_id + 1), "offset" + n_tokens)
      |                   - greatest($budget * pack_id, "offset") = n_tokens
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_whole_docs,
      |  CAST(sum(least($budget * (pack_id + 1), "offset" + n_tokens)
      |           - greatest($budget * pack_id, "offset")) AS BIGINT) AS pack_tokens
      |FROM frags
      |GROUP BY source, pack_id
      |ORDER BY source, pack_id""".stripMargin

  // --------------------------------------------------------------------
  // Overlapping-window chunking
  // --------------------------------------------------------------------

  /** Splits every document into overlapping token windows (`win` tokens
    * starting every `stride`) — the RAG / long-context chunker that
    * complements [[seqPack]]: packing concatenates short docs, chunking
    * fans long docs out. Chunk rows are produced by a generator
    * (`explode(sequence(...))` — no self-join, no UDF) and re-aggregated
    * per source so the audit output stays small; a caller who wants the
    * chunk rows themselves stops before the groupBy.
    *
    * Chunk count per doc is closed-form integer arithmetic
    * (`1 + ceil((n_tokens - win) / stride)` for docs over one window),
    * so both engines enumerate identical chunks. The last chunk of a
    * long doc keeps `win - stride < len <= win` tokens — never empty.
    *
    * Scale: stateless per-row fan-out (output ∝ corpus tokens / stride)
    * followed by one partial agg on `source` — no shuffle before the
    * generator, map-side combine after it.
    */
  def chunkWindows(spark: SparkSession, sfDir: String,
      win: Int = 128, stride: Int = 96): DataFrame = {
    val nChunks = when(col("n_tokens") <= win, lit(1L))
      .otherwise(expr(s"(n_tokens - $win + $stride - 1) DIV $stride") + lit(1L))
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), wsTokens.as("n_tokens"))
      .withColumn("n_chunks", nChunks)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("n_chunks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_no"))
      .withColumn("chunk_tokens",
        least(lit(win.toLong), col("n_tokens") - col("chunk_no") * stride))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("total_chunks"),
        sum(col("chunk_tokens")).as("sum_chunk_tokens"),
        max(col("n_chunks")).as("max_chunks_per_doc"))
      .orderBy(col("source"))
  }

  /** Oracle twin of [[chunkWindows]] — `win`/`stride` interpolated
    * with the same defaults so non-default calls keep parity. */
  def chunkWindowsSql(win: Int = 128, stride: Int = 96): String =
    s"""WITH toks AS (
      |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), nch AS (
      |  SELECT source, doc_id, n_tokens,
      |    CASE WHEN n_tokens <= $win THEN 1
      |         ELSE (n_tokens - $win + ${stride - 1}) // $stride + 1 END AS n_chunks
      |  FROM toks
      |), chunks AS (
      |  SELECT source, doc_id, n_tokens, n_chunks,
      |    unnest(generate_series(0, n_chunks - 1)) AS chunk_no
      |  FROM nch
      |)
      |SELECT source, count(DISTINCT doc_id) AS n_docs,
      |  count(*) AS total_chunks,
      |  CAST(sum(least($win, n_tokens - chunk_no * $stride)) AS BIGINT) AS sum_chunk_tokens,
      |  max(n_chunks) AS max_chunks_per_doc
      |FROM chunks GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // Domain mixing (rebalance sources to a uniform token budget)
  // --------------------------------------------------------------------

  /** Rebalances the corpus so every source contributes at most a uniform
    * token budget (`total_tokens DIV n_sources`): over-represented
    * sources are down-sampled by a deterministic content hash, sources
    * already under budget keep everything. This is the domain-mixture
    * step of a pre-training pipeline (uniform here; any target weight
    * vector drops in the same way — replace `budget` with the per-source
    * target).
    *
    * The keep test is pure integer arithmetic, the same trick as
    * `Text.weightedSample`: keep iff `u_ppm * src_tokens <
    * budget * 1_000_000` where u_ppm ∈ [0, 1e6) comes from the doc's
    * md5 — no FP rate can round differently across engines, and a source
    * under budget keeps all docs because u_ppm < 1e6 ≤ budget·1e6/src.
    * Product bound: u_ppm ≤ 1e6, so src_tokens beyond ~9.2e12 needs the
    * ratio rewritten in decimal — fine past 100 TB of text per source.
    *
    * Scale: two partial aggregates (per-source, then the 20-row total)
    * plus one broadcast join of the 20-row rate table back onto the doc
    * scan — a single wide shuffle on `source` total.
    */
  def sourceMix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("text"), wsTokens.as("n_tokens"))
    val bySrc = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("src_tokens"))
    val budget = bySrc.agg(
      expr("sum(src_tokens) DIV count(*)").as("budget"))
    val uPpm = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long") % lit(1000000L)
    docs.withColumn("u_ppm", uPpm)
      .join(broadcast(bySrc), "source")
      .crossJoin(broadcast(budget))
      .withColumn("kept", col("u_ppm") * col("src_tokens") < col("budget") * lit(1000000L))
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"),
        max(col("src_tokens")).as("src_tokens"),
        max(col("budget")).as("budget"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  def sourceMixSql: String =
    """WITH toks AS (
      |  SELECT source, doc_id, text,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    ('0x' || substr(md5(text), 1, 8))::BIGINT % 1000000 AS u_ppm
      |  FROM documents
      |), by_src AS (
      |  SELECT source, count(*) AS n_docs, sum(n_tokens) AS src_tokens
      |  FROM toks GROUP BY 1
      |), tot AS (
      |  SELECT sum(src_tokens) // count(*) AS budget FROM by_src
      |)
      |SELECT t.source, max(b.n_docs) AS n_docs,
      |  CAST(max(b.src_tokens) AS BIGINT) AS src_tokens,
      |  CAST(max(tot.budget) AS BIGINT) AS budget,
      |  CAST(sum(CASE WHEN t.u_ppm * b.src_tokens < tot.budget * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
      |  CAST(sum(CASE WHEN t.u_ppm * b.src_tokens < tot.budget * 1000000 THEN t.n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
      |FROM toks t JOIN by_src b ON t.source = b.source CROSS JOIN tot
      |GROUP BY t.source ORDER BY t.source""".stripMargin

  // --------------------------------------------------------------------
  // PII redaction
  // --------------------------------------------------------------------

  /** Patterns shared by the Spark column and the DuckDB oracle. Kept to
    * the RE2 ∩ java.util.regex common subset: explicit character
    * classes, no lookaround, no backreferences, ASCII `\b`. Order
    * matters: emails first (they contain dots and digits that the IP
    * and phone patterns would otherwise chew on). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** Scrubs emails, IPv4 addresses, and 7-digit phone numbers from a
    * text column, replacing each with a typed placeholder. Pure codegen
    * built-ins (three `regexp_replace`s) — no UDF in the hot path. */
  def redactPii(c: Column): Column = {
    val noEmail = regexp_replace(c, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, PhonePattern, "<PHONE>")
  }

  /** PII-redaction audit over the corpus. The synthetic corpus carries
    * no real PII, so the query plants a deterministic contact block
    * derived from `doc_id` into every document (both engines synthesize
    * the identical string), then redacts and reports per-source counts
    * of each PII class plus the net characters removed. The planted
    * block exercises all three patterns adjacent to each other; the
    * original `text` is still scanned, so any pattern-shaped content in
    * a real corpus is counted the same way.
    *
    * Scale: stateless per-row rewrite + one partial agg on `source` —
    * the cheapest possible shape; regex cost is linear in bytes scanned.
    */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val dirty = concat(
      col("text"), lit(" contact doc"), col("doc_id"),
      lit("@mail"), pmod(col("doc_id"), lit(7L)), lit(".example.org tel 555-"),
      lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
      lit(" from 10."), pmod(col("doc_id"), lit(256L)), lit(".0."),
      pmod(col("doc_id"), lit(250L)))
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), dirty.as("dirty"))
      .select(col("source"), col("dirty"), redactPii(col("dirty")).as("clean"),
        size(regexp_extract_all(col("dirty"), lit(EmailPattern), lit(0))).cast("long").as("emails"),
        size(regexp_extract_all(regexp_replace(col("dirty"), lit(EmailPattern), lit("<EMAIL>")),
          lit(Ipv4Pattern), lit(0))).cast("long").as("ips"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("emails")).as("emails"),
        sum(col("ips")).as("ips"),
        sum(length(col("dirty")) - length(col("clean"))).cast("long").as("chars_removed"))
      .orderBy(col("source"))
  }

  def piiRedactSql: String =
    """WITH dirty AS (
      |  SELECT source,
      |    text || ' contact doc' || doc_id || '@mail' || (doc_id % 7)
      |      || '.example.org tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      || ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 250) AS dirty
      |  FROM documents
      |), scrubbed AS (
      |  SELECT source, dirty,
      |    regexp_replace(regexp_replace(regexp_replace(dirty,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
      |      '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS clean,
      |    len(regexp_extract_all(dirty,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS emails,
      |    len(regexp_extract_all(regexp_replace(dirty,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS ips
      |  FROM dirty
      |)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(emails) AS BIGINT) AS emails, CAST(sum(ips) AS BIGINT) AS ips,
      |  CAST(sum(len(dirty) - len(clean)) AS BIGINT) AS chars_removed
      |FROM scrubbed GROUP BY source ORDER BY source""".stripMargin

  /** Length-bucketed batching analysis — the measurement that motivates
    * length-grouped batching over naive fixed-length padding: bucket
    * every document by its token count into power-of-two capacity
    * classes (≤16, ≤32, ≤64, ≤128, else 256 — the corpus tops out at
    * ~100 whitespace tokens) and report, per bucket, how many PAD
    * tokens a batcher that pads to the bucket capacity would emit,
    * as basis points of the padded stream. A pipeline reads this to
    * choose bucket boundaries before packing GPU batches.
    *
    * Everything is integer (token counts, capacities, basis points via
    * truncating division), so the oracle comparison is exact.
    *
    * Scale: one scan, per-row arithmetic, then a 5-group hash agg —
    * map-side partials collapse to one row per bucket per partition. */
  def packEfficiency(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = wsTokens
    val cap = when(tok <= 16, 16L).when(tok <= 32, 32L)
      .when(tok <= 64, 64L).when(tok <= 128, 128L).otherwise(256L)
    Tables.documents(spark, sfDir)
      .select(cap.as("bucket_cap"), tok.as("n_tokens"))
      .groupBy(col("bucket_cap"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("bucket_cap") - col("n_tokens")).as("pad_tokens"))
      .select(col("bucket_cap"), col("n_docs"), col("sum_tokens"), col("pad_tokens"),
        expr("(pad_tokens * 10000) DIV (bucket_cap * n_docs)").as("waste_bp"))
      .orderBy(col("bucket_cap"))
  }

  /** The CURATION FUNNEL — the whole training-data pipeline's
    * admission accounting in one oracle-checked query: every document
    * gets a per-stage verdict computed ON THE FULL CORPUS (quality
    * decile, exact-duplicate, LSH near-duplicate, benchmark
    * contamination — each reusing the exact formulation its own
    * oracle-green query proves), verdicts apply in fixed order, and
    * the output is one row per stage with surviving docs + tokens.
    * This is the report every large-scale curation run publishes
    * ("started with N docs / M tokens, quality cut X%, dedup cut
    * Y%, ...").
    *
    * Scale: four verdict columns = the union of the component
    * pipelines' shapes (no new joins beyond two id-keyed left joins of
    * model-sized drop lists — the near-dup pair table is the shared
    * persisted artifact); the funnel itself is ONE pass with a
    * conditional-sum agg. */
  /** The per-doc verdict frame [[curationFunnel]] aggregates: every
    * document with its `first_fail` stage (99 = survivor). Exposed so
    * the keep SET is materializable — [[curationKeepSet]] filters it,
    * and the E2E curation spec chains the survivors into the
    * split/alloc/sample/pack stages. */
  private[graft] def curationFlags(spark: SparkSession, sfDir: String,
      minDecile: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val nearDrop = Dedup.nearDupPairTable(spark, sfDir)
      .select(col("doc_b").as("doc_id")).distinct().withColumn("near_dup", lit(1))
    val contam = Dedup.decontaminate(spark, sfDir)
      .select(col("doc_id")).distinct().withColumn("contaminated", lit(1))
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("decile", Text.qualityDecile)
      // min-id survivor per fingerprint; window PARTITION BY groups
      // NULL fingerprints together in both engines (unlike an equi
      // join, which would drop them)
      .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .join(nearDrop, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("first_fail",
        when(col("decile") < minDecile, 1)
          .when(col("doc_id") =!= col("keep_id"), 2)
          .when(col("near_dup") === 1, 3)
          .when(col("contaminated") === 1, 4)
          .otherwise(99))
  }

  /** The funnel's survivor set as corpus rows — what actually ships
    * to the mixing/splitting/packing stages. Same verdicts as
    * [[curationFunnel]] (shared [[curationFlags]]), so the report's
    * last stage counts THIS frame exactly. */
  def curationKeepSet(spark: SparkSession, sfDir: String,
      minDecile: Int = 2): DataFrame =
    curationFlags(spark, sfDir, minDecile)
      .filter(col("first_fail") === 99)
      .select(Tables.documents(spark, sfDir).columns.map(col): _*)

  def curationFunnel(spark: SparkSession, sfDir: String,
      minDecile: Int = 2): DataFrame = {
    val flagged = curationFlags(spark, sfDir, minDecile)
    val sums = (0 to 4).flatMap(i => Seq(
      sum(when(col("first_fail") > i, 1L).otherwise(0L)).as(s"d$i"),
      sum(when(col("first_fail") > i, col("n_tokens")).otherwise(0L)).as(s"t$i")))
    val agg = flagged.agg(sums.head, sums.tail: _*)
    val stages = Seq("raw", "quality", "exact_dedup", "near_dedup", "decontaminated")
    agg.select(explode(array((0 to 4).map(i =>
        struct(lit(i).as("stage_no"), lit(stages(i)).as("stage"),
          col(s"d$i").as("n_docs"), col(s"t$i").as("n_tokens"))): _*)).as("s"))
      .select(col("s.stage_no"), col("s.stage"), col("s.n_docs"), col("s.n_tokens"))
      .orderBy(col("stage_no"))
  }

  /** Oracle twin of [[curationFunnel]] — composed from the SAME SQL
    * fragments the component queries' green oracles use
    * ([[Text.qualityDecileSqlExpr]], [[Graph.nearDupEdgesCteSql]],
    * [[Dedup.contaminatedCteSql]]), `minDecile` interpolated. */
  def curationFunnelSql(minDecile: Int = 2): String = {
    val unions = Seq("raw", "quality", "exact_dedup", "near_dedup", "decontaminated")
      .zipWithIndex.map { case (name, i) =>
        s"SELECT $i AS stage_no, '$name' AS stage, CAST(d$i AS BIGINT) AS n_docs, CAST(t$i AS BIGINT) AS n_tokens FROM agg"
      }.mkString("\n  UNION ALL ")
    val sums = (0 to 4).map(i =>
      s"sum(CASE WHEN first_fail > $i THEN 1 ELSE 0 END) AS d$i, " +
        s"sum(CASE WHEN first_fail > $i THEN n_tokens ELSE 0 END) AS t$i").mkString(",\n    ")
    s"""WITH ${Graph.nearDupEdgesCteSql},
       |${Dedup.contaminatedCteSql},
       |ndrop AS (SELECT DISTINCT dst AS doc_id FROM edges WHERE src < dst),
       |keepers AS (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
       |  FROM documents),
       |flags AS (
       |  SELECT d.doc_id,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |    CASE WHEN (${Text.qualityDecileSqlExpr}) < $minDecile THEN 1
       |         WHEN d.doc_id <> k.keep_id THEN 2
       |         WHEN nd.doc_id IS NOT NULL THEN 3
       |         WHEN c.doc_id IS NOT NULL THEN 4
       |         ELSE 99 END AS first_fail
       |  FROM documents d
       |  JOIN keepers k USING (doc_id)
       |  LEFT JOIN ndrop nd USING (doc_id)
       |  LEFT JOIN contaminated c USING (doc_id)),
       |agg AS (
       |  SELECT
       |    $sums
       |  FROM flags)
       |SELECT * FROM (
       |  $unions)
       |ORDER BY stage_no""".stripMargin
  }

  def packEfficiencySql: String =
    """WITH sized AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(CASE WHEN len(string_split(text, ' ')) <= 16 THEN 16
      |              WHEN len(string_split(text, ' ')) <= 32 THEN 32
      |              WHEN len(string_split(text, ' ')) <= 64 THEN 64
      |              WHEN len(string_split(text, ' ')) <= 128 THEN 128
      |              ELSE 256 END AS BIGINT) AS bucket_cap
      |  FROM documents)
      |SELECT bucket_cap, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |  CAST(sum(bucket_cap - n_tokens) AS BIGINT) AS pad_tokens,
      |  CAST(sum(bucket_cap - n_tokens) * 10000 // (bucket_cap * count(*)) AS BIGINT) AS waste_bp
      |FROM sized
      |GROUP BY bucket_cap
      |ORDER BY bucket_cap""".stripMargin

  // --------------------------------------------------------------------
  // Train/val/test split
  // --------------------------------------------------------------------

  /** Deterministic train/val/test split with per-(split, source)
    * admission accounting — the last gate before a corpus ships to a
    * trainer. The split decision is a pure function of the document id
    * (md5-prefix of `"split:" <> doc_id` mapped to a centile), so it is
    * reproducible across engines, runs and cluster sizes, and docs
    * added later cannot move earlier docs between splits (the property
    * that keeps eval sets stable as a corpus grows — hashing CONTENT
    * would reshuffle splits whenever a doc is edited).
    *
    * Split bounds: centile < 80 → train, < 90 → val, else test.
    *
    * Scale: a stateless per-row classification followed by one partial-
    * aggregated groupBy on (split, source) — one shuffle of a
    * #splits × #sources-row frame; nothing here is corpus-sized. */
  def dataSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val centile = conv(substring(md5(concat(lit("split:"), col("doc_id"))), 1, 8), 16, 10)
      .cast("long") % lit(100L)
    Tables.documents(spark, sfDir)
      .select(col("source"), wsTokens.as("n_tokens"),
        when(centile < 80, lit("train"))
          .when(centile < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("split"), col("source"))
  }

  def dataSplitSql: String =
    """WITH tagged AS (
      |  SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CASE WHEN ('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT % 100 < 80
      |           THEN 'train'
      |         WHEN ('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT % 100 < 90
      |           THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents)
      |SELECT split, source, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      |FROM tagged
      |GROUP BY split, source
      |ORDER BY split, source""".stripMargin

  /** Split-leakage audit: after [[dataSplit]] carves the corpus, how
    * much TEST content is still reachable from TRAIN verbatim? Each
    * test doc counts the distinct shingles it shares with the train
    * side's shingle set (the [[Dedup.decontaminate]] machinery pointed
    * at the split instead of an external eval suite — id-hash splits
    * do NOT decontaminate: near-identical docs land in different
    * splits unless near-dedup ran first); a doc sharing ≥ `minShared`
    * is leaky, rolled up per source in ppm. This is the audit that
    * says whether a held-out perplexity number can be trusted.
    *
    * Scale: the train side collapses to its distinct shingle set and
    * the test is an equi-join into it — the decontamination shape,
    * never doc×doc; the split tags are stateless row functions. */
  def splitLeakage(spark: SparkSession, sfDir: String,
      minShared: Long = 3): DataFrame = {
    val centile = conv(substring(md5(concat(lit("split:"), col("doc_id"))), 1, 8), 16, 10)
      .cast("long") % lit(100L)
    val docs = Tables.documents(spark, sfDir).withColumn("c", centile)
    val trainSh = Dedup.shingleSetOf(docs.filter(col("c") < 80))
      .select(col("sh")).distinct()
    val testSh = Dedup.shingleSetOf(docs.filter(col("c") >= 90))
    val shared = testSh.join(trainSh, Seq("sh"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    docs.filter(col("c") >= 90).select(col("doc_id"), col("source"))
      .join(shared, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_test_docs"),
        sum(when(coalesce(col("n_shared"), lit(0L)) >= minShared, 1L).otherwise(0L))
          .as("n_leaky"))
      .withColumn("leaky_ppm", expr("(n_leaky * 1000000) DIV n_test_docs"))
      .orderBy(col("source"))
  }

  /** Oracle twin of [[splitLeakage]] — `minShared` interpolated; the
    * shingle expression is the shared [[Dedup.ShinglesSqlDuck]]. */
  def splitLeakageSql(minShared: Long = 3): String =
    s"""WITH sp AS (
       |  SELECT doc_id, source, text,
       |    ('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT % 100 AS c
       |  FROM documents),
       |tr AS (
       |  SELECT DISTINCT sh FROM (
       |    SELECT unnest(${Dedup.ShinglesSqlDuck}) AS sh FROM sp WHERE c < 80)
       |  WHERE sh IS NOT NULL),
       |te AS (
       |  SELECT DISTINCT doc_id, sh FROM (
       |    SELECT doc_id, unnest(${Dedup.ShinglesSqlDuck}) AS sh FROM sp WHERE c >= 90)
       |  WHERE sh IS NOT NULL),
       |shared AS (
       |  SELECT doc_id, count(*) AS n_shared FROM te JOIN tr USING (sh) GROUP BY doc_id)
       |SELECT source, count(*) AS n_test_docs,
       |  CAST(sum(CASE WHEN coalesce(n_shared, 0) >= $minShared THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_leaky,
       |  CAST(CAST(sum(CASE WHEN coalesce(n_shared, 0) >= $minShared THEN 1 ELSE 0 END)
       |            AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT) AS BIGINT) AS leaky_ppm
       |FROM sp LEFT JOIN shared USING (doc_id)
       |WHERE c >= 90
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** Near-dup pairs that CROSS the train/val/test split — the sibling
    * audit to [[splitLeakage]]: that one catches VERBATIM train→test
    * shingle overlap, this one catches near-duplicate cohorts that the
    * id-hash split scattered across splits (two 0.5-jaccard variants
    * of one page, one in train and one in test, quietly turn held-out
    * perplexity into memorization credit). Output is the split×split
    * pair matrix in canonical order (train ≤ val ≤ test): the
    * off-diagonal cells are the contamination; (train, test) is the
    * cell that must be ~0 before an eval number is quotable.
    *
    * Scale: probes the shared persisted pair table
    * ([[Dedup.nearDupPairTable]] — built once per corpus) with two
    * doc_id equi-joins of the stateless split tags; the matrix agg is
    * ≤ 9 rows at any corpus size.
    */
  def crossSplitDups(spark: SparkSession, sfDir: String): DataFrame = {
    val centile = conv(substring(md5(concat(lit("split:"), col("doc_id"))), 1, 8), 16, 10)
      .cast("long") % lit(100L)
    // 0 = train, 1 = val, 2 = test: rank order makes the pair label
    // canonical with least/greatest
    val rank = when(centile < 80, lit(0L)).when(centile < 90, lit(1L)).otherwise(lit(2L))
    val tags = Tables.documents(spark, sfDir).select(col("doc_id"), rank.as("r"))
    val name = (c: Column) => when(c === 0L, lit("train"))
      .when(c === 1L, lit("val")).otherwise(lit("test"))
    Dedup.nearDupPairTable(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
      .join(tags.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("r", "ra"), Seq("doc_a"))
      .join(tags.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("r", "rb"), Seq("doc_b"))
      .select(name(least(col("ra"), col("rb"))).as("split_a"),
        name(greatest(col("ra"), col("rb"))).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("split_a"), col("split_b"))
  }

  /** Oracle twin of [[crossSplitDups]] — the pair CTE is the SAME SQL
    * fragment every LSH oracle uses ([[Graph.nearDupEdgesCteSql]]
    * defines `pairs`), the split hash the same as [[dataSplitSql]]. */
  def crossSplitDupsSql: String =
    s"""WITH ${Graph.nearDupEdgesCteSql},
       |tags AS (
       |  SELECT doc_id,
       |    CASE WHEN ('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT % 100 < 80 THEN 0
       |         WHEN ('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT % 100 < 90 THEN 1
       |         ELSE 2 END AS r
       |  FROM documents),
       |labeled AS (
       |  SELECT
       |    CASE least(ta.r, tb.r) WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END AS split_a,
       |    CASE greatest(ta.r, tb.r) WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END AS split_b
       |  FROM pairs p
       |  JOIN tags ta ON p.doc_a = ta.doc_id
       |  JOIN tags tb ON p.doc_b = tb.doc_id)
       |SELECT split_a, split_b, count(*) AS n_pairs
       |FROM labeled
       |GROUP BY split_a, split_b
       |ORDER BY split_a, split_b""".stripMargin

  // --------------------------------------------------------------------
  // Epoch shuffle (deterministic corpus permutation -> shards)
  // --------------------------------------------------------------------

  /** Deterministic epoch shuffle: a seeded pseudo-random permutation of
    * the corpus materialized as `shards` training shards — how a
    * distributed loader randomizes example order without ever holding a
    * global sort. Each doc hashes to a shard (`h % shards`) and takes a
    * position within its shard by ranking on the same hash — i.e. the
    * permutation IS the distributed shuffle: hash-bucket, then sort
    * within bucket only. Changing `seed` yields an unrelated
    * permutation for the next epoch.
    *
    * Output is the per-shard manifest a loader would consume: example
    * and token counts plus `perm_check`, an order-sensitive checksum
    * (Σ position·(doc_id mod 1000003)) that pins the exact within-shard
    * ordering — a green oracle run proves both engines derived the SAME
    * permutation, not merely the same shard sizes.
    *
    * Scale: one hash shuffle into `shards` groups and a per-shard sort
    * (the window is PARTITIONED — no global single-task sort anywhere);
    * at 100 TB each shard sorts ~corpus/shards, and `shards` is chosen
    * to make that a comfortable per-task unit. */
  def epochShuffle(spark: SparkSession, sfDir: String,
      seed: Int = 1, shards: Int = 8): DataFrame = {
    val h = conv(substring(md5(concat(lit(s"epoch$seed:"), col("doc_id"))), 1, 8), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), wsTokens.as("n_tokens"), h.as("h"))
      .withColumn("shard", col("h") % lit(shards.toLong))
      .withColumn("pos", row_number().over(w).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("pos") * (col("doc_id") % lit(1000003L))).as("perm_check"))
      .orderBy(col("shard"))
  }

  /** Materializes the [[epochShuffle]] permutation as the training
    * artifact itself: shard-partitioned parquet, each row carrying its
    * within-shard position, position-ordered on disk — a loader
    * streams shard k sequentially with zero further shuffling. The
    * manifest query ([[epochShuffle]]) and this writer derive the
    * permutation from the same hash, so the manifest IS the written
    * layout's index.
    *
    * ONE shuffle: the position window's required distribution (hash by
    * shard) and ordering (shard, h, doc_id) are exactly the layout the
    * writer needs — (h, doc_id) order IS pos order, and the write's
    * required partition-column ordering is a satisfied prefix — so no
    * repartition/sort is added after the window ([[epochShardFrame]]
    * plan pinned to one exchange by PlanAuditSpec). Parallelism scales
    * with the shard count, which a loader sets >= cluster cores. */
  def writeEpochShards(spark: SparkSession, sfDir: String, outDir: String,
      seed: Int = 1, shards: Int = 8): Unit =
    epochShardFrame(spark, sfDir, seed, shards)
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** The frame [[writeEpochShards]] writes, exposed for plan audit. */
  def epochShardFrame(spark: SparkSession, sfDir: String,
      seed: Int = 1, shards: Int = 8): DataFrame = {
    val h = conv(substring(md5(concat(lit(s"epoch$seed:"), col("doc_id"))), 1, 8), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .withColumn("h", h)
      .withColumn("shard", col("h") % lit(shards.toLong))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("pos"), col("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
  }

  /** Oracle twin of [[epochShuffle]] — seed/shards interpolated so a
    * non-default call cannot silently break parity. */
  def epochShuffleSql(seed: Int = 1, shards: Int = 8): String =
    s"""WITH hashed AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    ('0x' || substr(md5('epoch$seed:' || doc_id), 1, 8))::BIGINT AS h
       |  FROM documents),
       |placed AS (
       |  SELECT doc_id, n_tokens, h % $shards AS shard,
       |    CAST(row_number() OVER (PARTITION BY h % $shards ORDER BY h, doc_id) AS BIGINT) AS pos
       |  FROM hashed)
       |SELECT shard, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(sum(pos * (doc_id % 1000003)) AS BIGINT) AS perm_check
       |FROM placed
       |GROUP BY shard
       |ORDER BY shard""".stripMargin

  // --------------------------------------------------------------------
  // k-anonymity audit (the privacy sibling of the PII scrub)
  // --------------------------------------------------------------------

  /** k-anonymity audit over the customer dimension: group rows by
    * their quasi-identifier tuple (nation, market segment, account
    * balance in 1000-unit bands — the attributes an adversary can
    * LINK, as opposed to the direct identifiers [[piiRedact]] scrubs)
    * and report, per segment: the attained k (the smallest group a
    * segment member hides in), groups under the k=5 policy threshold,
    * and the row mass that would need suppression or coarser banding
    * before release. Sweeney's k-anonymity measure as a relational
    * audit — the release gate a training-data pipeline runs on any
    * structured side table it ships with a corpus.
    *
    * Engine parity: the balance band uses `floor(bal / 1000)` — PLAIN
    * floor on doubles, identical in both engines even for the negative
    * TPC-H balances (integer DIV would truncate toward zero in Spark
    * and floor in DuckDB, disagreeing on negatives).
    *
    * Scale: one hash agg on the QI tuple (map-side combined), then a
    * segment-sized rollup — no joins, no windows. */
  def kAnonymity(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val groups = Tables.customer(spark, sfDir)
      .select(col("c_mktsegment").as("segment"), col("c_nationkey").as("nation"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      .groupBy(col("segment"), col("nation"), col("bal_band"))
      .agg(count(lit(1)).as("n"))
    groups.groupBy(col("segment"))
      .agg(sum(col("n")).cast("long").as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("n")).as("k_anonymity"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("small_groups"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("suppressed_rows"))
      .withColumn("suppressed_ppm", expr("(suppressed_rows * 1000000) DIV n_rows"))
      .orderBy(col("segment"))
  }

  /** Oracle twin of [[kAnonymity]] — `k` interpolated. */
  def kAnonymitySql(k: Int = 5): String =
    s"""WITH groups AS (
       |  SELECT c_mktsegment AS segment, c_nationkey AS nation,
       |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM customer
       |  GROUP BY 1, 2, 3
       |)
       |SELECT segment, CAST(sum(n) AS BIGINT) AS n_rows,
       |  count(*) AS n_groups,
       |  CAST(min(n) AS BIGINT) AS k_anonymity,
       |  CAST(sum(CASE WHEN n < $k THEN 1 ELSE 0 END) AS BIGINT) AS small_groups,
       |  CAST(sum(CASE WHEN n < $k THEN n ELSE 0 END) AS BIGINT) AS suppressed_rows,
       |  CAST(CAST(sum(CASE WHEN n < $k THEN n ELSE 0 END) AS BIGINT) * 1000000
       |       // CAST(sum(n) AS BIGINT) AS BIGINT) AS suppressed_ppm
       |FROM groups
       |GROUP BY segment
       |ORDER BY segment""".stripMargin

  /** l-diversity audit — k-anonymity's necessary complement (Machanavajjhala
    * et al., "l-Diversity: Privacy Beyond k-Anonymity", ICDE 2006): a
    * group can be large (k-anonymous) yet HOMOGENEOUS in its sensitive
    * attribute, so membership alone discloses it. Here the
    * quasi-identifier tuple is (nation, balance band) and the
    * sensitive attribute is the market segment; per nation: the
    * attained l (min distinct sensitive values over its QI groups),
    * groups below the l-threshold, and the row mass exposed to
    * attribute disclosure. Distinct-l (not entropy-l) keeps every
    * quantity an exact integer.
    *
    * Scale: one (QI, sensitive) hash agg, one QI rollup, one
    * nation-sized rollup — map-side combined, no joins, no windows. */
  def lDiversity(spark: SparkSession, sfDir: String, l: Int = 2): DataFrame = {
    val groups = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").as("nation"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"),
        col("c_mktsegment").as("segment"))
      .groupBy(col("nation"), col("bal_band"))
      .agg(count(lit(1)).as("n"), countDistinct(col("segment")).as("l"))
    groups.groupBy(col("nation"))
      .agg(sum(col("n")).cast("long").as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("l")).cast("long").as("l_diversity"),
        sum(when(col("l") < l, 1L).otherwise(0L)).as("weak_groups"),
        sum(when(col("l") < l, col("n")).otherwise(0L)).as("exposed_rows"))
      .withColumn("exposed_ppm", expr("(exposed_rows * 1000000) DIV n_rows"))
      .orderBy(col("nation"))
  }

  /** Oracle twin of [[lDiversity]] — `l` interpolated. */
  def lDiversitySql(l: Int = 2): String =
    s"""WITH groups AS (
       |  SELECT c_nationkey AS nation,
       |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l
       |  FROM customer
       |  GROUP BY 1, 2
       |)
       |SELECT nation, CAST(sum(n) AS BIGINT) AS n_rows,
       |  count(*) AS n_groups,
       |  CAST(min(l) AS BIGINT) AS l_diversity,
       |  CAST(sum(CASE WHEN l < $l THEN 1 ELSE 0 END) AS BIGINT) AS weak_groups,
       |  CAST(sum(CASE WHEN l < $l THEN n ELSE 0 END) AS BIGINT) AS exposed_rows,
       |  CAST(CAST(sum(CASE WHEN l < $l THEN n ELSE 0 END) AS BIGINT) * 1000000
       |       // CAST(sum(n) AS BIGINT) AS BIGINT) AS exposed_ppm
       |FROM groups
       |GROUP BY nation
       |ORDER BY nation""".stripMargin

  /** t-closeness audit — the third rung of the privacy ladder (Li,
    * Li & Venkatasubramanian, "t-Closeness: Privacy Beyond
    * k-Anonymity and l-Diversity", ICDE 2007): a group can be large
    * (k) and varied (l) yet still SKEWED toward one sensitive value
    * relative to the corpus, so membership shifts an attacker's
    * prior. For the unordered categorical sensitive attribute the
    * ground distance is uniform, making EMD the total-variation
    * distance ½·Σ_s |p_s − q_s| between the group's segment
    * distribution p and the global distribution q. Every comparison
    * stays EXACT: the per-segment term |n_gs·N − N_s·n_g| is an
    * integer cross-multiplication, summed in BIGINT, and divided by
    * 2·n_g·N only once, as ppm integer division — no engine can
    * round a group across the threshold differently.
    *
    * Scale: two hash aggs over the corpus (cells, then groups as a
    * re-agg of cells), a 5-row broadcast of the global marginal, and
    * a group-sized grid join — nothing downstream of the first agg
    * touches row-level data. */
  def tCloseness(spark: SparkSession, sfDir: String, tPpm: Long = 200000L): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").as("nation"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"),
        col("c_mktsegment").as("segment"))
    val global = cust.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_seg"))
      .withColumn("n_total",
        sum(col("n_seg")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
    val cells = cust.groupBy(col("nation"), col("bal_band"), col("segment"))
      .agg(count(lit(1)).as("n_gs"))
    val groups = cells.groupBy(col("nation"), col("bal_band"))
      .agg(sum(col("n_gs")).cast("long").as("n_g"))
    val grid = groups.join(broadcast(global))
      .join(cells, Seq("nation", "bal_band", "segment"), "left")
      .na.fill(0L, Seq("n_gs"))
    val perGroup = grid.groupBy(col("nation"), col("bal_band"))
      .agg(max(col("n_g")).as("n_g"), max(col("n_total")).as("n_total"),
        sum(abs(col("n_gs") * col("n_total") - col("n_seg") * col("n_g")))
          .cast("long").as("dist_num"))
      .withColumn("t_ppm", expr("(dist_num * 1000000) DIV (2 * n_g * n_total)"))
    perGroup.groupBy(col("nation"))
      .agg(sum(col("n_g")).cast("long").as("n_rows"),
        count(lit(1)).as("n_groups"),
        max(col("t_ppm")).cast("long").as("t_max_ppm"),
        sum(when(col("t_ppm") > tPpm, 1L).otherwise(0L)).as("weak_groups"),
        sum(when(col("t_ppm") > tPpm, col("n_g")).otherwise(0L)).as("exposed_rows"))
      .orderBy(col("nation"))
  }

  /** Oracle twin of [[tCloseness]] — `tPpm` interpolated. */
  def tClosenessSql(tPpm: Long = 200000L): String =
    s"""WITH cust AS (
       |  SELECT c_nationkey AS nation,
       |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
       |    c_mktsegment AS segment
       |  FROM customer),
       |marg AS (
       |  SELECT segment, CAST(count(*) AS BIGINT) AS n_seg,
       |    CAST(sum(count(*)) OVER () AS BIGINT) AS n_total
       |  FROM cust GROUP BY 1),
       |cells AS (
       |  SELECT nation, bal_band, segment, CAST(count(*) AS BIGINT) AS n_gs
       |  FROM cust GROUP BY 1, 2, 3),
       |groups AS (
       |  SELECT nation, bal_band, CAST(sum(n_gs) AS BIGINT) AS n_g
       |  FROM cells GROUP BY 1, 2),
       |grid AS (
       |  SELECT g.nation, g.bal_band, g.n_g, gl.n_seg, gl.n_total,
       |    COALESCE(c.n_gs, 0) AS n_gs
       |  FROM groups g CROSS JOIN marg gl
       |  LEFT JOIN cells c ON c.nation = g.nation AND c.bal_band = g.bal_band
       |    AND c.segment = gl.segment),
       |pg AS (
       |  SELECT nation, bal_band, max(n_g) AS n_g,
       |    CAST(sum(abs(n_gs * n_total - n_seg * n_g)) AS BIGINT) * 1000000
       |      // (2 * max(n_g) * max(n_total)) AS t_ppm
       |  FROM grid GROUP BY 1, 2)
       |SELECT nation, CAST(sum(n_g) AS BIGINT) AS n_rows, count(*) AS n_groups,
       |  CAST(max(t_ppm) AS BIGINT) AS t_max_ppm,
       |  CAST(sum(CASE WHEN t_ppm > $tPpm THEN 1 ELSE 0 END) AS BIGINT) AS weak_groups,
       |  CAST(sum(CASE WHEN t_ppm > $tPpm THEN n_g ELSE 0 END) AS BIGINT) AS exposed_rows
       |FROM pg
       |GROUP BY nation
       |ORDER BY nation""".stripMargin

  /** Differentially-private release of the event-type histogram — the
    * fourth rung of the privacy ladder (k-anonymity / l-diversity /
    * t-closeness audit what a release EXPOSES; DP bounds what any
    * release can REVEAL): each cell's true count gets Laplace(1/ε)
    * noise (Dwork et al., TCC 2006 — per-cell sensitivity of a
    * disjoint histogram under add/remove of one event is 1, so one ε
    * covers the whole table by parallel composition).
    *
    * Determinism for the oracle gate: the noise draw is SEEDED, not
    * `rand()` — u = (h + 0.5) / 2^48 with h the first 48 bits of
    * md5(event_type) (never exactly 0, ½, or 1), pushed through the
    * Laplace inverse CDF −b·sign(u−½)·ln(1−2·|u−½|). The ONE double
    * expression is rounded once to e6 (`noise_e6`); the released count
    * `n_noisy_e6 = n_true·10⁶ + noise_e6` stays exact BIGINT — no
    * integer division anywhere, so the negative-value floor/truncate
    * divergence can't bite. (A production release would key the seed
    * off a secret; the MECHANISM — sensitivity, inverse CDF, exact
    * integer accounting — is the surface under test, the
    * [[graft.ops.Multimodal]] FakeCodec discipline.)
    *
    * Scale: one map-side-combined hash agg over events; the noise is a
    * per-GROUP scalar expression. Nothing else touches row data. */
  def dpCounts(spark: SparkSession, sfDir: String, epsilonPpm: Long = 500000L): DataFrame = {
    val u = (conv(substring(md5(col("event_type")), 1, 12), 16, 10).cast("double")
      + lit(0.5)) / lit(281474976710656.0) // 2^48
    val b = lit(1000000.0) / epsilonPpm // 1/ε
    val noise = -b * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("epsilon_ppm", lit(epsilonPpm))
      .withColumn("noise_e6", round(noise * 1e6).cast("long"))
      .withColumn("n_noisy_e6", col("n_true") * 1000000L + col("noise_e6"))
      .select(col("event_type"), col("n_true").cast("long").as("n_true"),
        col("epsilon_ppm"), col("noise_e6"), col("n_noisy_e6"))
      .orderBy(col("event_type"))
  }

  /** Oracle twin of [[dpCounts]] — same seeded inverse-CDF draw,
    * `epsilonPpm` interpolated. */
  def dpCountsSql(epsilonPpm: Long = 500000L): String = {
    val u = "((('0x' || substr(md5(event_type), 1, 12))::BIGINT + 0.5) / 281474976710656.0)"
    val noise = s"(-(1000000.0 / $epsilonPpm) * sign($u - 0.5) * ln(1.0 - 2.0 * abs($u - 0.5)))"
    s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n_true,
       |  CAST($epsilonPpm AS BIGINT) AS epsilon_ppm,
       |  CAST(round($noise * 1e6) AS BIGINT) AS noise_e6,
       |  CAST(count(*) * 1000000 + CAST(round($noise * 1e6) AS BIGINT) AS BIGINT) AS n_noisy_e6
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
  }

  // --------------------------------------------------------------------
  // Context-length planning (truncation-waste table)
  // --------------------------------------------------------------------

  /** Default context budgets for [[contextLenPlanner]]. */
  val ContextBudgets: Seq[Long] = Seq(512L, 1024L, 2048L, 4096L)

  /** The context-length decision table: for each candidate budget,
    * how many documents a truncate-at-budget policy cuts, the token
    * mass kept vs lost, and the loss in ppm — the complement of
    * [[packEfficiency]] (which prices PADDING for short docs, while
    * this prices TRUNCATION for long ones; together they bracket the
    * context-length choice). One row per budget.
    *
    * Scale: doc lengths are a stateless projection; the budget
    * explode multiplies rows by |budgets| (4), and the agg combines
    * map-side into |budgets| cells. Pure integers throughout. */
  def contextLenPlanner(spark: SparkSession, sfDir: String,
      budgets: Seq[Long] = ContextBudgets): DataFrame =
    Tables.documents(spark, sfDir)
      .select(wsTokens.as("len"))
      .select(col("len"), explode(array(budgets.map(lit): _*)).as("budget"))
      .groupBy(col("budget"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("len") > col("budget"), 1L).otherwise(0L)).as("n_truncated"),
        sum(least(col("len"), col("budget"))).as("tokens_kept"),
        sum(greatest(col("len") - col("budget"), lit(0L))).as("tokens_lost"))
      .withColumn("loss_ppm",
        expr("tokens_lost * 1000000 DIV (tokens_kept + tokens_lost)"))
      .orderBy(col("budget"))

  /** Oracle twin of [[contextLenPlanner]] — budgets interpolated. */
  def contextLenPlannerSql(budgets: Seq[Long] = ContextBudgets): String =
    s"""WITH lens AS (
       |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS len FROM documents),
       |x AS (
       |  SELECT len, unnest([${budgets.mkString("::BIGINT, ")}::BIGINT]) AS budget
       |  FROM lens)
       |SELECT budget, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN len > budget THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
       |  CAST(sum(least(len, budget)) AS BIGINT) AS tokens_kept,
       |  CAST(sum(greatest(len - budget, 0)) AS BIGINT) AS tokens_lost,
       |  CAST(CAST(sum(greatest(len - budget, 0)) AS BIGINT) * 1000000 //
       |    (CAST(sum(least(len, budget)) AS BIGINT) +
       |     CAST(sum(greatest(len - budget, 0)) AS BIGINT)) AS BIGINT) AS loss_ppm
       |FROM x
       |GROUP BY budget
       |ORDER BY budget""".stripMargin

  // --------------------------------------------------------------------
  // Blocklist phrase filter: content-safety admission over the corpus
  // --------------------------------------------------------------------

  /** The demonstration blocklist — mixed 2- and 3-token phrases. A
    * production deployment swaps in its policy list (thousands of
    * phrases — the plan shape below is phrase-count-independent: the
    * list rides a broadcast join, never a per-phrase scan). */
  val Blocklist: Seq[String] = Seq(
    "key agg", "slow fast", "hash join", "big order scan", "small part order")

  /** Multi-phrase BLOCKLIST filter — the content-safety admission gate
    * next to [[redactPii]]: for every banned phrase, which documents
    * contain it verbatim (token-aligned) and how often. The report is
    * per (source, phrase): hit documents, total hits, and the
    * hit-document rate — what a policy owner reads before deciding
    * drop-vs-redact per source.
    *
    * Scale (the inverted-index shape, not a per-phrase scan): ONE
    * positional n-gram explode per DISTINCT phrase length (here 2 and
    * 3) feeds a hash join against the broadcast phrase list — cost is
    * O(corpus tokens × #lengths), independent of phrase count; a
    * LIKE-per-phrase plan would be O(corpus × phrases). Never doc×doc. */
  def blocklistFilter(spark: SparkSession, sfDir: String,
      blocklist: Seq[String] = Blocklist): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val totals = docs.groupBy(col("source")).agg(count(lit(1)).as("n_source_docs"))
    blocklistHitsOf(spark, docs, blocklist)
      .groupBy(col("source"), col("phrase"))
      .agg(countDistinct(col("doc_id")).cast("long").as("n_docs"),
        count(lit(1)).cast("long").as("n_hits"))
      .join(totals, Seq("source"))
      .withColumn("hit_docs_ppm", expr("(n_docs * 1000000) DIV n_source_docs"))
      .select(col("source"), col("phrase"), col("n_docs"), col("n_hits"),
        col("hit_docs_ppm"))
      .orderBy(col("source"), col("phrase"))
  }

  /** Per-occurrence (source, doc_id, phrase) hits of any (source,
    * doc_id, text) frame — package-visible for the alignment spec. */
  private[ops] def blocklistHitsOf(spark: SparkSession, docs: DataFrame,
      blocklist: Seq[String]): DataFrame = {
    import spark.implicits._
    val t = split(col("text"), " ")
    // the join key is xxhash64 of the TOKEN SLICE, not a built gram
    // string, and grams come from ZIPPED SHIFTED SLICES, never
    // `slice(t, i, k)` inside a transform lambda — CollapseProject
    // inlines the row's split() into the lambda and re-tokenizes the
    // document PER GRAM (the docRepetition pitfall; measured 44 s at
    // the 10x corpus, 2.7 s with the zip idiom). The slices are row
    // expressions evaluated once per document; the lambda touches only
    // element fields. Collision bound: grams x phrases pairs / 2^64 —
    // a collision would surface as a LOUD oracle hash mismatch (the
    // oracle matches strings), never a silent wrong admission.
    def kGramHashes(len: Int): Column = {
      val m = size(t) - (len - 1)
      if (len == 1) transform(t, x => xxhash64(array(x)))
      else {
        val zipped = arrays_zip((0 until len).map(j => slice(t, lit(j + 1), m)): _*)
        transform(zipped, x =>
          xxhash64(array((0 until len).map(j => x.getField(j.toString)): _*)))
      }
    }
    blocklist.groupBy(_.split(' ').length).toSeq.sortBy(_._1)
      .map { case (len, phrases) =>
        val grams = docs.select(col("source"), col("doc_id"),
          explode(when(size(t) >= len, kGramHashes(len))
            .otherwise(array().cast("array<bigint>"))).as("gh"))
        val pl = phrases.toDF("phrase")
          .select(col("phrase"), xxhash64(split(col("phrase"), " ")).as("ph"))
        grams.join(broadcast(pl), col("gh") === col("ph"))
          .select(col("source"), col("doc_id"), col("phrase"))
      }
      .reduce(_.unionByName(_))
  }

  /** Oracle twin of [[blocklistFilter]] — phrases interpolated as a
    * VALUES list, the same per-length token-aligned n-gram join. */
  def blocklistFilterSql(blocklist: Seq[String] = Blocklist): String = {
    val byLen = blocklist.groupBy(_.split(' ').length).toSeq.sortBy(_._1)
    val gramCtes = byLen.map { case (len, phrases) =>
      val vals = phrases.map(p => s"('${p}')").mkString(", ")
      s"""SELECT g.source, g.doc_id, p.phrase
         |  FROM (SELECT source, doc_id,
         |          array_to_string(t[i:i+${len - 1}], ' ') AS g
         |        FROM (SELECT source, doc_id, t,
         |                unnest(generate_series(1, len(t) - ${len - 1})) AS i
         |              FROM toks WHERE len(t) >= $len)) g
         |  JOIN (VALUES $vals) p(phrase) ON g.g = p.phrase""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH toks AS (SELECT source, doc_id, string_split(text, ' ') AS t FROM documents),
       |totals AS (SELECT source, CAST(count(*) AS BIGINT) AS n_source_docs
       |           FROM documents GROUP BY source),
       |hits AS (
       |  $gramCtes)
       |SELECT h.source, h.phrase,
       |  CAST(count(DISTINCT h.doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_hits,
       |  CAST(CAST(count(DISTINCT h.doc_id) AS BIGINT) * 1000000
       |    // t.n_source_docs AS BIGINT) AS hit_docs_ppm
       |FROM hits h JOIN totals t ON t.source = h.source
       |GROUP BY h.source, h.phrase, t.n_source_docs
       |ORDER BY h.source, h.phrase""".stripMargin
  }
}
