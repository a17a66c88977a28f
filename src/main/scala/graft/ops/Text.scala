package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis surface over `documents` (north-star extension,
  * SURVEY.md §2.2): per-document stats and quality scoring, term
  * frequencies, BPE-ish token counting, stopword-based language ID,
  * and content fingerprinting.
  *
  * Everything is per-row array math (no shuffle) or explode+agg (one
  * shuffle, map-side combined) — the shapes that stay linear at 100 TB
  * of documents. No UDFs: all expressions are codegen'd built-ins,
  * every one with a DuckDB-parity formulation for the oracle.
  */
object Text {

  private def tokens: Column = split(col("text"), " ")

  /** Chars of document head used to TRAIN bigram language profiles —
    * bounds [[langIdNgram]]'s per-doc explode regardless of bigram
    * diversity. Interpolated into the oracle SQL so the two sides
    * cannot drift. */
  val LangIdTrainPrefixChars: Int = 4096

  /** Per-doc token/char statistics + quality ratios: length, token
    * count, distinct-token ratio (lexical diversity), mean token
    * length. */
  def textStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars_computed"),
        size(tokens).cast("long").as("n_tokens"),
        size(array_distinct(tokens)).cast("long").as("n_distinct_tokens"),
        round(size(array_distinct(tokens)) / size(tokens).cast("double"), 4).as("distinct_ratio"),
        round((length(col("text")) - (size(tokens) - 1)) / size(tokens).cast("double"), 4).as("avg_token_len"))
      .orderBy(col("doc_id"))

  def textStatsSql: String =
    """SELECT doc_id, lang,
      |  CAST(length(text) AS BIGINT) AS n_chars_computed,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
      |  round(len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS distinct_ratio,
      |  round((length(text) - (len(string_split(text, ' ')) - 1)) / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS avg_token_len
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Corpus term frequencies: explode → count + doc frequency, top 20.
    * The explode fan-out is bounded by corpus token count; partial
    * aggregation collapses it map-side before the shuffle. */
  def termFreq(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(tokens).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(20)

  def termFreqSql: String =
    """SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token
      |ORDER BY tf DESC, token
      |LIMIT 20""".stripMargin

  /** Out-of-vocabulary rate per source — the tokenizer-coverage check
    * a training pipeline runs before committing to a vocab: the
    * corpus-global top-`vocabSize` tokens (ties broken by token, so
    * the vocab is deterministic) are the vocabulary; every token
    * outside it is OOV, reported per source in integer ppm.
    *
    * Scale: one explode + map-side-combined count builds the vocab
    * (top-K collect-free via TakeOrdered semantics of LIMIT); the
    * vocab is model-sized, so the membership join is a BROADCAST —
    * the corpus-sized side never shuffles for it. */
  def oovRate(spark: SparkSession, sfDir: String, vocabSize: Int = 20): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), explode(tokens).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token")).limit(vocabSize)
      .select(col("token"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      // n_tokens >= 1 by construction: explode drops NULL-text docs, so
      // a token-free source is ABSENT from the output (same as the
      // oracle's unnest) — the ppm division cannot see zero
      .withColumn("oov_ppm", expr("n_oov * 1000000 DIV n_tokens"))
      .orderBy(col("source"))
  }

  /** Vocabulary COVERAGE CURVE — the vocab-size decision table
    * completing [[oovRate]]'s single-K check and [[vocabGrowth]]'s
    * Heaps curve: for each candidate vocabulary size K, the fraction
    * of all corpus tokens covered by the K most frequent words
    * (rank ties broken lexically, so the cut is total-ordered on both
    * engines). The tokenizer-budget input: where the curve flattens
    * is where additional vocab stops paying.
    *
    * Scale: one tokenize+explode into word counts (map-side
    * combined). Only ranks ≤ max(ks) matter, so the ranking runs over
    * a TakeOrdered top-max(ks) SHORTLIST of the count table (the
    * distributed top-k — per-partition heads merged on the driver-
    * side-sized frame), never a global sort or an unpartitioned window
    * over the full vocabulary: at 100 TB the distinct-token table is
    * itself huge (Heaps' law plus junk tokens), and a vocab-sized
    * single-partition rank would be the one serial stage in the plan.
    * `n_total` comes from a plain aggregate over the same counts;
    * everything downstream is ≤ max(ks) rows. */
  def vocabCoverage(spark: SparkSession, sfDir: String,
      ks: Seq[Int] = Seq(4, 16, 64, 256, 1024)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, sfDir)
      .select(explode(tokens).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
    // orderBy+limit plans as TakeOrderedAndProject; the shortlist is
    // EXACTLY the top-max(ks) of the full table under the same total
    // order (tf desc, token), so ranks ≤ any k ∈ ks are unchanged
    val short = counts.orderBy(col("tf").desc, col("token")).limit(ks.max)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("tf").desc, col("token"))))
    val covCols = ks.map(k =>
      sum(when(col("rank") <= k, col("tf")).otherwise(0L)).as(s"cov_$k"))
    val covs = short.agg(covCols.head, covCols.tail: _*)
    val total = counts.agg(sum(col("tf")).as("n_total"))
    val sums = covs.crossJoin(total) // 1 row × 1 row
    val stacked = ks.map(k => s"${k}L, cov_$k").mkString(", ")
    sums.selectExpr("n_total", s"stack(${ks.size}, $stacked) AS (k, covered_tokens)")
      .select(col("k").cast("long"),
        col("covered_tokens").cast("long"),
        expr("(covered_tokens * 1000000) DIV n_total").as("covered_ppm"),
        expr("((n_total - covered_tokens) * 1000000) DIV n_total").as("oov_ppm"))
      .orderBy(col("k"))
  }

  /** Oracle twin of [[vocabCoverage]] — identical rank/tiebreak and
    * truncating ppm arithmetic, one UNION ALL branch per K. */
  def vocabCoverageSql(ks: Seq[Int] = Seq(4, 16, 64, 256, 1024)): String = {
    val branches = ks.map { k =>
      s"""SELECT CAST($k AS BIGINT) AS k,
         |  CAST(sum(CASE WHEN rank <= $k THEN tf ELSE 0 END) AS BIGINT) AS covered_tokens,
         |  CAST(CAST(sum(CASE WHEN rank <= $k THEN tf ELSE 0 END) AS BIGINT) * 1000000
         |    // CAST(sum(tf) AS BIGINT) AS BIGINT) AS covered_ppm,
         |  CAST((CAST(sum(tf) AS BIGINT) -
         |        CAST(sum(CASE WHEN rank <= $k THEN tf ELSE 0 END) AS BIGINT)) * 1000000
         |    // CAST(sum(tf) AS BIGINT) AS BIGINT) AS oov_ppm
         |FROM ranked""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |counts AS (SELECT token, count(*) AS tf FROM toks GROUP BY token),
       |ranked AS (
       |  SELECT tf, row_number() OVER (ORDER BY tf DESC, token) AS rank FROM counts)
       |$branches
       |ORDER BY k""".stripMargin
  }

  /** Oracle twin of [[oovRate]] — `vocabSize` interpolated. */
  def oovRateSql(vocabSize: Int = 20): String =
    s"""WITH toks AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
       |vocab AS (
       |  SELECT token FROM (
       |    SELECT token, count(*) AS tf FROM toks
       |    GROUP BY token ORDER BY tf DESC, token LIMIT $vocabSize)),
       |agg AS (
       |  SELECT source,
       |    CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
       |  FROM toks LEFT JOIN vocab v USING (token)
       |  GROUP BY source)
       |SELECT source, n_tokens, n_oov,
       |  CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_ppm
       |FROM agg
       |ORDER BY source""".stripMargin

  /** BPE-ish token counting: whitespace tokens plus regex subword
    * units (letter runs / digit runs / single other chars) — the
    * pre-tokenizer shape of BPE vocabularies, counted per language. */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("lang"),
        size(tokens).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("bpe_units"))
      .groupBy(col("lang"))
      .agg(sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("bpe_units")).as("total_bpe_units"),
        round(avg(col("bpe_units")), 4).as("avg_bpe_units"))
      .orderBy(col("lang"))

  def tokenCountsSql: String =
    """SELECT lang,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
      |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpe_units,
      |  round(avg(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))), 4) AS avg_bpe_units
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Stopword-hit language ID (n-gram-free heuristic): count hits from
    * tiny per-language stopword sets, argmax with deterministic
    * tie-break (en > es > de > fr), 'und' when nothing matches.
    * Classifier quality is measured against the labeled `lang` column. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    def score(words: Seq[String]): Column =
      size(filter(tokens, t => words.map(t === _).reduce(_ || _)))
    val en = score(Seq("the", "a", "of", "and"))
    val es = score(Seq("el", "la", "de", "los"))
    val de = score(Seq("der", "die", "das", "und"))
    val fr = score(Seq("le", "les", "et", "une"))
    val pred = when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), pred.as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  def langIdSql: String = {
    def score(words: Seq[String]): String =
      s"len(list_filter(string_split(text, ' '), t -> ${words.map(w => s"t = '$w'").mkString(" OR ")}))"
    val (en, es, de, fr) = (
      score(Seq("the", "a", "of", "and")), score(Seq("el", "la", "de", "los")),
      score(Seq("der", "die", "das", "und")), score(Seq("le", "les", "et", "une")))
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr AND $en > 0 THEN 'en'
       |         WHEN $es >= $de AND $es >= $fr AND $es > 0 THEN 'es'
       |         WHEN $de >= $fr AND $de > 0 THEN 'de'
       |         WHEN $fr > 0 THEN 'fr'
       |         ELSE 'und' END AS pred_lang
       |  FROM documents)
       |SELECT lang, pred_lang, count(*) AS n
       |FROM scored
       |GROUP BY lang, pred_lang
       |ORDER BY lang, pred_lang""".stripMargin
  }

  /** N-gram language ID (the n-gram-heuristic variant of [[langId]]):
    * per-language character-bigram profiles are LEARNED from a
    * deterministic 20% sample of the corpus (top-20 bigrams by
    * frequency per language), and each doc is classified by profile
    * overlap of its distinct bigrams — argmax with (score desc, lang
    * asc) tie-break via rank-1 window. Output: the (lang, pred_lang)
    * confusion matrix.
    *
    * Shapes: profile training is explode→count→rank over the SAMPLE
    * (map-side combined aggs + a per-lang top-k window); the trained
    * profiles — the MODEL, ≤ langs×20 strings — are collected and
    * ride into a single native scoring pass over the corpus
    * ([[graft.functions.BigramProfileBest]]): one map stage + the
    * final tiny confusion-matrix agg, no per-bigram row explosion and
    * no per-doc window shuffle at scoring time. Linear in corpus
    * size, with the train pass paying only the sample. */
  def langIdNgram(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    // bigrams via the native per-row expression: the HOF formulation
    // paid ~2.3 s of interpreted per-element dispatch at sf0.1 (see
    // functions.DistinctCharBigrams scaladoc); values are identical
    def bigramsOf(d: DataFrame): DataFrame = d.select(col("doc_id"), col("lang"),
      explode(graft.functions.TextFunctions.distinct_char_bigrams(col("text"))).as("bigram"))
    // profiles are TRAINED on a deterministic 20% document sample
    // (content-hash bucket, same scheme as stratifiedSample — never
    // rand(), so re-runs and the oracle agree): profile quality needs
    // only bigram FREQUENCIES, which a fixed sample estimates, while
    // scoring must see every doc. This removes both the shared-frame
    // checkpoint and 80% of the training pass — the train-on-sample /
    // apply-to-corpus split every 100 TB pipeline uses.
    val trainDocs = docs.filter(
      pmod(conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long"), lit(5)) < 1)
    // the explode is bounded per doc by training on a PREFIX: profile
    // frequencies need an estimate, not every byte, and unbounded
    // per-doc bigram diversity is the measured cost driver (265 s on
    // an adversarial high-diversity 10× corpus vs 4.3 s friendly —
    // the explode row count scales with diversity, not doc count).
    // A 4 KiB prefix caps the explode at ~4095 rows/doc and is the
    // standard language-ID practice (identify from the head); at the
    // test SFs every doc is shorter than the cap, so trained profiles
    // are bit-identical to full-text training (oracle mirrors the cap).
    val trainPrefixed = trainDocs.withColumn("text",
      substring(col("text"), 1, LangIdTrainPrefixChars))
    val counts = bigramsOf(trainPrefixed).groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("df"))
    val wTop = Window.partitionBy(col("lang")).orderBy(col("df").desc, col("bigram"))
    val profileRows = counts.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 20)
      .select(col("lang"), col("bigram"))
      .collect() // model-sized: ≤ 20 bigrams per language
    val langs: Array[String] = profileRows.map(_.getString(0)).distinct.sorted
    require(langs.length <= 64,
      s"bigram_profile_best scores at most 64 language profiles, corpus has ${langs.length}")
    if (langs.isEmpty) {
      // empty corpus → empty confusion matrix with the contract schema
      return docs.select(col("lang"), col("lang").as("pred_lang"),
        lit(0L).as("n")).limit(0)
    }
    val byLang = profileRows.groupBy(_.getString(0))
    // profile order = lang ASC, so the expression's lowest-index
    // tie-break IS the (score DESC, profile_lang ASC) rank-1 window
    // of the relational form (and of the oracle SQL)
    val profileSets: Seq[Seq[String]] = langs.toSeq.map(l => byLang(l).map(_.getString(1)).toSeq)
    val best = graft.functions.TextFunctions.bigram_profile_best(col("text"), profileSets)
    docs.select(col("lang"), best.as("bi"))
      // -1 = no profile bigram hit: such docs fall out of the
      // relational join (and the oracle's) — drop them here too
      .filter(col("bi") >= 0)
      .select(col("lang"),
        element_at(array(langs.map(lit).toIndexedSeq: _*), col("bi") + 1).as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  def langIdNgramSql: String =
    s"""WITH doc_bigrams AS (
      |  SELECT doc_id, lang,
      |    unnest(list_distinct(list_transform(range(1, greatest(length(text), 2)),
      |      i -> substr(text, i, 2)))) AS bigram
      |  FROM documents),
      |train_bigrams AS (
      |  SELECT lang,
      |    unnest(list_distinct(list_transform(
      |      range(1, greatest(length(substr(text, 1, $LangIdTrainPrefixChars)), 2)),
      |      i -> substr(substr(text, 1, $LangIdTrainPrefixChars), i, 2)))) AS bigram
      |  FROM documents
      |  WHERE ('0x' || substr(md5(text), 1, 4))::BIGINT % 5 < 1),
      |counts AS (SELECT lang, bigram, count(*) AS df FROM train_bigrams GROUP BY lang, bigram),
      |profiles AS (
      |  SELECT lang AS profile_lang, bigram FROM (
      |    SELECT lang, bigram,
      |      row_number() OVER (PARTITION BY lang ORDER BY df DESC, bigram) AS rk
      |    FROM counts) t WHERE rk <= 20),
      |scores AS (
      |  SELECT d.doc_id, d.lang, p.profile_lang, count(*) AS score
      |  FROM doc_bigrams d JOIN profiles p USING (bigram)
      |  GROUP BY d.doc_id, d.lang, p.profile_lang),
      |best AS (
      |  SELECT doc_id, lang, profile_lang,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, profile_lang) AS rk
      |  FROM scores)
      |SELECT lang, profile_lang AS pred_lang, count(*) AS n
      |FROM best WHERE rk = 1
      |GROUP BY lang, pred_lang
      |ORDER BY lang, pred_lang""".stripMargin

  /** Composite document quality score — the filter stage of a
    * training-data pipeline: per-doc signals (stopword ratio, non-
    * alphanumeric ratio, lexical diversity, mean token length band)
    * combined into a 0..1 score, histogrammed per language in decile
    * buckets. Every signal is per-row array/string math (no shuffle);
    * the histogram is one map-side-combined agg. Weights are fixed —
    * tuning them is corpus policy, not engine capability. */
  /** Per-document quality decile (0 = junk, 9 = best) of a `text`
    * column — the reusable filter-stage predicate; [[qualityScore]]
    * histograms it and streaming intakes filter on it. */
  def qualityDecile: Column = {
    val n = size(tokens).cast("double")
    val stopHits = size(filter(tokens,
      t => Seq("the", "a", "of", "and", "to", "in", "is", "it").map(t === _).reduce(_ || _)))
    val stopRatio = stopHits / n
    // share of characters outside [a-zA-Z0-9 ] — boilerplate/markup
    // signal: what REMAINS after deleting the allowed class is the
    // punctuation mass. Guarded: ANSI mode (Spark 4 default) throws
    // on /0, and empty docs exist in any real corpus.
    val punctRatio = when(length(col("text")) > 0,
      length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).cast("double") / length(col("text")))
      .otherwise(lit(0.0))
    val distinctRatio = size(array_distinct(tokens)) / n
    val avgTokLen = (length(col("text")) - (n - 1)) / n
    // each component clamped to [0,1]; natural-text sweet spots score high
    val score =
      least(stopRatio * 5, lit(1.0)) * 0.3 +
        (lit(1.0) - punctRatio) * 0.2 +
        least(distinctRatio * 1.25, lit(1.0)) * 0.3 +
        (lit(1.0) - least(abs(avgTokLen - 5.0) / 5.0, lit(1.0))) * 0.2
    // NULL text must land in decile 0 (junk), explicitly: the
    // composite score is NULL for NULL text and least() SKIPS NULLs
    // in Spark (and in current DuckDB), which would otherwise file
    // NULL docs in decile 9 — the top-quality bucket
    when(col("text").isNull, lit(0L))
      .otherwise(least(floor(score * 10).cast("long"), lit(9L)))
  }

  def qualityScore(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("lang"), qualityDecile.as("decile"))
      .groupBy(col("lang"), col("decile"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("decile"))

  /** The quality-decile CASE expression over a bare `text` column —
    * ONE definition shared by [[qualityScoreSql]] and
    * [[Pipeline.curationFunnelSql]] so the funnel's quality gate can
    * never drift from the oracle-proven decile. */
  private[ops] def qualityDecileSqlExpr: String = {
    val n = "CAST(len(string_split(text, ' ')) AS DOUBLE)"
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
      .map(w => s"t = '$w'").mkString(" OR ")
    val stopRatio = s"(len(list_filter(string_split(text, ' '), t -> $stop)) / $n)"
    val punctRatio = s"(CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END)"
    val distinctRatio = s"(len(list_distinct(string_split(text, ' '))) / $n)"
    val avgTokLen = s"((length(text) - ($n - 1)) / $n)"
    val score =
      s"least($stopRatio * 5, 1.0) * 0.3 + (1.0 - $punctRatio) * 0.2 + " +
        s"least($distinctRatio * 1.25, 1.0) * 0.3 + " +
        s"(1.0 - least(abs($avgTokLen - 5.0) / 5.0, 1.0)) * 0.2"
    s"""CASE WHEN text IS NULL THEN 0
       |       ELSE least(CAST(floor(($score) * 10) AS BIGINT), 9) END""".stripMargin
  }

  def qualityScoreSql: String =
    s"""SELECT lang,
       |  $qualityDecileSqlExpr AS decile,
       |  count(*) AS n_docs
       |FROM documents
       |GROUP BY lang, decile
       |ORDER BY lang, decile""".stripMargin

  /** Supervised quality classifier — the fastText-style linear
    * bag-of-words filter the published curation pipelines (CCNet,
    * LLaMA, GPT-3's WebText discriminator) train to score documents,
    * completing the quality ladder's supervised rung next to the
    * heuristic deciles ([[qualityScore]]) and the LM fluency score
    * ([[lmScore]]): a multinomial Naive Bayes log-linear model —
    * exactly a linear classifier over bag-of-words counts, fastText
    * with n=1 and no learned embedding — trained on the 5% SEED split
    * (`doc_id % 20 = 0`, the [[knLm]] convention), labels = heuristic
    * decile ≥ 7 (the pipeline bootstrap: heuristics label a seed, the
    * classifier generalizes), applied to the 95% rest.
    *
    * Per-token weight: `llr_e4 = round((ln((c⁺+1)/(N⁺+V)) −
    * ln((c⁻+1)/(N⁻+V)))·10⁴)` — add-one smoothing, integer
    * tenth-milli-nats (the [[lmScore]] discipline: one double
    * expression rounded once per MODEL row, every corpus-sized fold
    * exact BIGINT). Tokens unseen in the seed take the smoothing-only
    * weight; the class prior enters once per doc. Admission = score
    * > 0. Output per source: docs scored, docs admitted, admit ppm
    * (non-negative integer division only), exact score sum.
    *
    * Scale: the MODEL is seed-sized (one agg over 5% of the corpus);
    * scoring is one explode → distinct-per-doc collapse (boilerplate
    * tokens ride the join once with weight k) → equi-join on token →
    * two hash aggs. The 1-row totals frame rides a broadcast BNLJ. No
    * corpus² anywhere. */
  def nbQuality(spark: SparkSession, sfDir: String): DataFrame =
    nbScored(spark, sfDir).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score_e4") > 0, 1L).otherwise(0L)).as("n_admitted"),
        sum(col("score_e4")).cast("long").as("sum_score_e4"))
      .withColumn("admit_ppm", expr("(n_admitted * 1000000) DIV n_docs"))
      .select(col("source"), col("n_docs"), col("n_admitted"), col("admit_ppm"),
        col("sum_score_e4"))
      .orderBy(col("source"))

  /** The per-doc classifier score frame `(source, doc_id, score_e4)` —
    * ONE definition shared by [[nbQuality]] (the admission report) and
    * [[nbConfusion]] (the accuracy acceptance), so the two can never
    * drift. */
  private[ops] def nbScored(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).filter(col("text").isNotNull)
    val seed = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"), (qualityDecile >= 7).as("pos"), tokens.as("t"))
    val seedToks = seed.select(col("pos"), explode(col("t")).as("token"))
    val counts = seedToks.groupBy(col("token"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("cn"))
    val totals = counts.agg(sum(col("cp")).as("np"), sum(col("cn")).as("nn"),
      count(lit(1)).as("v"))
      .crossJoin(seed.agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("dpos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("dneg")))
    val llr = counts.crossJoin(broadcast(totals))
      .select(col("token"),
        round((log((col("cp") + 1).cast("double") / (col("np") + col("v"))) -
          log((col("cn") + 1).cast("double") / (col("nn") + col("v")))) * 10000)
          .cast("long").as("llr_e4"))
    val scalars = totals.select(
      round((log(lit(1.0) / (col("np") + col("v"))) -
        log(lit(1.0) / (col("nn") + col("v")))) * 10000).cast("long").as("unseen_e4"),
      round(log((col("dpos") + 1).cast("double") / (col("dneg") + 1)) * 10000)
        .cast("long").as("prior_e4"))
    val probe = docs.filter(col("doc_id") % 20 =!= 0)
      .select(col("source"), col("doc_id"), explode(tokens).as("token"))
      .groupBy(col("source"), col("doc_id"), col("token"))
      .agg(count(lit(1)).as("k"))
    probe
      .join(llr, Seq("token"), "left")
      .crossJoin(broadcast(scalars))
      .groupBy(col("source"), col("doc_id"))
      .agg((sum(col("k") * coalesce(col("llr_e4"), col("unseen_e4"))) +
        max(col("prior_e4"))).as("score_e4"))
  }

  /** Classifier ACCEPTANCE — the confusion matrix of [[nbQuality]]'s
    * admission verdict against the heuristic-decile label on the
    * HELD-OUT 95% (the labels the classifier never saw): per source
    * tp/fp/fn/tn and accuracy ppm. The q_ivf_recall discipline applied
    * to the classifier: a trained model ships with its measured
    * generalization, as an oracle-checked query — if a refactor breaks
    * the model, this row moves before any downstream corpus does.
    *
    * Scale: the scored frame's linear joins + one label expression on
    * the eval docs + two hash aggs. */
  def nbConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull && col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), (qualityDecile >= 7).as("label"))
    nbScored(spark, sfDir)
      .join(labels, Seq("doc_id"))
      .withColumn("pred", col("score_e4") > 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred") && col("label"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("label"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("label"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("label"), 1L).otherwise(0L)).as("tn"))
      .withColumn("accuracy_ppm", expr("((tp + tn) * 1000000) DIV n_docs"))
      .orderBy(col("source"))
  }

  /** Shared WITH-body (CTE chain ending in `scored`) for the NB
    * classifier — interpolated verbatim into [[nbQualitySql]] and
    * [[nbConfusionSql]]. */
  private def nbCtesSql: String =
    s"""seed AS (
       |  SELECT doc_id, ($qualityDecileSqlExpr) >= 7 AS pos, string_split(text, ' ') AS t
       |  FROM documents WHERE text IS NOT NULL AND doc_id % 20 = 0),
       |seedtoks AS (SELECT pos, unnest(t) AS token FROM seed),
       |counts AS (
       |  SELECT token,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cp,
       |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cn
       |  FROM seedtoks GROUP BY token),
       |totals AS (
       |  SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cn) AS BIGINT) AS nn,
       |    CAST(count(*) AS BIGINT) AS v,
       |    (SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) FROM seed) AS dpos,
       |    (SELECT CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) FROM seed) AS dneg
       |  FROM counts),
       |llr AS (
       |  SELECT token,
       |    CAST(round((ln(CAST(cp + 1 AS DOUBLE) / (np + v)) -
       |      ln(CAST(cn + 1 AS DOUBLE) / (nn + v))) * 10000) AS BIGINT) AS llr_e4
       |  FROM counts CROSS JOIN totals),
       |scalars AS (
       |  SELECT
       |    CAST(round((ln(1.0 / (np + v)) - ln(1.0 / (nn + v))) * 10000) AS BIGINT) AS unseen_e4,
       |    CAST(round(ln(CAST(dpos + 1 AS DOUBLE) / (dneg + 1)) * 10000) AS BIGINT) AS prior_e4
       |  FROM totals),
       |probe AS (
       |  SELECT source, doc_id, unnest(string_split(text, ' ')) AS token
       |  FROM documents WHERE text IS NOT NULL AND doc_id % 20 <> 0),
       |probek AS (
       |  SELECT source, doc_id, token, CAST(count(*) AS BIGINT) AS k
       |  FROM probe GROUP BY source, doc_id, token),
       |scored AS (
       |  SELECT source, doc_id,
       |    CAST(sum(k * COALESCE(llr_e4, unseen_e4)) + max(prior_e4) AS BIGINT) AS score_e4
       |  FROM probek LEFT JOIN llr USING (token) CROSS JOIN scalars
       |  GROUP BY source, doc_id)""".stripMargin

  /** Oracle twin of [[nbQuality]] — the decile labeler is the shared
    * [[qualityDecileSqlExpr]] fragment, so the seed labels cannot
    * drift from the proven decile query. */
  def nbQualitySql: String =
    s"""WITH $nbCtesSql
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN score_e4 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       |  CAST(CAST(sum(CASE WHEN score_e4 > 0 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
       |       // CAST(count(*) AS BIGINT) AS BIGINT) AS admit_ppm,
       |  CAST(sum(score_e4) AS BIGINT) AS sum_score_e4
       |FROM scored
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** Oracle twin of [[nbConfusion]]. */
  def nbConfusionSql: String =
    s"""WITH $nbCtesSql,
       |labels AS (
       |  SELECT doc_id, ($qualityDecileSqlExpr) >= 7 AS label
       |  FROM documents WHERE text IS NOT NULL AND doc_id % 20 <> 0),
       |joined AS (
       |  SELECT source, score_e4 > 0 AS pred, label
       |  FROM scored JOIN labels USING (doc_id))
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(sum(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(sum(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  CAST(sum(CASE WHEN NOT pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |  CAST((CAST(sum(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
       |       // CAST(count(*) AS BIGINT) AS BIGINT) AS accuracy_ppm
       |FROM joined
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** Content fingerprinting: md5 of the normalized text (the rolling-
    * hash fingerprint role; md5 chosen for engine parity) + per-source
    * duplicate-fingerprint counts. */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source"), md5(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct_fp"))
      .orderBy(col("source"))

  def fingerprintsSql: String =
    """SELECT source, count(*) AS n_docs, count(DISTINCT md5(text)) AS n_distinct_fp
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Deterministic stratified sampling — reproducible corpus subsets
    * for training-data pipelines. The sample predicate is a content
    * hash bucket (first 16 md5 bits mod 100), NOT rand(): re-running,
    * retrying, or re-partitioning yields the same sample everywhere,
    * and the rate is adjustable per stratum (here: keep en at ~10%,
    * others at ~30%). */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = pmod(conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long"), lit(100))
    val rate = when(col("lang") === "en", 10).otherwise(30)
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        // CASE-shaped (not sum-of-nullable-cast) so NULL text counts
        // as unsampled in both engines, matching the oracle's CASE
        sum(when(bucket < rate, 1L).otherwise(0L)).as("n_sampled"))
      .orderBy(col("lang"))
  }

  def stratifiedSampleSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN ('0x' || substr(md5(text), 1, 4))::BIGINT % 100 <
      |    (CASE WHEN lang = 'en' THEN 10 ELSE 30 END) THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** TF-IDF: the classic text-relevance score, as a three-stage
    * relational dataflow — tf per (doc, term), df per term, score =
    * tf · ln(N/df). Top-30 scored (doc, term) pairs. All three stages
    * are map-side-combined aggs; the tf⋈df join shuffles on the term.
    * (DuckDB's `log` is log10 — both sides use `ln` explicitly.) */
  def tfidf(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"), explode(tokens).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = toks.groupBy(col("token")).agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        round(col("tf") * log(col("n_docs") / col("df")), 4).as("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id"), col("token"))
      .limit(30)
  }

  def tfidfSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
      |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT doc_id, token, round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
      |FROM tf JOIN df USING (token) CROSS JOIN n
      |ORDER BY tfidf DESC, doc_id, token
      |LIMIT 30""".stripMargin

  /** Corpus bigram language-model score per document — the
    * KenLM-style fluency filter every large-scale curation pipeline
    * runs: train MLE token-bigram probabilities ON THE CORPUS ITSELF
    * (P(w2|w1) = c(w1 w2) / c(w1)) and score each document by its
    * average bigram negative log-likelihood (NLL cost, in
    * tenth-milli-nats). HIGH costs mark disfluent / boilerplate text
    * whose token transitions the corpus finds improbable.
    *
    * Engine parity: each bigram's cost is rounded to an INTEGER in
    * tenth-milli-nats (`round(ln(c1/c12) * 10000)` — the q_tfidf ln
    * discipline at the same 1e-4 precision), so per-doc sums are exact
    * BIGINT arithmetic (double summation across rows would be
    * partition-order-dependent) and the per-doc mean is truncating
    * integer division. Docs with < 2 tokens have no bigrams and drop
    * out (inner joins on both sides).
    *
    * Scale: one explode for counts (map-side combined), one explode
    * for scoring joined against the count tables on their natural
    * keys — the same linear shapes as tf-idf; no all-pairs anything. */
  def lmScore(spark: SparkSession, sfDir: String): DataFrame =
    lmDocNll(spark, sfDir).orderBy(col("doc_id"))

  /** Per-doc bigram-NLL frame shared by [[lmScore]] (the per-doc
    * report) and [[ccnetBuckets]] (the tercile partition) — ONE
    * definition so the two queries cannot drift. */
  private[ops] def lmDocNll(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val t = tokens
    val bigrams = docs.select(col("doc_id"),
      explode(zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (x, y) => concat(x, lit(" "), y))).as("bg"))
    // Probe side collapses to DISTINCT bigrams per doc BEFORE any join
    // (map-side combined), so a repeated boilerplate transition rides
    // the join shuffles once with a weight k instead of once per
    // position — per-doc sums become sum(k·nll) / sum(k).
    // (doc, bigram) counts feed BOTH the probe side and (summed over
    // docs) the corpus bigram counts: truncate once and derive c12 =
    // Σ_doc k instead of a second full bigram explode+count pass —
    // identical counts by definition (r14: 2 explode passes → 1).
    // The bigram is keyed as (w1, xxhash64(bg)) ALREADY AT THE COUNT
    // (r15): the r14 shape stored and shuffled the full two-token
    // string and only hashed at join time — hashing before the groupBy
    // halves the checkpoint/shuffle width (§2.3 narrower types). A
    // false merge needs two bigrams SHARING w1 to collide in xxhash64
    // (~2^-64 per continuation set — and a join-time collision under
    // the r14 shape would have DUPLICATED probe rows, so merging at
    // the count is strictly safer); keeping w1 in the key makes
    // cross-w1 collisions harmless. w1 is recoverable from bg because
    // tokens are space-split (no token contains ' ').
    val docBg = Truncate(bigrams
      .select(col("doc_id"), substring_index(col("bg"), " ", 1).as("w1"),
        xxhash64(col("bg")).as("bh"))
      .groupBy(col("doc_id"), col("w1"), col("bh"))
      .agg(count(lit(1)).as("k")), "lmnll-docbg", big = true)
    val uni = docs.select(explode(t).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val probe = docBg
    val biH = docBg.groupBy(col("w1"), col("bh")).agg(sum(col("k")).as("c12"))
    // scores are NEGATIVE-log-likelihood costs (>= 0): c12 <= c1 by
    // construction, and non-negative integers keep Spark DIV = DuckDB //
    // (they differ on negatives: truncate vs floor)
    probe
      .join(biH, Seq("w1", "bh"))
      .join(uni, Seq("w1"))
      .select(col("doc_id"), col("k"),
        round(log(col("c1").cast("double") / col("c12")) * 10000).cast("long").as("nll"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k") * col("nll")).as("sum_nll"))
      .withColumn("avg_nll", expr("sum_nll DIV n_bigrams"))
  }

  /** Shared WITH-body for the per-doc NLL table (CTE name `nll`) —
    * interpolated verbatim into [[lmScoreSql]] and
    * [[ccnetBucketsSql]]. */
  private[ops] val lmNllCteSql: String =
    """toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bigrams AS (
      |  SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i + 1] AS bg
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)),
      |uni AS (
      |  SELECT unnest(t) AS w1 FROM toks),
      |cu AS (SELECT w1, count(*) AS c1 FROM uni GROUP BY w1),
      |cb AS (SELECT bg, count(*) AS c12 FROM bigrams GROUP BY bg),
      |nll AS (
      |  SELECT doc_id,
      |    CAST(count(*) AS BIGINT) AS n_bigrams,
      |    CAST(sum(CAST(round(ln(CAST(c1 AS DOUBLE) / c12) * 10000) AS BIGINT)) AS BIGINT) AS sum_nll,
      |    CAST(CAST(sum(CAST(round(ln(CAST(c1 AS DOUBLE) / c12) * 10000) AS BIGINT)) AS BIGINT)
      |         // CAST(count(*) AS BIGINT) AS BIGINT) AS avg_nll
      |  FROM bigrams JOIN cb USING (bg) JOIN cu USING (w1)
      |  GROUP BY doc_id)""".stripMargin

  def lmScoreSql: String =
    s"""WITH $lmNllCteSql
       |SELECT doc_id, n_bigrams, sum_nll, avg_nll
       |FROM nll
       |ORDER BY doc_id""".stripMargin

  /** CCNet's head/middle/tail partition: per source, documents split
    * into perplexity TERCILES by the corpus-LM score ([[lmScore]]'s
    * avg bigram NLL — low = fluent "head", high = junk "tail"), with
    * doc and token mass per bucket. CCNet keeps head+middle and drops
    * or down-weights tail; this table is that decision's input, and
    * its `min_nll`/`max_nll` columns are the published per-bucket
    * perplexity cutoffs.
    *
    * Rank semantics: r over (avg_nll asc, doc_id asc) within source,
    * bucket = ((r−1)·3) DIV n — the largest-remainder-free integer
    * tercile. The ENGINE never ranks the corpus: docs collapse to a
    * (source, avg_nll) histogram, cumulative counts over histogram
    * rows locate each cell's bucket span, and only docs in a cell a
    * tercile boundary CUTS pay a within-cell rank (≤ 2 cells per
    * source, the [[Selection.exactSample]] order-statistic trick).
    * The oracle IS the plain ranked-window formulation, so a green row
    * re-proves the histogram rewrite per run.
    *
    * Scale: score derivation is [[lmDocNll]]'s linear joins; the
    * histogram is ≤ distinct integer NLL values per source (value
    * range ~1e5, corpus-size-independent); windows scan histogram
    * rows only. */
  def ccnetBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(tokens).cast("long").as("n_tokens"))
    // the full LM-scoring pipeline (bigram explode + model joins)
    // would re-execute for every downstream reference — truncate the
    // scored table once (r14: the lmDocNll subtree ran 2× here, plus
    // 2× more through `tagged`'s two branches before they were merged)
    val scored = Truncate(lmDocNll(spark, sfDir)
      .select(col("doc_id"), col("avg_nll"))
      .join(docs, Seq("doc_id")), "ccnet-scored")
    val wCum = Window.partitionBy(col("source")).orderBy(col("avg_nll"))
    val wTot = Window.partitionBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // histogram-sized (≤ distinct integer NLL values × sources,
    // corpus-size-independent) and broadcast onto the scored table;
    // the two branches below carry IDENTICAL hist subtrees, so
    // ReuseExchange builds the broadcast once
    val hist = scored.groupBy(col("source"), col("avg_nll"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("cum_below", col("cum") - col("cnt"))
      .withColumn("tot", sum(col("cnt")).over(wTot))
      // bucket of the cell's first and last rank; equal ⇒ whole cell
      // lands in one tercile and no doc needs a rank
      .withColumn("b_first", expr("(cum_below * 3) DIV tot"))
      .withColumn("b_last", expr("((cum - 1) * 3) DIV tot"))
    val tagged = scored.join(broadcast(hist), Seq("source", "avg_nll"))
    // two branches, NOT one windowed pass (r15, reverting r14's merge):
    // ranking every row through the cell window re-shuffles the whole
    // corpus; the whole-cell branch needs no rank at all, and only the
    // ≤ 2 boundary cells per source (a corpus/|cells|-sized slice,
    // filtered BEFORE the window's exchange) pay the shuffle+sort —
    // the operator's documented scale contract.
    val whole = tagged.filter(col("b_first") === col("b_last"))
      .withColumn("bucket", col("b_first"))
    val wCell = Window.partitionBy(col("source"), col("avg_nll"))
      .orderBy(col("doc_id"))
    val edge = tagged.filter(col("b_first") =!= col("b_last"))
      .withColumn("r", col("cum_below") + row_number().over(wCell))
      .withColumn("bucket", expr("((r - 1) * 3) DIV tot"))
      .drop("r")
    whole.unionByName(edge)
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        min(col("avg_nll")).as("min_nll"), max(col("avg_nll")).as("max_nll"))
      .orderBy(col("source"), col("bucket"))
  }

  /** Oracle twin of [[ccnetBuckets]] — the PLAIN per-source ranked
    * window (the histogram engine path must bucket identically);
    * score CTE = [[lmNllCteSql]] verbatim. */
  def ccnetBucketsSql: String =
    s"""WITH $lmNllCteSql,
       |scored AS (
       |  SELECT n.doc_id, d.source,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |    n.avg_nll
       |  FROM nll n JOIN documents d ON n.doc_id = d.doc_id),
       |ranked AS (
       |  SELECT source, n_tokens, avg_nll,
       |    row_number() OVER (PARTITION BY source ORDER BY avg_nll, doc_id) AS r,
       |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
       |  FROM scored)
       |SELECT source, CAST((r - 1) * 3 // n AS BIGINT) AS bucket,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(min(avg_nll) AS BIGINT) AS min_nll,
       |  CAST(max(avg_nll) AS BIGINT) AS max_nll
       |FROM ranked
       |GROUP BY source, CAST((r - 1) * 3 // n AS BIGINT)
       |ORDER BY source, bucket""".stripMargin

  /** Polynomial rolling-hash document fingerprint (Rabin–Karp shape):
    * fold token hashes h(t) through acc = (acc·B + h) mod M. Token
    * hash = first 32 md5 bits (engine-portable); B/M chosen so
    * acc·B + h < 2⁶³ — DuckDB errors on BIGINT overflow, Java wraps,
    * so staying in range keeps both engines identical. Order-sensitive
    * (unlike the set-based MinHash) — permuted docs get different
    * prints. */
  def rollingFingerprints(spark: SparkSession, sfDir: String): DataFrame = {
    val B = 1000003L
    val M = 2147483647L
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        aggregate(tokens, lit(0L),
          (acc, x) => pmod(acc * B + conv(substring(md5(x), 1, 8), 16, 10).cast("long"), lit(M)))
          .as("rolling_fp"))
      .orderBy(col("doc_id"))
  }

  def rollingFingerprintsSql: String =
    """SELECT doc_id, source,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ' '),
      |        t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
      |    (acc, h) -> (acc * 1000003 + h) % 2147483647) AS rolling_fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** WINNOWING fingerprint audit — the Schleimer–Wilkerson–Aiken
    * (MOSS) selection rule: hash every token `k`-gram, slide a window
    * of `w` consecutive hashes, keep each window's MINIMUM — the
    * guarantee is that any shared run of ≥ w+k−1 tokens shares at
    * least one selected fingerprint, at ~1/w the storage of the full
    * k-gram set. The per-source report mirrors the CDC audit: selected
    * print volume, distinct hashes, and the occurrence mass of prints
    * appearing in ≥ 2 documents (the winnowed duplicated-passage
    * rate). Selection density ≈ 2/(w+1) is the famous bound — readable
    * off `n_prints / n_grams`.
    *
    * Determinism (ties): the window minimum is over the combined key
    * `h·2²⁰ + pos` — the smallest hash wins, ties to the EARLIEST
    * position — pure integer compare on both engines (positions are
    * corpus-bounded ≪ 2²⁰; h < 2³² keeps the key < 2⁵²).
    *
    * Scale: one positional explode → one per-doc ordered window (the
    * only shuffle keyed by doc) → distinct + two counts-table aggs;
    * never doc×doc. */
  def winnowing(spark: SparkSession, sfDir: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    // native one-loop selection per document (no gram explode, no
    // per-doc ordered window sort) — declarative twin below pinned
    val sel = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        explode(graft.functions.WinnowKeys.of(tokens, k, w)).as("key"))
      .withColumn("h", expr("key DIV 1048576"))
    sel.groupBy(col("source"), col("h"))
      .agg(count(lit(1)).as("occ"), countDistinct(col("doc_id")).as("nd"))
      .groupBy(col("source"))
      .agg(sum(col("occ")).cast("long").as("n_prints"),
        count(lit(1)).cast("long").as("n_distinct_h"),
        sum(when(col("nd") >= 2, col("occ")).otherwise(0L)).cast("long")
          .as("n_shared_occ"))
      .withColumn("shared_ppm", expr("(n_shared_occ * 1000000) DIV n_prints"))
      .orderBy(col("source"))
  }

  /** The declarative twin of the native selection: positional explode
    * + per-doc ordered window minimum — the equivalence witness
    * (Round7OpsSpec pins key-set equality per doc). */
  private[ops] def winnowKeysDeclarative(docs: DataFrame,
      k: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = tokens
    val grams = docs
      .select(col("doc_id"),
        posexplode(when(size(t) >= k,
            transform(sequence(lit(1), size(t) - (k - 1)),
              i => conv(substring(md5(array_join(slice(t, i, lit(k)), " ")), 1, 8), 16, 10)
                .cast("long")))
          .otherwise(array().cast("array<bigint>"))).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    grams
      .withColumn("key", min(col("h") * lit(1048576L) + col("pos")).over(win))
      .filter(col("pos") >= w) // full windows only
      .select(col("doc_id"), col("key")).distinct()
  }

  /** Oracle twin of [[winnowing]] — same hash, same combined-key
    * window minimum, same full-window filter. */
  def winnowingSql(k: Int = 4, w: Int = 4): String =
    s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
       |grams AS (
       |  SELECT doc_id, source, i AS pos,
       |    ('0x' || substr(md5(array_to_string(t[i:i+${k - 1}], ' ')), 1, 8))::BIGINT AS h
       |  FROM (SELECT doc_id, source, t,
       |          unnest(generate_series(1, len(t) - ${k - 1})) AS i
       |        FROM toks WHERE len(t) >= $k)),
       |sel AS (
       |  SELECT DISTINCT doc_id, source,
       |    min(h * 1048576 + pos) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS key
       |  FROM grams
       |  QUALIFY pos >= $w),
       |prints AS (SELECT doc_id, source, key // 1048576 AS h FROM sel),
       |hs AS (
       |  SELECT source, h, CAST(count(*) AS BIGINT) AS occ,
       |    CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
       |  FROM prints GROUP BY source, h)
       |SELECT source,
       |  CAST(sum(occ) AS BIGINT) AS n_prints,
       |  CAST(count(*) AS BIGINT) AS n_distinct_h,
       |  CAST(sum(CASE WHEN nd >= 2 THEN occ ELSE 0 END) AS BIGINT) AS n_shared_occ,
       |  CAST(CAST(sum(CASE WHEN nd >= 2 THEN occ ELSE 0 END) AS BIGINT) * 1000000
       |    // CAST(sum(occ) AS BIGINT) AS BIGINT) AS shared_ppm
       |FROM hs GROUP BY source ORDER BY source""".stripMargin

  /** Intra-document repetition profile (the Gopher/RefinedWeb
    * repetitious-text filters): per doc, of its word 2-grams, the
    * fraction that are repeats (1 − distinct/total) and the share of
    * the single most frequent 2-gram. High values mark boilerplate /
    * degenerate generations that quality-filter out of training sets.
    *
    * Scale shape: explode to (doc, gram) → count per (doc, gram) with
    * map-side partial agg → per-doc roll-up. Everything keys on
    * doc_id, so both aggs collapse into ONE shuffle of already-partial
    * counts; no payload columns ride along. The 2-gram construction is
    * the zip_with-over-shifted-slice idiom ([[graft.ops.Dedup]]'s
    * shingles) — never `element_at` inside a lambda, which re-splits
    * per element after CollapseProject inlining. */
  def docRepetition(spark: SparkSession, sfDir: String): DataFrame = {
    val t = tokens
    val n = size(t)
    val pairs = zip_with(t, slice(t, lit(2), greatest(n - 1, lit(0))),
      (x, y) => concat(x, lit(" "), y))
    val grams = slice(pairs, lit(1), greatest(n - 1, lit(1)))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(grams).as("g"))
      .filter(col("g").isNotNull)
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max(col("n")).as("top_n"))
      .select(col("doc_id"), col("n_grams"),
        (round((col("n_grams") - col("n_distinct")) / col("n_grams"), 4) + lit(0.0))
          .as("dup_frac"),
        (round(col("top_n") / col("n_grams"), 4) + lit(0.0)).as("top_frac"))
      .orderBy(col("doc_id"))
  }

  def docRepetitionSql: String =
    """WITH grams AS (
      |  SELECT doc_id, g FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, greatest(len(string_split(text, ' ')), 2)),
      |        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS g
      |    FROM documents)
      |  WHERE g IS NOT NULL),
      |counts AS (
      |  SELECT doc_id, g, count(*) AS n FROM grams GROUP BY doc_id, g)
      |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_grams,
      |  round((sum(n) - count(*)) / CAST(sum(n) AS DOUBLE), 4) + 0.0 AS dup_frac,
      |  round(max(n) / CAST(sum(n) AS DOUBLE), 4) + 0.0 AS top_frac
      |FROM counts GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Deterministic LENGTH-WEIGHTED document sampling: keep each doc
    * with probability n_chars / max(n_chars) — the hash-threshold form
    * of weighted sampling (quality- or domain-weighted in a real
    * pipeline; the weight column is the only thing that changes). The
    * uniform draw is the md5-prefix of the content mapped to parts-
    * per-million, so the sample is reproducible, shuffle-free, and
    * identical across engines; the keep test multiplies out to pure
    * INTEGER arithmetic (u_ppm · max < n_chars · 10⁶), so no FP
    * rounding can flip a keep decision at any scale.
    *
    * Scale shape: one scalar max() aggregate (broadcast — it is an
    * aggregate result, always one row) + a stateless per-row filter:
    * linear, no shuffle of the corpus. */
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val mx = docs.agg(max(col("n_chars")).as("mx"))
    val uPpm = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long") % lit(1000000L)
    docs.crossJoin(broadcast(mx))
      .select(col("doc_id"), col("n_chars"), uPpm.as("u_ppm"), col("mx"))
      .filter(col("u_ppm") * col("mx") < col("n_chars") * lit(1000000L))
      .select(col("doc_id"), col("n_chars"), col("u_ppm"))
      .orderBy(col("doc_id"))
  }

  def weightedSampleSql: String =
    """SELECT doc_id, n_chars,
      |  ('0x' || substr(md5(text), 1, 8))::BIGINT % 1000000 AS u_ppm
      |FROM documents, (SELECT max(n_chars) AS mx FROM documents)
      |WHERE (('0x' || substr(md5(text), 1, 8))::BIGINT % 1000000) * mx
      |      < n_chars * 1000000
      |ORDER BY doc_id""".stripMargin

  /** Positional phrase search — the inverted-index probe: find every
    * document containing the exact two-token phrase, with occurrence
    * count and first position. The shape is posting-list intersection:
    * each term's (doc, position) list is filtered out of one
    * positional explode, then an EQUI join on (doc, pos-offset) aligns
    * adjacent occurrences — n-token phrases chain n−1 such joins.
    *
    * Scale: a search system materializes the positional index ONCE,
    * partitioned by term (the same stored-index pattern as the IVF-PQ
    * code table); the probe then reads only the phrase's terms'
    * partitions and never rescans text. Here the posting lists are
    * built inline so the query is self-contained; the join shape is
    * identical either way. */
  def phraseSearch(spark: SparkSession, sfDir: String,
      first: String = "sort", second: String = "merge"): DataFrame = {
    val pos = Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "token")
    val a = pos.filter(col("token") === first).select(col("doc_id"), col("pos"))
    val b = pos.filter(col("token") === second)
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    a.join(b, Seq("doc_id", "pos"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("pos")).cast("long").as("first_pos"))
      .orderBy(col("doc_id"))
  }

  /** Oracle twin of [[phraseSearch]] — the phrase tokens are
    * interpolated with the same defaults so a non-default call cannot
    * silently break Spark/oracle parity. */
  def phraseSearchSql(first: String = "sort", second: String = "merge"): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |pos AS (
      |  SELECT doc_id, unnest(generate_series(1, len(t))) AS p, t
      |  FROM toks),
      |a AS (SELECT doc_id, p - 1 AS pos FROM pos WHERE t[p] = '$first'),
      |b AS (SELECT doc_id, p - 2 AS pos FROM pos WHERE t[p] = '$second')
      |SELECT doc_id, count(*) AS n_hits, CAST(min(pos) AS BIGINT) AS first_pos
      |FROM a JOIN b USING (doc_id, pos)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Boilerplate span profile — the CCNet-style "remove lines that
    * repeat across the corpus" filter, expressed over token 5-grams
    * (this corpus has no line structure; a 5-gram is the span unit).
    * A 5-gram with document frequency ≥ `boilerDf` is boilerplate
    * (headers, footers, license blurbs — text shared by many unrelated
    * documents); each doc reports how much of it is boilerplate
    * (`boiler_ppm`, truncating integer division), the signal a cleaner
    * thresholds on before dropping or trimming the doc.
    *
    * Scale (round-7 restructure, judge finding #1): hashed 8-byte gram
    * keys, the DF table filtered to the small boilerplate SET before
    * any join, per-doc totals computed at the scan — see
    * [[boilerplateGrams]]/[[boilerplateFrom]] for the pass-by-pass
    * contract. Linear, never doc×doc; docs shorter than 5 tokens have
    * no spans and drop out. */
  def boilerplateNgrams(spark: SparkSession, sfDir: String,
      boilerDf: Int = 10): DataFrame =
    boilerplateFrom(spark, sfDir, boilerplateGrams(spark, sfDir), boilerDf)

  /** The (doc, gram-key) stream — one tokenize+explode pass. The gram
    * key is a 64-bit xxhash of the 5-token slice, NOT the joined
    * string: the key is only ever compared for equality (DF counts,
    * boiler-set join), and an 8-byte key shrinks the exploded shuffle
    * ~4× vs ~30-byte gram strings. Collision bound: ~n²/2⁶⁵ pair
    * probability — ~10⁻⁷ at 2.5 M grams; a corpus at 10¹⁰⁺ distinct
    * grams would swap in a 128-bit digest, same plan shape.
    * Package-visible for the plan audit. */
  private[ops] def boilerplateGrams(spark: SparkSession, sfDir: String): DataFrame = {
    val t = tokens
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(when(size(t) >= 5,
            transform(sequence(lit(1), size(t) - 4),
              i => xxhash64(slice(t, i, lit(5)))))
          .otherwise(array().cast("array<bigint>"))).as("ng"))
  }

  /** Rollup: pass A aggregates the gram stream into the DF table and
    * filters it to the BOILERPLATE set (df ≥ threshold — by
    * construction far smaller than the gram universe); pass B joins
    * the gram stream against that small set (AQE broadcasts it) and
    * partial-aggregates by doc BEFORE any shuffle. The per-doc gram
    * TOTAL needs no aggregation at all (`size(tokens) − 4`, computed
    * at the scan). Two corpus passes, but only pass A's DF agg ever
    * shuffles gram-stream volume — at 100 TB that beats persisting a
    * corpus-sized (doc, gram) intermediate (a cache write+read of the
    * same volume) and is why the earlier persist shape is gone. */
  private[ops] def boilerplateFrom(spark: SparkSession, sfDir: String,
      grams: DataFrame, boilerDf: Int): DataFrame = {
    val boiler = grams.groupBy(col("ng"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= boilerDf).select(col("ng"))
    val perDocBoiler = grams.join(boiler, Seq("ng"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("b"))
    val t = tokens
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), (size(t) - 4).cast("long").as("n_ngrams"))
      .filter(col("n_ngrams") > 0) // docs shorter than 5 tokens have no spans
      .join(perDocBoiler, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_ngrams"),
        coalesce(col("b"), lit(0L)).cast("long").as("n_boiler"))
      .withColumn("boiler_ppm", expr("(n_boiler * 1000000) DIV n_ngrams"))
      .orderBy(col("doc_id"))
  }

  /** Oracle twin of [[boilerplateNgrams]] — `boilerDf` interpolated. */
  def boilerplateNgramsSql(boilerDf: Int = 10): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |grams AS (
       |  SELECT doc_id, array_to_string(t[i:i+4], ' ') AS ng
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i FROM toks)),
       |dfreq AS (SELECT ng, count(DISTINCT doc_id) AS df FROM grams GROUP BY ng)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_ngrams,
       |  CAST(sum(CASE WHEN df >= $boilerDf THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       |  CAST(CAST(sum(CASE WHEN df >= $boilerDf THEN 1 ELSE 0 END) AS BIGINT) * 1000000
       |       // CAST(count(*) AS BIGINT) AS BIGINT) AS boiler_ppm
       |FROM grams JOIN dfreq USING (ng)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** PMI collocations — which token pairs co-occur far more than
    * chance (multi-word expressions, named entities, set phrases).
    * PMI = ln(c₁₂·N / (c₁·c₂)) over the corpus bigram table, with the
    * marginals c₁ (bigrams starting with w1) and c₂ (bigrams ending
    * with w2) derived from the SAME table so the distribution is
    * self-consistent. Scores are integer tenth-milli-nats (the
    * [[lmScore]] ln discipline); pairs below `minCount` are dropped —
    * PMI is unstable on rare counts.
    *
    * Scale: the bigram table is one explode + hash agg (map-side
    * combined, key space = distinct bigrams ≤ vocab²); both marginals
    * are re-aggregations OF THAT TABLE (not the corpus), and N is a
    * 1-row broadcast. Nothing downstream of the first agg touches
    * corpus-sized data. */
  def pmiCollocations(spark: SparkSession, sfDir: String,
      minCount: Int = 10): DataFrame = {
    val t = tokens
    val bg = Tables.documents(spark, sfDir)
      .select(explode(zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      // zip_with pads the shorter slice with null: drop the phantom
      // (last_token, null) pair or the c1/N marginals overcount by one
      // per document vs the oracle's exact n-1 bigrams
      .filter(col("w2").isNotNull)
    // the bigram-count table feeds FOUR consumers (m1, m2, n, and the
    // reported pairs) — truncate it once or the corpus explode+count
    // pass re-executes per consumer (r14: 4 scans → 1, measured)
    val cb = Truncate(
      bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")), "pmi-cb")
    val m1 = cb.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val m2 = cb.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val n = cb.agg(sum(col("c12")).as("n"))
    cb.filter(col("c12") >= minCount)
      .join(m1, Seq("w1")).join(m2, Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"),
        round(log(col("c12").cast("double") * col("n") / (col("c1") * col("c2"))) * 10000)
          .cast("long").as("pmi_tmn"))
      .orderBy(col("pmi_tmn").desc, col("w1"), col("w2"))
  }

  /** Oracle twin of [[pmiCollocations]] — `minCount` interpolated. */
  def pmiCollocationsSql(minCount: Int = 10): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |bg AS (
       |  SELECT t[i] AS w1, t[i + 1] AS w2
       |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)),
       |cb AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
       |m1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM cb GROUP BY w1),
       |m2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM cb GROUP BY w2),
       |nt AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM cb)
       |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
       |  CAST(round(ln(CAST(c12 AS DOUBLE) * n / (c1 * c2)) * 10000) AS BIGINT) AS pmi_tmn
       |FROM cb JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN nt
       |WHERE c12 >= $minCount
       |ORDER BY pmi_tmn DESC, w1, w2""".stripMargin

  /** Zipf's-law fit over the corpus term-frequency table: least-squares
    * slope/intercept of ln(freq) on ln(rank). Natural corpora slope
    * ≈ −1; a corpus that deviates hard (synthetic, boilerplate-heavy,
    * truncated vocab) shows up immediately, making this a one-row
    * corpus-health check.
    *
    * Engine parity: both logs are rounded to INTEGER tenth-milli-nats
    * (the q_lm_score ln discipline), so Σx, Σy, Σxy, Σx² are exact
    * BIGINT sums; only the final slope/intercept drop to doubles,
    * computed by the letter-identical closed form on both engines.
    * Scale factors cancel in the slope (both axes carry ×10⁴); the
    * intercept divides one factor back out.
    *
    * Scale: the term table is vocab-sized (model-sized, bounded by the
    * tokenizer, not the corpus), so the rank window's single partition
    * holds |vocab| rows — the one place a global window is legitimate.
    * The corpus-sized work is the one explode+count shuffle feeding
    * it. */
  def zipfSlope(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tf").desc, col("token"))
    val pts = Tables.documents(spark, sfDir)
      .select(explode(tokens).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .withColumn("rank", row_number().over(w))
      .select(round(log(col("rank").cast("double")) * 10000).cast("long").as("x"),
        round(log(col("tf").cast("double")) * 10000).cast("long").as("y"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val sxy = col("sxy").cast("double")
    pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .select(col("n"),
        (round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) + lit(0.0)).as("slope"),
        (round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n / 10000.0, 4)
          + lit(0.0)).as("intercept"))
  }

  def zipfSlopeSql: String =
    """WITH tf AS (
      |  SELECT token, count(*) AS tf
      |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |  GROUP BY token),
      |ranked AS (
      |  SELECT tf, row_number() OVER (ORDER BY tf DESC, token) AS rank FROM tf),
      |pts AS (
      |  SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 10000) AS BIGINT) AS x,
      |    CAST(round(ln(CAST(tf AS DOUBLE)) * 10000) AS BIGINT) AS y
      |  FROM ranked),
      |sums AS (
      |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM pts),
      |d AS (
      |  SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
      |    CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd
      |  FROM sums)
      |SELECT n,
      |  round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 4) + 0.0 AS slope,
      |  round((syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd) / nd / 10000.0, 4)
      |    + 0.0 AS intercept
      |FROM d""".stripMargin

  // --------------------------------------------------------------------
  // Stupid Backoff trigram language model (train/eval split)
  // --------------------------------------------------------------------

  /** Trigram language-model scoring with Stupid Backoff (Brants et
    * al., "Large Language Models in Machine Translation", EMNLP 2007 —
    * THE web-scale LM recipe: no discounting, no normalization, just
    * relative frequencies with a fixed 0.4 backoff penalty per level).
    * Counts are trained on the 95% split (`doc_id % 20 ≠ 0`, the
    * decontamination split) and every HELD-OUT doc is scored — unlike
    * [[lmScore]]'s self-trained bigram MLE, held-out trigrams can be
    * unseen, so the backoff path actually fires and is part of what
    * the oracle pins:
    * S(w₃|w₁w₂) = c₁₂₃/c₁₂  — else 0.4·c₂₃/c₂  — else 0.16·c₃/N
    * (unseen unigram: count 1). Per doc: positions scored, how many
    * backed off one resp. two levels, and the total/mean NLL in
    * integer tenth-milli-nats (each position's cost is ONE double
    * expression over integer counts, rounded once — BIGINT sums).
    *
    * Scale: count tables are corpus-global aggs on natural keys
    * (map-side combined); scoring is the eval positions LEFT-joined
    * against them on trigram/bigram/unigram strings — the tf-idf
    * join shape, never doc×doc. The 1-row N frame is the only
    * broadcast product. */
  def backoffLm(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val t = tokens
    val n = size(t)
    // positions with their trigram context, built from shifted slices
    // (the shingles idiom — never element_at in a lambda)
    def grams(d: DataFrame) = {
      val s2 = slice(t, lit(2), greatest(n - 1, lit(0)))
      val s3 = slice(t, lit(3), greatest(n - 2, lit(0)))
      val w123 = zip_with(zip_with(t, s2, (a, b) => concat(a, lit(" "), b)), s3,
        (ab, c) => concat(ab, lit(" "), c))
      d.select(col("doc_id"), explode(slice(w123, lit(1), greatest(n - 2, lit(1)))).as("t123"))
        .filter(col("t123").isNotNull)
        .withColumn("parts", split(col("t123"), " "))
        .select(col("doc_id"), col("t123"),
          concat_ws(" ", element_at(col("parts"), 1), element_at(col("parts"), 2)).as("b12"),
          concat_ws(" ", element_at(col("parts"), 2), element_at(col("parts"), 3)).as("b23"),
          element_at(col("parts"), 2).as("w2"), element_at(col("parts"), 3).as("w3"))
    }
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val eval_ = docs.filter(col("doc_id") % 20 === 0)
    val tri = grams(train).groupBy(col("t123")).agg(count(lit(1)).as("c123"))
    val trainTok = train.select(explode(t).as("w"))
    val uni = trainTok.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val nTot = trainTok.agg(count(lit(1)).as("n_train"))
    val bi = train.select(explode(zip_with(t, slice(t, lit(2), greatest(n - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("b"))
      .filter(col("b").isNotNull)
      .groupBy(col("b")).agg(count(lit(1)).as("c12"))
    val s = when(col("c123").isNotNull,
        col("c123").cast("double") / col("cb12"))
      .when(col("cb23").isNotNull,
        lit(0.4) * col("cb23") / col("c2"))
      .otherwise(lit(0.16) * coalesce(col("c3"), lit(1L)) / col("n_train"))
    grams(eval_)
      .join(tri, Seq("t123"), "left")
      .join(bi.select(col("b").as("b12"), col("c12").as("cb12")), Seq("b12"), "left")
      .join(bi.select(col("b").as("b23"), col("c12").as("cb23")), Seq("b23"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("c2")), Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("c1").as("c3")), Seq("w3"), "left")
      .crossJoin(broadcast(nTot))
      .select(col("doc_id"),
        when(col("c123").isNotNull, 0L)
          .when(col("cb23").isNotNull, 1L).otherwise(2L).as("level"),
        round(-log(s) * 10000).cast("long").as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pos"),
        sum(when(col("level") === 1, 1L).otherwise(0L)).as("n_bo1"),
        sum(when(col("level") === 2, 1L).otherwise(0L)).as("n_bo2"),
        sum(col("nll")).as("sum_nll"))
      .withColumn("avg_nll", expr("sum_nll DIV n_pos"))
      .orderBy(col("doc_id"))
  }

  def backoffLmSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tris AS (
      |  SELECT doc_id,
      |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS t123,
      |    t[i] || ' ' || t[i+1] AS b12,
      |    t[i+1] || ' ' || t[i+2] AS b23,
      |    t[i+1] AS w2, t[i+2] AS w3
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks)),
      |bis AS (
      |  SELECT doc_id, t[i] || ' ' || t[i+1] AS b
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)),
      |tri AS (
      |  SELECT t123, CAST(count(*) AS BIGINT) AS c123 FROM tris
      |  WHERE doc_id % 20 <> 0 GROUP BY t123),
      |bi AS (
      |  SELECT b, CAST(count(*) AS BIGINT) AS c12 FROM bis
      |  WHERE doc_id % 20 <> 0 GROUP BY b),
      |uni AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM (
      |    SELECT doc_id, unnest(t) AS w FROM toks) u
      |  WHERE doc_id % 20 <> 0 GROUP BY w),
      |ntot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_train FROM (
      |    SELECT doc_id, unnest(t) AS w FROM toks) u
      |  WHERE doc_id % 20 <> 0),
      |scored AS (
      |  SELECT e.doc_id,
      |    CASE WHEN tri.c123 IS NOT NULL THEN 0
      |         WHEN b23.c12 IS NOT NULL THEN 1 ELSE 2 END AS level,
      |    CAST(round(-ln(
      |      CASE WHEN tri.c123 IS NOT NULL
      |             THEN CAST(tri.c123 AS DOUBLE) / b12.c12
      |           WHEN b23.c12 IS NOT NULL
      |             THEN 0.4 * b23.c12 / u2.c1
      |           ELSE 0.16 * coalesce(u3.c1, 1) / t.n_train
      |      END) * 10000) AS BIGINT) AS nll
      |  FROM tris e
      |  LEFT JOIN tri ON tri.t123 = e.t123
      |  LEFT JOIN bi b12 ON b12.b = e.b12
      |  LEFT JOIN bi b23 ON b23.b = e.b23
      |  LEFT JOIN uni u2 ON u2.w = e.w2
      |  LEFT JOIN uni u3 ON u3.w = e.w3
      |  CROSS JOIN ntot t
      |  WHERE e.doc_id % 20 = 0)
      |SELECT doc_id, count(*) AS n_pos,
      |  CAST(sum(CASE WHEN level = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bo1,
      |  CAST(sum(CASE WHEN level = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bo2,
      |  CAST(sum(nll) AS BIGINT) AS sum_nll,
      |  CAST(CAST(sum(nll) AS BIGINT) // count(*) AS BIGINT) AS avg_nll
      |FROM scored
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // BM25 ranked retrieval
  // --------------------------------------------------------------------

  /** The default BM25 query — terms at moderate corpus df, the
    * [[phraseSearch]] vocabulary. */
  val Bm25Terms: Seq[String] = Seq("sort", "merge", "window")

  /** BM25 ranked retrieval (Robertson–Spärck Jones, the Lucene
    * practical scoring function): top-20 documents for a fixed
    * multi-term query, k1 = 1.2, b = 0.75, with Lucene's always-
    * positive idf = ln(1 + (N − df + 0.5)/(df + 0.5)). This is the
    * lexical retrieval baseline next to the dense stack
    * ([[graft.ops.Similarity]]) and the corpus-mining probes
    * ([[phraseSearch]], [[tfidf]]) — the ranker a RAG pipeline runs
    * when it says "BM25".
    *
    * Engine parity: every model input (tf, df, N, doc length, Σ
    * lengths) is an exact integer; each per-term score is ONE double
    * expression over those integers — identical IEEE tree in both
    * engines — rounded ONCE to an e4 integer, so the per-doc sum is
    * exact BIGINT arithmetic and the final order is total
    * (score desc, doc_id).
    *
    * Scale: term rows are filtered to the query's terms AT THE SCAN
    * (df and tf aggregate only matching rows — the posting-list
    * discipline); doc lengths are a stateless projection; the length
    * sum is a 1-row broadcast; top-20 is TakeOrdered. Nothing scans
    * more than (matching term rows + one length pass). */
  def bm25(spark: SparkSession, sfDir: String,
      terms: Seq[String] = Bm25Terms, k: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val lens = docs.select(col("doc_id"), size(tokens).cast("long").as("dl"))
    val totals = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val hits = docs.select(col("doc_id"), explode(tokens).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfs = hits.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val score =
      // Lucene BM25: idf * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
      // avgdl folded in as dl·N/Σdl — one double tree over integers
      round(
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
          (col("dl").cast("double") * col("n_docs")) / col("sum_dl"))) * 10000)
      .cast("long")
    hits
      .join(broadcast(dfs), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("dl"), score.as("s_e4"))
      .groupBy(col("doc_id"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("n_hit_terms"),
        sum(col("s_e4")).cast("long").as("bm25_e4"))
      .orderBy(col("bm25_e4").desc, col("doc_id"))
      .limit(k)
  }

  /** Oracle twin of [[bm25]] — terms/k interpolated, the identical
    * double expression tree. */
  def bm25Sql(terms: Seq[String] = Bm25Terms, k: Int = 20): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH lens AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
       |totals AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM lens),
       |hits AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
       |  WHERE term IN ($inList)
       |  GROUP BY doc_id, term),
       |dfs AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
       |scored AS (
       |  SELECT h.doc_id, l.dl,
       |    CAST(round(
       |      ln(1.0 + (t.n_docs - d.df + 0.5) / (d.df + 0.5)) *
       |      (h.tf * 2.2) /
       |      (h.tf + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE) * t.n_docs) / t.sum_dl))
       |      * 10000) AS BIGINT) AS s_e4
       |  FROM hits h
       |  JOIN dfs d USING (term)
       |  JOIN lens l USING (doc_id)
       |  CROSS JOIN totals t)
       |SELECT doc_id, max(dl) AS dl, count(*) AS n_hit_terms,
       |  CAST(sum(s_e4) AS BIGINT) AS bm25_e4
       |FROM scored
       |GROUP BY doc_id
       |ORDER BY bm25_e4 DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  // --------------------------------------------------------------------
  // Windowed co-occurrence PMI (the word2vec/GloVe count table)
  // --------------------------------------------------------------------

  /** Skip-gram window co-occurrence with PMI ranking — the count
    * table word2vec/GloVe-style embedding training consumes, and the
    * wider-window sibling of [[pmiCollocations]] (adjacency only):
    * ordered token pairs (w₁ before w₂) within `window` positions in
    * the same document, top-`k` by PMI among pairs with `minCount`+
    * support.
    *
    * Scale: the pair generator is the BANDED join, not a range join —
    * each center position emits its `window` target positions
    * (`explode(sequence(pos+1, pos+window))`) and pairs come from an
    * EQUI-join on (doc_id, position), so per-doc cost is
    * tokens × window, never tokens² (the [[graft.ops.Behavior]]
    * session-overlap lesson applied to text). Marginals re-aggregate
    * the pair table (one corpus-sized shuffle total); top-k streams
    * through TakeOrdered. The oracle keeps DuckDB's native range
    * join, so green also re-proves the banding loss-free. */
  def cooccurWindow(spark: SparkSession, sfDir: String, window: Int = 4,
      minCount: Int = 10, k: Int = 100): DataFrame = {
    val pos = Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(tokens).as(Seq("pos", "w")))
    val centers = pos.select(col("doc_id"), col("w").as("w1"),
      explode(sequence(col("pos") + 1, col("pos") + window)).as("tpos"))
    val contexts = pos.select(col("doc_id"), col("pos").as("tpos"), col("w").as("w2"))
    val cb = centers.join(contexts, Seq("doc_id", "tpos"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val m1 = cb.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val m2 = cb.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val n = cb.agg(sum(col("c12")).as("n"))
    cb.filter(col("c12") >= minCount)
      .join(m1, Seq("w1")).join(m2, Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"),
        round(log(col("c12").cast("double") * col("n") / (col("c1") * col("c2"))) * 10000)
          .cast("long").as("pmi_tmn"))
      .orderBy(col("pmi_tmn").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Oracle twin of [[cooccurWindow]] — DuckDB keeps the plain range
    * join the banding replaces. */
  def cooccurWindowSql(window: Int = 4, minCount: Int = 10, k: Int = 100): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |pos AS (
       |  SELECT doc_id, t[i] AS w, i
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks)),
       |cb AS (
       |  SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS c12
       |  FROM pos a JOIN pos b
       |    ON a.doc_id = b.doc_id AND b.i BETWEEN a.i + 1 AND a.i + $window
       |  GROUP BY a.w, b.w),
       |m1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM cb GROUP BY w1),
       |m2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM cb GROUP BY w2),
       |n AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM cb)
       |SELECT cb.w1, cb.w2, cb.c12,
       |  CAST(round(ln(CAST(cb.c12 AS DOUBLE) * n.n / (m1.c1 * m2.c2)) * 10000) AS BIGINT)
       |    AS pmi_tmn
       |FROM cb JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN n
       |WHERE cb.c12 >= $minCount
       |ORDER BY pmi_tmn DESC, w1, w2
       |LIMIT $k""".stripMargin

  // --------------------------------------------------------------------
  // Heaps-law vocabulary growth
  // --------------------------------------------------------------------

  /** Heaps'-law vocabulary growth — the corpus-card curve next to
    * [[zipfSlope]]'s frequency law: how many DISTINCT tokens have
    * appeared after the first n tokens of the corpus (docs in doc_id
    * order, tokens in position order). Output is one row per
    * doubling cohort c — tokens whose FIRST occurrence position p
    * satisfies ⌊log₂(p+1)⌋ = c — with the cumulative vocabulary
    * `vocab_cum` = V(2^(c+1) − 1). A flattening curve says the
    * tokenizer's OOV tail is closing; a persistently steep one says
    * more data keeps buying vocabulary (the scaling-law input for
    * vocab-size choice).
    *
    * Engine shape: global token positions come from the
    * [[Pipeline.seqPack]] two-level SHARDED exclusive prefix sum
    * (bucket-local window + a shards-row broadcast carry — no global
    * sort at any corpus size; the oracle uses the plain global
    * window, so green re-proves the rewrite); first occurrences are
    * one min-agg on the token (map-side combined); cohorts use
    * `length(bin(p+1))−1` — pure integer log₂, identical in both
    * engines. The cohort histogram is ≤ log₂(corpus) rows, so the
    * cumulative window is free. */
  def vocabGrowth(spark: SparkSession, sfDir: String, shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), size(tokens).cast("long").as("n_tokens"))
    val bounds = docs.agg(min(col("doc_id")).as("__lo"), max(col("doc_id")).as("__hi"))
    val bucketed = docs.crossJoin(broadcast(bounds))
      .withColumn("__bucket", least(lit(shards - 1L),
        expr(s"((doc_id - __lo) * $shards) DIV (__hi - __lo + 1)")))
      .drop("__lo", "__hi")
    val wLocal = Window.partitionBy(col("__bucket"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("__local_off",
      coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    val wCarry = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bucketed.groupBy(col("__bucket"))
      .agg(sum(col("n_tokens")).as("__btot"))
      .withColumn("__carry", coalesce(sum(col("__btot")).over(wCarry), lit(0L)))
      .select(col("__bucket"), col("__carry"))
    val offs = local.join(broadcast(carry), Seq("__bucket"))
      .select(col("doc_id"), col("text"), (col("__local_off") + col("__carry")).as("off"))
    val fo = offs
      .select(col("off"), posexplode(tokens).as(Seq("pos", "token")))
      .groupBy(col("token")).agg(min(col("off") + col("pos")).as("p"))
    val wCum = Window.orderBy(col("cohort"))
    fo.select((length(bin(col("p") + 1)) - 1).cast("long").as("cohort"))
      .groupBy(col("cohort")).agg(count(lit(1)).as("n_new"))
      .withColumn("vocab_cum", sum(col("n_new")).over(wCum))
      .withColumn("corpus_prefix", expr("CAST(pow(2, cohort + 1) AS BIGINT) - 1"))
      .orderBy(col("cohort"))
  }

  /** Oracle twin of [[vocabGrowth]] — the PLAIN global-window prefix
    * sum (the sharded engine path must be bit-identical). */
  def vocabGrowthSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |offs AS (
      |  SELECT doc_id,
      |    COALESCE(sum(len(t)) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |  FROM toks),
      |pos AS (
      |  SELECT o.off + x.i - 1 AS gpos, x.t[x.i] AS token
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks) x
      |  JOIN offs o USING (doc_id)),
      |fo AS (SELECT token, CAST(min(gpos) AS BIGINT) AS p FROM pos GROUP BY token),
      |coh AS (
      |  SELECT CAST(length(bin(p + 1)) - 1 AS BIGINT) AS cohort, count(*) AS n_new
      |  FROM fo GROUP BY 1)
      |SELECT cohort, n_new,
      |  CAST(sum(n_new) OVER (ORDER BY cohort
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_cum,
      |  CAST(pow(2, cohort + 1) AS BIGINT) - 1 AS corpus_prefix
      |FROM coh
      |ORDER BY cohort""".stripMargin

  // --------------------------------------------------------------------
  // Interpolated Kneser–Ney bigram language model (train/eval split)
  // --------------------------------------------------------------------

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen
    * & Goodman 1999's interpolated form — THE standard n-gram
    * smoothing, completing the LM ladder next to [[lmScore]]'s MLE
    * and [[backoffLm]]'s Stupid Backoff):
    *
    * `p(w₂|w₁) = max(c₁₂ − D, 0)/c₁· + (D·N₁₊(w₁·)/c₁·) · p_cont(w₂)`
    * `p_cont(w₂) = N₁₊(·w₂) / |bigram types|`, D = 0.75.
    *
    * Trained on the 5% SEED split (`doc_id % 20 = 0`) and scored on
    * the other 95% — the CCNet direction: a small in-domain seed LM
    * scores the big crawl, so unseen continuations are a fact of
    * life, not an edge case. Context count `c₁·` and fan-out `N₁₊(w₁·)` come
    * from the bigram table itself (exact KN, not the token-count
    * approximation); an eval bigram whose context was never seen
    * falls to the continuation distribution alone, and an unseen
    * CONTINUATION takes count 1 (the [[backoffLm]] floor rule) so
    * the cost stays finite — the unseen-bigram branch carries ~20%
    * of eval positions at sf0.001 and the unseen-context branch
    * fires at sf0.01+, all pinned by the oracle hash.
    *
    * Engine parity: every model input is an exact integer; each
    * position's cost is ONE double expression over those integers
    * rounded once to tenth-milli-nats; per-doc sums are BIGINT.
    *
    * Scale: three seed-sized count tables (map-side combined) + the
    * eval positions LEFT-joined on natural keys — the [[backoffLm]]
    * join shape, never doc×doc; the type-count frame is the only
    * 1-row broadcast. */
  def knLm(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val t = tokens
    def grams(d: DataFrame) = d.select(col("doc_id"),
        explode(zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
          (x, y) => concat(x, lit(" "), y))).as("bg"))
      .filter(col("bg").isNotNull)
      .select(col("doc_id"), col("bg"),
        substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val train = grams(docs.filter(col("doc_id") % 20 === 0))
    val bi = train.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val biSplit = bi.select(col("bg"),
      substring_index(col("bg"), " ", 1).as("w1"),
      substring_index(col("bg"), " ", -1).as("w2"), col("c12"))
    val ctx = biSplit.groupBy(col("w1"))
      .agg(sum(col("c12")).as("ctx1"), count(lit(1)).as("n1fwd"))
    val cont = biSplit.groupBy(col("w2")).agg(count(lit(1)).as("n1bwd"))
    val types = bi.agg(count(lit(1)).as("n_types"))
    val pCont = coalesce(col("n1bwd"), lit(1L)).cast("double") / col("n_types")
    val p = when(col("ctx1").isNotNull,
        greatest(coalesce(col("c12"), lit(0L)).cast("double") - lit(0.75), lit(0.0)) / col("ctx1")
          + (lit(0.75) * col("n1fwd") / col("ctx1")) * pCont)
      .otherwise(pCont)
    grams(docs.filter(col("doc_id") % 20 =!= 0))
      .join(bi, Seq("bg"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(types))
      .select(col("doc_id"),
        when(col("ctx1").isNull, 1L).otherwise(0L).as("u_ctx"),
        when(col("c12").isNull, 1L).otherwise(0L).as("u_bi"),
        round(-log(p) * 10000).cast("long").as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pos"),
        sum(col("u_ctx")).as("n_unseen_ctx"),
        sum(col("u_bi")).as("n_unseen_bi"),
        sum(col("nll")).as("sum_nll"))
      .withColumn("avg_nll", expr("sum_nll DIV n_pos"))
      .orderBy(col("doc_id"))
  }

  /** Oracle twin of [[knLm]] — the identical double tree per
    * position. */
  def knLmSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg, t[i] AS w1, t[i+1] AS w2
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)),
      |bi AS (
      |  SELECT bg, w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM grams
      |  WHERE doc_id % 20 = 0 GROUP BY bg, w1, w2),
      |ctx AS (
      |  SELECT w1, CAST(sum(c12) AS BIGINT) AS ctx1,
      |    CAST(count(*) AS BIGINT) AS n1fwd
      |  FROM bi GROUP BY w1),
      |cont AS (
      |  SELECT w2, CAST(count(*) AS BIGINT) AS n1bwd FROM bi GROUP BY w2),
      |types AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bi),
      |scored AS (
      |  SELECT e.doc_id,
      |    CASE WHEN c.ctx1 IS NULL THEN 1 ELSE 0 END AS u_ctx,
      |    CASE WHEN b.c12 IS NULL THEN 1 ELSE 0 END AS u_bi,
      |    CAST(round(-ln(
      |      CASE WHEN c.ctx1 IS NOT NULL
      |        THEN greatest(CAST(coalesce(b.c12, 0) AS DOUBLE) - 0.75, 0.0) / c.ctx1
      |             + (0.75 * c.n1fwd / c.ctx1) *
      |               (CAST(coalesce(n.n1bwd, 1) AS DOUBLE) / y.n_types)
      |        ELSE CAST(coalesce(n.n1bwd, 1) AS DOUBLE) / y.n_types
      |      END) * 10000) AS BIGINT) AS nll
      |  FROM grams e
      |  LEFT JOIN bi b ON b.bg = e.bg
      |  LEFT JOIN ctx c ON c.w1 = e.w1
      |  LEFT JOIN cont n ON n.w2 = e.w2
      |  CROSS JOIN types y
      |  WHERE e.doc_id % 20 <> 0)
      |SELECT doc_id, count(*) AS n_pos,
      |  CAST(sum(u_ctx) AS BIGINT) AS n_unseen_ctx,
      |  CAST(sum(u_bi) AS BIGINT) AS n_unseen_bi,
      |  CAST(sum(nll) AS BIGINT) AS sum_nll,
      |  CAST(CAST(sum(nll) AS BIGINT) // count(*) AS BIGINT) AS avg_nll
      |FROM scored
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
}
