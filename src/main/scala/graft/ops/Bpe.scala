package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: a real merge-rule BPE (train +
  * apply), upgrading the regex pre-tokenizer in [[Text.tokenCounts]]
  * to vocab-driven token counts.
  *
  * TRAINING ([[train]]) is the classic algorithm (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016): start from characters, repeatedly merge the most
  * frequent adjacent symbol pair; deterministic tie-break
  * (count desc, pair lexicographic asc). The library surface trains on
  * any (word, freq) table; the QUERY uses merges trained on the pinned
  * [[seedCorpus]] so the rule table is a compile-time constant shared
  * by the Spark expression and the DuckDB oracle (training inside the
  * oracle SQL would need iteration DuckDB can't express).
  *
  * APPLICATION is pure string algebra available in every engine: a
  * word becomes the delimited symbol string `||c1||c2||…||` and each
  * merge (a,b), in training order, is ONE literal replace of
  * `|a||b|` → `|ab|`. The double-delimiter encoding makes left-to-right
  * non-overlapping replace exactly the BPE merge semantics (each
  * replacement re-closes its outer delimiters, so an adjacent
  * following pair still matches — verified against the JVM reference
  * implementation in BpeSpec), and symbol boundaries can never be
  * confused because symbols (ASCII letter runs) never contain `|`.
  * Token count = delimiter-group count − 1, computed from length
  * deltas — no split needed.
  *
  * Scale: application is a per-row expression chain (no shuffle, no
  * UDF — whole-stage codegen'd `replace` calls); counting aggregates
  * map-side. The merge table rides inside the expression tree, the
  * size analogue of a broadcast — fine for the ≤ a-few-hundred merges
  * a query would inline; a production 50k-merge vocab would move
  * application into a generated lookup expression, same plan shape.
  */
object Bpe {

  /** Left-to-right, non-overlapping single-pair merge — the unit step
    * of both training and the replace-chain application. */
  private[ops] def mergeOnce(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `nMerges` merge rules from a (word, freq) table.
    * Deterministic: best pair = max count, ties to the
    * lexicographically smallest (a, b). Stops early if no pair occurs
    * twice. */
  def train(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var corpus: Map[Vector[String], Long] = wordFreq
      .groupMapReduce(_._1)(_._2)(_ + _)
      .map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var n = 0
    while (n < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      corpus.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }
        .headOption.filter(_._2 > 1).map(_._1)
      best match {
        case None => done = true
        case Some((a, b)) =>
          merges += ((a, b))
          corpus = corpus.groupMapReduce { case (syms, _) => mergeOnce(syms, a, b) }(_._2)(_ + _)
          n += 1
      }
    }
    merges.result()
  }

  /** JVM reference application (used by tests to pin the replace-chain
    * semantics, and by callers that want driver-side tokenization). */
  def applyMerges(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) { case (syms, (a, b)) => mergeOnce(syms, a, b) }

  /** Pinned training corpus for the query-surface vocab: common
    * English word stems with Zipf-ish weights. A compile-time constant
    * so the learned rule table is identical in the Spark expression,
    * the DuckDB oracle, and across rounds. */
  val seedCorpus: Seq[(String, Long)] = Seq(
    "the" -> 60L, "and" -> 40L, "that" -> 25L, "this" -> 22L, "with" -> 20L,
    "from" -> 16L, "have" -> 15L, "there" -> 12L, "their" -> 11L, "then" -> 10L,
    "them" -> 10L, "these" -> 9L, "thing" -> 8L, "think" -> 8L, "other" -> 8L,
    "another" -> 6L, "weather" -> 5L, "rather" -> 5L, "gather" -> 4L,
    "station" -> 6L, "nation" -> 5L, "relation" -> 4L, "information" -> 4L,
    "ing" -> 12L, "being" -> 7L, "doing" -> 6L, "going" -> 6L, "during" -> 5L,
    "under" -> 6L, "over" -> 7L, "after" -> 7L, "water" -> 5L, "later" -> 4L,
    "here" -> 8L, "where" -> 7L, "were" -> 9L, "are" -> 12L, "more" -> 9L,
    "some" -> 8L, "same" -> 6L, "time" -> 9L, "tion" -> 10L)

  /** The query vocab: 32 rules trained on [[seedCorpus]]. */
  val merges: Seq[(String, String)] = train(seedCorpus, 32)

  /** Number of BPE tokens of a lowercase-alpha word column, via the
    * delimited-replace chain over [[merges]]. */
  def tokenCountCol(word: Column): Column = {
    // "the" -> "||t||h||e||"
    val encoded = concat(lit("||"), regexp_replace(word, "(.)", "$1||"))
    val merged = merges.foldLeft(encoded) { case (c, (a, b)) =>
      replace(c, lit(s"|$a||$b|"), lit(s"|$a$b|"))
    }
    // delimiter runs are always exactly "||": groups = symbols + 1
    ((length(merged) - length(replace(merged, lit("||"), lit("")))) / 2 - 1).cast("long")
  }

  private[ops] def tokenCountSqlDuck(word: String): String = {
    val encoded = s"'||' || regexp_replace($word, '(.)', '\\1||', 'g')"
    val merged = merges.foldLeft(encoded) { case (s, (a, b)) =>
      s"replace($s, '|$a||$b|', '|$a$b|')"
    }
    s"CAST((length($merged) - length(replace($merged, '||', ''))) / 2 - 1 AS BIGINT)"
  }

  /** Per-language BPE token counts over `documents`: lowercase alpha
    * words, merge-rule tokenization, per-lang totals.
    *
    * The Spark side applies the vocab via the native rank-greedy
    * expression ([[graft.functions.BpeTokens]] — vocab-size-
    * independent, ~2× the replace chain even at 32 rules, and the only
    * path that survives a 50k-merge production vocab); the ORACLE
    * keeps the replace-chain SQL, so the correctness gate itself
    * re-proves the two applications identical on every run. */
  def bpeTokens(spark: SparkSession, sfDir: String): DataFrame =
    // NOTE (r15): the distinct-word + weighted-sum shape that pays off
    // for [[graft.ops.Unigram.tokenizerCompare]] (three tokenizers per
    // word) measured neutral-to-slower here — one merge replay per
    // occurrence is cheaper than the added (lang, word) exchange when
    // only one tokenizer runs. Per-occurrence scoring stays.
    Tables.documents(spark, sfDir)
      .select(col("lang"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("word"))
      .select(col("lang"),
        size(graft.functions.TextFunctions.bpe_tokens(col("word"), merges)).as("n_tok"),
        length(col("word")).as("n_chars"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_tok")).cast("long").as("n_bpe_tokens"),
        // chars-per-token: the compression the learned vocab buys
        round(sum(col("n_chars")).cast("double") / sum(col("n_tok")), 4).as("chars_per_token"))
      .orderBy(col("lang"))

  def bpeTokensSql: String =
    s"""SELECT lang,
       |  count(*) AS n_words,
       |  CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
       |  round(CAST(sum(n_chars) AS DOUBLE) / sum(n_tok), 4) AS chars_per_token
       |FROM (
       |  SELECT lang, ${tokenCountSqlDuck("word")} AS n_tok, length(word) AS n_chars
       |  FROM (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |        FROM documents))
       |GROUP BY lang
       |ORDER BY lang""".stripMargin
}
