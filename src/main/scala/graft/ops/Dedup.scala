package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication surface over `documents` (north-star extension):
  * exact (hash-groupBy), MinHash+LSH near-dup (shingle → signature →
  * band → bucket-join → Jaccard verify), and SimHash.
  *
  * Scale architecture (the point of these operators at 100 TB):
  *  - exact dedup is a single hash shuffle on the fingerprint;
  *  - MinHash/LSH never compares all pairs — candidates come from
  *    equality joins on band signatures (shuffle on band key), then
  *    only candidates pay the exact-Jaccard verify;
  *  - SimHash reduces a document to one 16-bit integer; bucket counts
  *    find clusters with a single agg.
  *
  * Engine-parity notes: hashes are md5 (byte-identical across
  * engines); MinHash "permutations" are salted md5s compared
  * lexicographically (min over shingles), avoiding any engine-specific
  * integer hash; SimHash bit weights come from the first 4 hex digits
  * of md5 via base-16 parse (`conv` ≡ DuckDB `('0x'||h)::BIGINT`).
  */
object Dedup {

  private def tokens: Column = split(col("text"), " ")

  /** Exact-dup summary: corpus size vs distinct fingerprints, number
    * of duplicate groups, redundant rows to drop. */
  def exactSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(md5(col("text")).as("fp"))
    val groups = docs.groupBy(col("fp")).agg(count(lit(1)).as("n"))
    groups.agg(
        sum(col("n")).cast("long").as("n_docs"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).cast("long").as("n_dup_groups"),
        sum(col("n") - 1).cast("long").as("n_redundant"))
  }

  def exactSummarySql: String =
    """SELECT CAST(sum(n) AS BIGINT) AS n_docs,
      |  count(*) AS n_distinct,
      |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
      |  CAST(sum(n - 1) AS BIGINT) AS n_redundant
      |FROM (SELECT md5(text) AS fp, count(*) AS n FROM documents GROUP BY md5(text))""".stripMargin

  /** Exact dedup keep-list: for each duplicate group, the canonical
    * (min doc_id) survivor and the copies collapsed. */
  def exactGroups(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .orderBy(col("keep_id"))

  def exactGroupsSql: String =
    """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |HAVING count(*) > 1
      |ORDER BY keep_id""".stripMargin

  /** Token 3-gram shingles of a document. */
  private def shingles: Column =
    transform(sequence(lit(1), greatest(size(tokens) - 2, lit(1))),
      i => concat_ws(" ",
        element_at(tokens, i),
        element_at(tokens, i + 1),
        element_at(tokens, i + 2)))

  private val ShinglesSqlDuck: String =
    """list_transform(range(1, greatest(len(string_split(text,' ')) - 1, 2)),
      | i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])"""
      .stripMargin.replace("\n", "")

  /** MinHash signature component k: lexicographic min over shingles of
    * the salted hash md5(k|shingle) — one deterministic "permutation"
    * per salt, identical in any engine with md5. */
  private def minhash(k: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(k.toString), lit("|"), s))))

  private def minhashSqlDuck(k: Int): String =
    s"list_min(list_transform($ShinglesSqlDuck, s -> md5('$k' || '|' || s)))"

  /** Per-doc MinHash signatures (4 permutations shown; the LSH query
    * derives 2 bands of 2 rows from the same signatures). */
  def minhashSignatures(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        minhash(0).as("sig0"), minhash(1).as("sig1"),
        minhash(2).as("sig2"), minhash(3).as("sig3"))
      .orderBy(col("doc_id"))

  def minhashSignaturesSql: String =
    s"""SELECT doc_id,
       |  ${minhashSqlDuck(0)} AS sig0, ${minhashSqlDuck(1)} AS sig1,
       |  ${minhashSqlDuck(2)} AS sig2, ${minhashSqlDuck(3)} AS sig3
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** LSH candidate pairs + exact-Jaccard verify: docs sharing either
    * band bucket (band = hash of 2 signature rows) become candidates;
    * only candidates pay the exact token-set Jaccard, and pairs at
    * ≥ 0.5 survive. This is the full near-dup pipeline — no pairwise
    * scan anywhere. */
  def lshNearDupPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sigs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_distinct(tokens).as("toks"),
        md5(concat(minhash(0), minhash(1))).as("band1"),
        md5(concat(minhash(2), minhash(3))).as("band2"))
    val a = sigs.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"),
      col("band1").as("b1a"), col("band2").as("b2a"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"),
      col("band1").as("b1b"), col("band2").as("b2b"))
    a.join(b, col("doc_a") < col("doc_b") &&
        (col("b1a") === col("b1b") || col("b2a") === col("b2b")))
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("toks_a"), col("toks_b"))) /
          size(array_distinct(concat(col("toks_a"), col("toks_b")))).cast("double"), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def lshNearDupPairsSql: String =
    s"""WITH sigs AS (
       |  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
       |    md5(${minhashSqlDuck(0)} || ${minhashSqlDuck(1)}) AS band1,
       |    md5(${minhashSqlDuck(2)} || ${minhashSqlDuck(3)}) AS band2
       |  FROM documents)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  round(len(list_intersect(a.toks, b.toks)) /
       |        CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) AS jaccard
       |FROM sigs a JOIN sigs b
       |  ON a.doc_id < b.doc_id AND (a.band1 = b.band1 OR a.band2 = b.band2)
       |WHERE round(len(list_intersect(a.toks, b.toks)) /
       |      CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** 16-bit SimHash per doc + bucket sizes. Bit j's weight is the sign
    * of Σ_tokens (bit_j(h(token))·2 − 1) where h = first 16 bits of
    * md5. Identical fingerprints (same bucket) are near-dup candidates
    * at hamming distance 0. */
  def simhashBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val h = conv(substring(md5(col("token")), 1, 4), 16, 10).cast("long")
    val bitSums = (0 until 16).map(j =>
      sum(shiftright(h, j).bitwiseAND(1) * 2 - 1).as(s"s$j"))
    val simhash = (0 until 16).map(j =>
      when(col(s"s$j") > 0, 1L << j).otherwise(0L)).reduce((a, b) => a + b)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(tokens).as("token"))
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simhash.as("simhash"))
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("simhash"))
  }

  def simhashBucketsSql: String = {
    val h = "(('0x' || substr(md5(token), 1, 4))::BIGINT)"
    val bitSums = (0 until 16).map(j => s"sum((($h >> $j) & 1) * 2 - 1) AS s$j").mkString(", ")
    val simhash = (0 until 16).map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       |sums AS (
       |  SELECT doc_id, $bitSums FROM toks GROUP BY doc_id),
       |hashes AS (
       |  SELECT doc_id, CAST($simhash AS BIGINT) AS simhash FROM sums)
       |SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc
       |FROM hashes
       |GROUP BY simhash
       |HAVING count(*) > 1
       |ORDER BY simhash""".stripMargin
  }
}
