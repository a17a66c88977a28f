package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only 50× documents probe (≈250k docs): synthesizes a 50×
  * corpus by replicating sf0.1 documents with a PER-REPLICA token
  * appended — byte-identical replication would put every doc in a
  * 50-member exact-dup cluster and blow candidate pairs up
  * quadratically in replica count, which says nothing about real
  * corpora; the perturbation keeps near-dup cluster sizes at their
  * natural scale while multiplying corpus volume. Runs the near-dup
  * family end-to-end to expose any super-linear constant the 10×
  * probe is too small to see. */
object Scale50 {
  private def time[T](name: String)(f: => T): T = DevTiming.time("scale50")(name)(f)
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val d = "/tmp/sf50"
    val docs50 = s"$d/documents.parquet"
    if (!new java.io.File(docs50).exists()) {
      val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val n = base.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
      time("synthesize 50x docs") {
        // per-replica tag on every ODD token: replicas of one base doc
        // share only the even tokens (pairwise Jaccard ≈ 1/3 < the 0.5
        // threshold), so they do NOT form 50-member near-dup clusters —
        // while near-dup pairs WITHIN a replica keep their natural
        // similarity (both docs get the same transformation). Corpus
        // volume ×50, cluster structure ×50, cluster SIZE unchanged.
        base.crossJoin(spark.range(50).select(col("id").as("rep")))
          .select(
            (col("doc_id") + col("rep") * n).as("doc_id"),
            array_join(transform(split(col("text"), " "),
              (t, i) => when(i % 2 === 1, concat(t, lit("_r"), col("rep"))).otherwise(t)),
              " ").as("text"),
            col("lang"), col("source"))
          .repartition(64)
          .write.mode("overwrite").parquet(docs50)
      }
    }
    println("  docs=" + spark.read.parquet(docs50).count())
    time("minhash_signatures 250k")(ops.Dedup.minhashSignatures(spark, d).count())
    time("lsh_near_dup 250k")(println("  pairs=" + ops.Dedup.lshNearDupPairs(spark, d).count()))
    time("simhash_near_dup 250k")(println("  pairs=" + ops.Dedup.simhashNearDup(spark, d).count()))
    time("near_dedup_summary 250k")(ops.Dedup.nearDedupSummary(spark, d).count())
    time("bpe_tokens 250k")(ops.Bpe.bpeTokens(spark, d).count())
    time("lang_id_ngram 250k")(ops.Text.langIdNgram(spark, d).count())
    time("decontaminate 250k")(println("  contaminated=" + ops.Dedup.decontaminate(spark, d).count()))
    time("doc_repetition 250k")(ops.Text.docRepetition(spark, d).count())
    time("seq_pack 250k")(ops.Pipeline.seqPack(spark, d).count())
    time("chunk_windows 250k")(ops.Pipeline.chunkWindows(spark, d).count())
    time("source_mix 250k")(ops.Pipeline.sourceMix(spark, d).count())
    time("pii_redact 250k")(ops.Pipeline.piiRedact(spark, d).count())
    time("substring_overlap 250k")(println("  pairs=" + ops.Dedup.substringOverlap(spark, d).count()))
    time("dsir_weights 250k")(ops.Selection.dsirWeights(spark, d).count())
    time("ngram_diversity 250k")(ops.Selection.ngramDiversity(spark, d).count())
    time("char_entropy 250k")(ops.Selection.charEntropy(spark, d).count())
    time("prefix_dup 250k")(ops.Selection.prefixDup(spark, d).count())
    time("weighted_median 250k")(ops.Selection.weightedMedian(spark, d).count())
    time("exact_sample 250k")(ops.Selection.exactSample(spark, d).count())
    time("seq_pack_split 250k")(ops.Pipeline.seqPackSplit(spark, d).count())
    time("length_quality_grid 250k")(ops.Selection.lengthQualityGrid(spark, d).count())

    // 50× embeddings (100k vectors): replicas get a per-replica
    // component bump on dimension (rep mod dim) — large enough to
    // break exact duplication, small enough to keep the corpus's
    // similarity structure
    val vecs50 = s"$d/embeddings.parquet"
    if (!new java.io.File(vecs50).exists()) {
      val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val n = base.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1
      time("synthesize 50x embeddings") {
        base.crossJoin(spark.range(50).select(col("id").as("rep")))
          .select(
            (col("vec_id") + col("rep") * n).as("vec_id"),
            transform(col("embedding"),
              // +1: rep ∈ {0,17,34} would otherwise get a ZERO bump
              // and produce byte-identical replicas — the exact-dup
              // explosion this synthesis exists to avoid
              (v, i) => when(i === pmod(col("rep"), size(col("embedding"))),
                v + (col("rep") % 17 + 1).cast("float") * 0.01f).otherwise(v)).as("embedding"),
            col("label"))
          .repartition(64)
          .write.mode("overwrite").parquet(vecs50)
      }
    }
    println("  vecs=" + spark.read.parquet(vecs50).count())
    time("knn_brute_force 100k vecs")(ops.Similarity.knnBruteForce(spark, d).count())
    time("hyperplane 32x16 100k vecs")(println("  pairs=" +
      ops.Similarity.hyperplaneLshPairs(spark, d, nPlanes = 32, bandBits = 16).count()))
    time("ivf_trained_topk 100k vecs")(ops.Similarity.ivfTrainedTopK(spark, d).count())
    // round-5 session-3 surface on the natural-length 50×/5× corpus
    time("norm_dedup 250k")(ops.Dedup.normDedup(spark, d).count())
    time("lsh_band_tune 250k")(ops.Dedup.lshBandTune(spark, d).count())
    time("ccnet_buckets 250k")(ops.Text.ccnetBuckets(spark, d).count())
    time("backoff_lm 250k")(ops.Text.backoffLm(spark, d).count())
    time("bm25 250k")(ops.Text.bm25(spark, d).count())
    time("knn_classify 100k vecs")(ops.Similarity.knnClassify(spark, d).count())
    time("maxsim 100k vecs")(ops.Similarity.maxSim(spark, d).count())
    time("mmr_rerank 100k vecs")(ops.Similarity.mmrRerank(spark, d).count())
    // round-6 session-3 operators
    time("cdc_chunks 250k")(ops.Dedup.cdcChunks(spark, d).count())
    time("dedup_agreement 250k")(ops.Dedup.dedupMethodAgreement(spark, d).count())
    time("silhouette 100k vecs")(ops.Similarity.silhouette(spark, d).count())
    time("hybrid_rrf 250k docs")(ops.Similarity.hybridRrf(spark, d).count())
    spark.stop()
  }
}
