package graft
import org.apache.spark.sql.SparkSession
object ScaleProbe {
  private def time[T](name: String)(f: => T): T = DevTiming.time("scale")(name)(f)
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val d = "/tmp/sfbig"
    time("lsh_near_dup 50k docs")(println("  pairs=" + ops.Dedup.lshNearDupPairs(spark, d).count()))
    time("near_dedup 50k docs")(ops.Dedup.nearDedupSummary(spark, d).count())
    time("sessionize 1M events")(ops.Windows.sessionize(spark, d).count())
    time("event_pairs 1M events")(ops.EventOps.eventPairs60s(spark, d).count())
    time("knn 20k vecs")(ops.Similarity.knnBruteForce(spark, d).count())
    time("ivf_topk 20k vecs")(ops.Similarity.ivfTopK(spark, d).count())
    time("grid_near_dup 20k vecs")(println("  pairs=" + ops.Similarity.gridNearDupPairs(spark, d).count()))
    time("tfidf 50k docs")(ops.Text.tfidf(spark, d).count())
    time("hll approx-distinct (sketch only)")(ops.Aggregates.approxDistinctRaw(spark, d).count())
    time("simhash 50k docs")(ops.Dedup.simhashBuckets(spark, d).count())
    time("simhash_near_dup 50k docs")(println("  pairs=" + ops.Dedup.simhashNearDup(spark, d).count()))
    time("simhash 6-band hamming<=3 50k")(println("  pairs=" + ops.Dedup.simhashNearDup(spark, d, nBands = 6, maxHamming = 3).count()))
    time("hyperplane_lsh 20k vecs")(println("  pairs=" + ops.Similarity.hyperplaneLshPairs(spark, d).count()))
    // the saturation knob: 2x16-bit bands cut random collisions by
    // ~2^8 per band vs 2x8-bit, shrinking the verify set at scale
    time("hyperplane 32x16 20k vecs")(println("  pairs=" + ops.Similarity.hyperplaneLshPairs(spark, d, nPlanes = 32, bandBits = 16).count()))
    time("bpe_tokens 50k docs")(ops.Bpe.bpeTokens(spark, d).count())
    time("lang_id_ngram 50k docs")(ops.Text.langIdNgram(spark, d).count())
    time("ivf_trained_topk 20k vecs")(ops.Similarity.ivfTrainedTopK(spark, d).count())
    time("pq_topk 20k vecs")(ops.Pq.pqTopK(spark, d).count())
    time("ivfpq index build 20k vecs")(ops.Pq.buildIvfPqIndex(spark, d))
    time("ivfpq_topk 20k vecs (stored index)")(ops.Pq.ivfPqTopK(spark, d).count())
    time("semantic_dedup 20k vecs")(println("  drops=" + ops.Similarity.semanticDedup(spark, d).count()))
    // round-4 operators
    time("session_overlap 1M events")(println("  buckets=" + ops.Behavior.sessionOverlap(spark, d).count()))
    time("session_overlap minute-band 1M")(println("  buckets=" +
      ops.Behavior.sessionOverlapOf(ops.Windows.sessions(spark, d), bandMs = 60000L).count()))
    time("decontaminate 50k docs")(println("  contaminated=" + ops.Dedup.decontaminate(spark, d).count()))
    time("doc_repetition 50k docs")(ops.Text.docRepetition(spark, d).count())
    time("weighted_sample 50k docs")(println("  kept=" + ops.Text.weightedSample(spark, d).count()))
    // round-4 session-3 operators
    time("range_frame 1.5M orders")(ops.Windows.rollingRangeRevenue(spark, d).count())
    time("unpivot 1M events")(ops.EventOps.eventTypeUnpivot(spark, d).count())
    time("cms_heavy_hitters 6M lineitem")(ops.Sketch.cmsHeavyHitters(spark, d).count())
    time("bloom_semi_join 6M lineitem")(ops.Sketch.bloomSemiJoin(spark, d).count())
    time("graph_bfs 50k docs")(println("  reached=" + ops.Graph.nearDupBfs(spark, d).count()))
    time("neardup_pagerank 50k docs")(ops.Graph.nearDupPagerank(spark, d).count())
    time("pack_efficiency 50k docs")(ops.Pipeline.packEfficiency(spark, d).count())
    time("anomaly_zscore 1M events")(println("  outliers=" + ops.Aggregates.anomalyZscore(spark, d).count()))
    time("merge_upsert 150k x 1.5M")(ops.Joins.mergeUpsert(spark, d).count())
    time("scd2_intervals 1M events")(ops.EventOps.scd2Intervals(spark, d).count())
    time("sparse_cosine 50k docs")(ops.Dedup.sparseCosinePairs(spark, d).count())
    time("markov_transitions 1M events")(ops.Behavior.markovTransitions(spark, d).count())
    time("sliding_dau 1M events")(ops.Behavior.slidingDau(spark, d).count())
    time("fuzzy_name_pairs 200k parts")(println("  pairs=" + ops.SetAndScalar.fuzzyNamePairs(spark, d).count()))
    spark.stop()
  }
}
