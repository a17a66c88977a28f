package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Degenerate-input robustness: a library operator must not crash on
  * empty/NULL/one-char documents or zero vectors — the rows that
  * always exist somewhere in 100 TB of real data. These tests pin
  * "executes and returns a frame" plus the specific semantics that are
  * cheap to state (NULL text drops out of explodes; zero vectors rank
  * last, not crash). */
class DegenerateInputSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val degenerateDocs = {
    val tmp = tmpDir("degdocs")
    Seq(
      (1L, "", "en", "s1"),
      (2L, null.asInstanceOf[String], "en", "s1"),
      (3L, "x", "de", "s2"),
      (4L, "a b c a b c", "de", "s2"),
      (5L, "   ", "fr", "s3"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private lazy val degenerateVecs = {
    val tmp = tmpDir("degvecs")
    Seq(
      (0L, Array(1f, 0f, 0f), 0), // the query vector — real
      (1L, Array(1f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f), 1),
      (3L, Array(0f, 0f, 0f), 1)) // all-zero: cosine = NaN
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("text/dedup operators survive empty, NULL, and whitespace docs") {
    // every text-surface operator must execute; row bounds are loose
    // on purpose — semantics for real docs are pinned elsewhere
    assert(Text.textStats(spark, degenerateDocs).count() == 5)
    assert(Text.qualityScore(spark, degenerateDocs).count() >= 1)
    assert(Bpe.bpeTokens(spark, degenerateDocs).count() >= 1)
    assert(Dedup.exactSummary(spark, degenerateDocs).count() == 1)
    assert(Dedup.minhashSignatures(spark, degenerateDocs).count() == 5)
    assert(Dedup.simhashNearDup(spark, degenerateDocs).count() >= 0)
    assert(Dedup.lshNearDupPairs(spark, degenerateDocs).count() >= 0)
    assert(Text.langId(spark, degenerateDocs).count() >= 1)
    assert(Text.oovRate(spark, degenerateDocs).count() == 3,
      "oovRate must survive empty/NULL/whitespace docs (one row per source)")
  }

  test("oovRate drops a token-free source (explode semantics), never divides by zero") {
    val s = spark; import s.implicits._
    val tmp = tmpDir("oovnull")
    Seq((1L, null.asInstanceOf[String], "en", "dead"), (2L, "a b c", "en", "live"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Text.oovRate(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(!rows.contains("dead"),
      "an all-NULL-text source has no token rows and must be absent, like the oracle's unnest")
    assert(rows("live")._1 == 3L)
  }

  test("NULL text yields NULL minhash signatures (not a crash, not a fake bucket)") {
    val sigs = Dedup.minhashSignatures(spark, degenerateDocs).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(sigs(2L), "NULL text must produce NULL sig")
    assert(!sigs(4L), "real text must produce a sig")
    // and NULL band values never join: doc 1 ("") and doc 2 (NULL)
    // must not pair with anything
    val pairs = Dedup.lshNearDupPairs(spark, degenerateDocs).collect()
    assert(!pairs.exists(r => r.getLong(0) == 2L || r.getLong(1) == 2L))
  }

  test("similarity operators survive the all-zero vector") {
    // cosine(0-vec, q) = 0/0 = NaN, and NaN sorts ABOVE +inf in DESC
    // order in both Spark and DuckDB — the NaN guard in knnBruteForce
    // must keep the junk vector out of the top-k entirely
    val knn = Similarity.knnBruteForce(spark, degenerateVecs).collect()
    assert(knn.nonEmpty)
    assert(!knn.map(_.getLong(0)).contains(3L), "all-zero vector must not rank")
    assert(knn.head.getLong(0) == 1L, "the identical real vector must rank first")
    assert(!knn.head.getDouble(2).isNaN)
    assert(Similarity.hyperplaneLshPairs(spark, degenerateVecs).count() >= 0)
    assert(Similarity.labelCentroids(spark, degenerateVecs).count() >= 1)
    assert(Similarity.vectorStats(spark, degenerateVecs).count() >= 1)
  }

  test("hyperplane LSH handles an empty corpus and rejects mixed widths") {
    val empty = tmpDir("emptyvecs")
    Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$empty/embeddings.parquet")
    val out = Similarity.hyperplaneLshPairs(spark, empty)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("vec_a", "vec_b", "cos_sim"))

    val mixed = tmpDir("mixedvecs")
    Seq((0L, Array(1f, 0f), 0), (1L, Array(1f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$mixed/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Similarity.hyperplaneLshPairs(spark, mixed)
    }
    assert(e.getMessage.contains("fixed-width"))
  }

  test("trainCentroids rejects mixed widths with a clear message") {
    // the mean-reassembly indexes centroid arrays by position — without
    // the guard a mixed-width corpus died in an opaque
    // ArrayIndexOutOfBoundsException mid-iteration
    val mixed = Seq((0L, Array(1f, 0f), 0), (1L, Array(1f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      KMeansIvf.trainCentroids(spark, mixed, k = 1, iters = 1)
    }
    assert(e.getMessage.contains("fixed-width"))
    assert(e.getMessage.contains("trainCentroids"))
  }

  test("hyperplane fixed-width validation is cached per corpus dir") {
    val dir = tmpDir("widthcache")
    Seq((0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.cachedFixedWidth(spark, dir).contains(2))
    // overwrite the corpus with different-width vectors: a cached
    // validation must NOT rescan (corpus dirs are immutable inputs by
    // contract, so serving the cached width is the documented behavior
    // — and the proof no O(n) pass runs per construction)
    Seq((0L, Array(1f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.cachedFixedWidth(spark, dir).contains(2),
      "second lookup must serve the cached width without rescanning")
  }

  test("pipeline-assembly and graph operators survive empty/NULL/whitespace docs") {
    // NULL text propagates: size(split(NULL)) is NULL, which must fall
    // out of windows/generators/filters — never throw
    assert(Pipeline.seqPack(spark, degenerateDocs).count() >= 1)
    assert(Pipeline.chunkWindows(spark, degenerateDocs).count() >= 1)
    assert(Pipeline.sourceMix(spark, degenerateDocs).count() >= 1)
    assert(Pipeline.piiRedact(spark, degenerateDocs).count() >= 1)
    assert(Dedup.substringOverlap(spark, degenerateDocs).count() == 0)
    // no near-dup pairs among the degenerates -> an EMPTY graph: the
    // pagerank must return an empty frame, not divide by zero
    assert(Graph.nearDupPagerank(spark, degenerateDocs).count() >= 0)
    // round-5 composites: the funnel must account every doc (raw row =
    // corpus size) and the LM scorer must drop sub-2-token docs
    val funnel = Pipeline.curationFunnel(spark, degenerateDocs).collect()
    assert(funnel.length == 5 && funnel.head.getAs[Long]("n_docs") == 5)
    val lm = Text.lmScore(spark, degenerateDocs).collect()
    assert(lm.forall(_.getAs[Long]("n_bigrams") >= 1))
    assert(Dedup.dupClusterHist(spark, degenerateDocs).count() >= 0)
  }

  test("SQ8 probe survives the all-zero vector and an empty corpus") {
    val sq = Pq.sqTopK(spark, degenerateVecs).collect()
    assert(sq.nonEmpty)
    assert(!sq.map(_.getLong(0)).contains(3L), "all-zero vector must not rank")
    val empty = tmpDir("emptysq")
    Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$empty/embeddings.parquet")
    val out = Pq.sqTopK(spark, empty)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("vec_id", "cos_sim"))
  }

  test("trained-centroid build is idempotent per (run, corpus)") {
    val dir1 = Similarity.buildTrainedCentroids(spark, degenerateVecs)
    val fs = new org.apache.hadoop.fs.Path(dir1)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val success = new org.apache.hadoop.fs.Path(dir1, "_SUCCESS")
    assert(fs.exists(success))
    val stamp = fs.getFileStatus(success).getModificationTime
    val dir2 = Similarity.buildTrainedCentroids(spark, degenerateVecs)
    assert(dir2 == dir1, "same corpus must key to the same export dir")
    assert(fs.getFileStatus(success).getModificationTime == stamp,
      "second construction must reuse the committed export, not retrain")
  }

  test("session-3 doc/graph operators survive empty/NULL/whitespace docs") {
    assert(Graph.nearDupBfs(spark, degenerateDocs).count() >= 0)
    assert(Dedup.sparseCosinePairs(spark, degenerateDocs).count() >= 0)
    assert(Pipeline.packEfficiency(spark, degenerateDocs).count() >= 1)
  }

  test("nearDupBfs on an edgeless corpus returns an empty frame with the right schema") {
    val tmp = tmpDir("noedges")
    val s = spark; import s.implicits._
    // two totally dissimilar docs: no LSH candidates, no edges, no seed
    Seq((1L, "alpha beta gamma", "en", "s1"), (2L, "delta epsilon zeta", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Graph.nearDupBfs(spark, tmp)
    assert(out.columns.toSeq == Seq("doc_id", "hop"))
    assert(out.count() == 0)
  }

  test("fuzzy/sketch operators survive a single-row and a skewed key table") {
    val tmp = tmpDir("degparts")
    val s = spark; import s.implicits._
    Seq((1L, "widget"), (2L, "widget"), (3L, "widgit"), (4L, "x"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val fuzzy = SetAndScalar.fuzzyNamePairs(spark, tmp).collect()
    assert(fuzzy.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("widget", "widgit")), "only the true distance-1 pair")
    // CMS over one hot key + empty-ish table shapes
    Seq.fill(100)(7L).zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val cms = Sketch.cmsHeavyHitters(spark, tmp).collect()
    assert(cms.length == 1 && cms.head.getAs[Long]("exact") == 100L
      && cms.head.getAs[Long]("est") == 100L,
      "a single key cannot collide with anything — estimate must be exact")
  }

  test("a deliberately hot LSH band bucket fails loudly at the cap, in bounded time") {
    val s = spark; import s.implicits._
    // 60 verbatim-duplicate docs: every one lands in the SAME two band
    // buckets, so the candidate join would do 60² work — over a cap of
    // 50 the guard must raise BEFORE any Jaccard verify runs, naming
    // the bucket, instead of grinding through the quadratic join
    // (observed at 10×: one degenerate band = a 23-minute straggler)
    val hot = (1L to 60L).map(i => (i, "the same exact document text every time", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val e = intercept[Exception] {
      Dedup.nearDupPairsOf(hot, maxBucket = 50).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("LSH bucket over cap")),
      s"expected the hot-bucket guard, got: ${messages(e).mkString(" | ")}")

    // same corpus below the cap: the guard is invisible — all C(60,2)
    // exact-duplicate pairs come through at jaccard 1.0
    val ok = Dedup.nearDupPairsOf(hot, maxBucket = 60).collect()
    assert(ok.length == 60 * 59 / 2)
    assert(ok.forall(_.getDouble(2) == 1.0))
  }

  test("data-selection operators survive empty, NULL, and whitespace docs") {
    // dsir: the target source doesn't exist in this corpus — every
    // bucket's target count is 0, weights are pure smoothing; NULL-text
    // docs have no tokens and drop out of the report entirely
    val dsir = Selection.dsirWeights(spark, degenerateDocs).collect()
    assert(dsir.map(_.getAs[Long]("n_docs")).sum == 4) // doc 2 (NULL) absent
    // apportionment: a budget smaller than the source count still sums
    // exactly (some sources get zero)
    val alloc = Selection.proportionalAlloc(spark, degenerateDocs, budget = 2).collect()
    assert(alloc.map(_.getAs[Long]("quota")).sum == 2L)
    assert(alloc.forall(r => r.getAs[Long]("quota") >= 0))
    // weighted median: NULL-text doc excluded BY CONTRACT (NULL sort
    // keys order differently across engines); all other docs counted
    val wm = Selection.weightedMedian(spark, degenerateDocs).collect()
    assert(wm.map(_.getAs[Long]("n_docs")).sum == 4)
    // "" splits to [""] = one token; "   " to four empty tokens
    assert(wm.find(_.getAs[String]("source") == "s3")
      .get.getAs[Long]("median_len") == 4L)
    // diversity: sources keep their token counts; a source with zero
    // 3-grams (s1: one 1-token doc) still appears, ratio NULL not 0
    val nd = Selection.ngramDiversity(spark, degenerateDocs).collect()
    assert(nd.map(_.getAs[Long]("n_tokens")).sum == 1 + 1 + 6 + 4)
    nd.foreach(r => assert(r.getAs[Long]("uni_ttr_ppm") <= 1000000L))
    val s1 = nd.find(_.getAs[String]("source") == "s1").get
    assert(s1.getAs[Long]("n_3grams") == 0L && s1.isNullAt(s1.fieldIndex("tri_ttr_ppm")))
    // entropy: empty and NULL docs produce no character rows; the
    // single-char doc has entropy exactly 0
    val ce = Selection.charEntropy(spark, degenerateDocs).collect()
    val byId = ce.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("ent_tmn")).toMap
    assert(!byId.contains(1L) && !byId.contains(2L))
    assert(byId(3L) == 0L)           // "x": one char class, ln(1/1) = 0
    assert(byId(5L) == 0L)           // "   ": all-space, one class
    // head-prefix cohorts: no two docs share a head here -> zero dups;
    // the NULL-text doc has a NULL digest and is excluded by the join
    val pd = Selection.prefixDup(spark, degenerateDocs).collect()
    assert(pd.map(_.getAs[Long]("dup_head_docs")).sum == 0L)
    assert(pd.map(_.getAs[Long]("n_docs")).sum == 4)
    // curriculum grid still partitions whatever has a computable length
    val grid = Selection.lengthQualityGrid(spark, degenerateDocs).collect()
    assert(grid.map(_.getAs[Long]("n_docs")).sum >= 4)
  }

  test("mmrRerank stops when the shortlist is exhausted (no NULL filler rows)") {
    // corpus: query vec 0 + survivors {1, 2} (vec 3 is all-zero, NaN
    // cosine, filtered) — only 2 candidates for k = 5; the greedy must
    // emit exactly 2 ranked rows, matching the oracle's LIMIT-1 CTEs
    // which emit nothing for exhausted steps
    val rows = Similarity.mmrRerank(spark, degenerateVecs, k = 5).collect()
    assert(rows.length == 2, s"expected 2 picks, got ${rows.length}")
    assert(rows.map(_.getAs[Long]("rnk")).toSeq == Seq(1L, 2L))
    assert(rows.forall(!_.isNullAt(1)), "no NULL vec_id filler")
  }

  test("lshBandTune on a dup-free corpus pins recall to NULL, not a div-by-zero") {
    val tmp = tmpDir("dupfree")
    val s = spark; import s.implicits._
    Seq((1L, "alpha beta gamma", "en", "s1"), (2L, "delta epsilon zeta", "en", "s1"),
        (3L, "eta theta iota", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Dedup.lshBandTune(spark, tmp).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_confirmed") == 0L)
      assert(r.isNullAt(r.fieldIndex("recall_ppm")),
        "n_truth = 0 must yield NULL recall on both engine and oracle")
    }
  }

  test("hardNegatives survives all-zero vectors and fewer candidates than k") {
    // 4 vectors, every one a query (vec_id < 5); vec 3 is all-zero so
    // its cosine is NaN everywhere — it yields no rows as a query and
    // is excluded as a candidate
    val rows = Similarity.hardNegatives(spark, degenerateVecs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("q_id") != r.getAs[Long]("vec_id"))
      assert(!r.getAs[Double]("cos_sim").isNaN)
      assert(r.getAs[Long]("rnk") <= 3L)
    }
    assert(!rows.exists(_.getAs[Long]("q_id") == 3L))
    assert(!rows.exists(_.getAs[Long]("vec_id") == 3L))
  }
}
