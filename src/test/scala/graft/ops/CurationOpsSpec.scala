package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariant tests for the round-5 curation-surface additions: split /
  * shuffle manifests, the KMV sketch, boilerplate spans, PMI
  * collocations, and the triangle census. Engine-vs-oracle parity is
  * the driver gate's job; these pin the SEMANTIC invariants a green
  * hash can't express (partition-of-corpus, error bounds, closed-form
  * degenerate graphs).
  */
class CurationOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def corpusTotals: (Long, Long) = {
    val r = graft.Tables.documents(spark, sfDir)
      .agg(count(lit(1)), sum(size(split(col("text"), " ")).cast("long")))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  // ---------------- dataSplit ----------------

  test("dataSplit partitions the corpus exactly, near the 80/10/10 design") {
    val rows = Pipeline.dataSplit(spark, sfDir).collect()
    val (nDocs, nToks) = corpusTotals
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(rows.map(_.getAs[Long]("sum_tokens")).sum == nToks)
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    // hash noise at 500 docs is real; just pin the designed ordering
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // split is a function of doc_id only: re-running is bit-identical
    assert(Pipeline.dataSplit(spark, sfDir).collect().toSeq == rows.toSeq)
  }

  // ---------------- epochShuffle ----------------

  test("epochShuffle is a seed-keyed permutation into bounded shards") {
    val e1 = Pipeline.epochShuffle(spark, sfDir, seed = 1).collect()
    val (nDocs, nToks) = corpusTotals
    assert(e1.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(e1.map(_.getAs[Long]("sum_tokens")).sum == nToks)
    assert(e1.forall { r => val s = r.getAs[Long]("shard"); s >= 0 && s < 8 })
    // a different seed is a different permutation: some shard's
    // order-sensitive checksum must move
    val e2 = Pipeline.epochShuffle(spark, sfDir, seed = 2).collect()
    assert(e1.map(_.getAs[Long]("perm_check")).toSeq !=
      e2.map(_.getAs[Long]("perm_check")).toSeq)
  }

  test("writeEpochShards materializes the manifest's exact layout") {
    val out = tmpDir("epoch_shards")
    locally {
      Pipeline.writeEpochShards(spark, sfDir, out)
      val written = spark.read.parquet(out)
      val manifest = Pipeline.epochShuffle(spark, sfDir).collect()
        .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("n_docs")).toMap
      // hive-partitioned by shard, one partition per manifest row
      val byShard = written.groupBy(col("shard")).count().collect()
        .map(r => r.getAs[Int]("shard").toLong -> r.getAs[Long]("count")).toMap
      assert(byShard == manifest)
      // every shard's positions are exactly 1..n — a loader can stream
      // a shard sequentially and see the full permutation slice
      written.select(col("shard"), col("pos")).collect()
        .groupBy(_.getAs[Int]("shard"))
        .foreach { case (_, rows) =>
          val ps = rows.map(_.getAs[Long]("pos")).sorted
          assert(ps.head == 1L && ps.last == ps.length.toLong
            && ps.distinct.length == ps.length)
        }
      // no doc lost or duplicated
      assert(written.select(col("doc_id")).distinct().count() ==
        graft.Tables.documents(spark, sfDir).count())
    }
  }

  // ---------------- kmvDistinct ----------------

  test("kmvDistinct estimates every priority class within sketch error") {
    val rows = Sketch.kmvDistinct(spark, sfDir).collect()
    assert(rows.length == 5) // the five order priority classes
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("kmv_est")
      // k=64 -> ~13% expected relative error; 40% is a safe determinism
      // bound (the VALUE is pinned by the oracle hash; this pins sanity)
      assert(est > 0 && r.getAs[Long]("err_bp") <= 4000,
        s"grp=${r.getAs[String]("grp")} exact=$exact est=$est")
    }
  }

  // ---------------- boilerplateNgrams ----------------

  test("boilerplateNgrams: counts bound, short docs drop, df=1 saturates") {
    val rows = Text.boilerplateNgrams(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_ngrams"); val b = r.getAs[Long]("n_boiler")
      assert(n > 0 && b >= 0 && b <= n)
      assert(r.getAs[Long]("boiler_ppm") <= 1000000L)
    }
    // exactly the docs with >= 5 tokens appear, each with size-4 ngrams
    val expect = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .filter(col("n") >= 5).collect()
      .map(r => r.getLong(0) -> (r.getInt(1) - 4L)).toMap
    assert(rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_ngrams")).toMap == expect)
    // every ngram trivially reaches df >= 1: the filter saturates
    val all1 = Text.boilerplateNgrams(spark, sfDir, boilerDf = 1).collect()
    assert(all1.forall(_.getAs[Long]("boiler_ppm") == 1000000L))
  }

  // ---------------- pmiCollocations ----------------

  test("pmiCollocations matches a driver-side exact PMI computation") {
    val rows = Text.pmiCollocations(spark, sfDir, minCount = 10).collect()
    assert(rows.nonEmpty)
    // brute-force the bigram distribution on the driver (sf0.001 is
    // ~25k bigrams) and recompute every output score independently
    val toks = graft.Tables.documents(spark, sfDir)
      .select(col("text")).as[String].collect()
      .map(_.split(" ").toSeq)
    val bigrams = toks.flatMap(t => t.zip(t.drop(1)))
    val cb = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val c2 = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = bigrams.length.toLong
    assert(rows.length == cb.count { case (_, c) => c >= 10 })
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val c12 = cb((w1, w2))
      assert(r.getAs[Long]("c12") == c12)
      val want = math.round(math.log(c12.toDouble * n / (c1(w1) * c2(w2))) * 10000)
      assert(r.getAs[Long]("pmi_tmn") == want, s"($w1,$w2)")
    }
  }

  // ---------------- sourceNovelty ----------------

  test("sourceNovelty: unique shingles partition across sources") {
    val rows = Dedup.sourceNovelty(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_unique") <= r.getAs[Long]("n_shingles"))
      assert(r.getAs[Long]("unique_ppm") <= 1000000L)
    }
    // a shingle unique to one source is counted by exactly that source:
    // the unique totals can never exceed the global distinct pool
    val globalDistinct = Dedup.shingleSetOf(graft.Tables.documents(spark, sfDir))
      .select(col("sh")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_unique")).sum <= globalDistinct)
  }

  // ---------------- triangleCensus ----------------

  test("triangleCensus closed forms: clique, chain, empty") {
    // oriented 3-clique: 1 triangle, 3 wedges, cc = 1
    val clique = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("doc_a", "doc_b")
    val c = Graph.triangleCensusOf(clique).head()
    assert(c.getAs[Long]("n_triangles") == 1 && c.getAs[Long]("n_wedges") == 3
      && c.getAs[Long]("global_cc_ppm") == 1000000L)
    // chain 1-2-3-4: no triangles, 2 wedges (centers 2 and 3)
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val h = Graph.triangleCensusOf(chain).head()
    assert(h.getAs[Long]("n_triangles") == 0 && h.getAs[Long]("n_wedges") == 2
      && h.getAs[Long]("global_cc_ppm") == 0L)
    // empty graph: zero row, no division
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val e = Graph.triangleCensusOf(empty).head()
    assert(e.getAs[Long]("n_triangles") == 0 && e.getAs[Long]("n_wedges") == 0
      && e.getAs[Long]("global_cc_ppm") == 0L)
  }

  // ---------------- dedupKeepBest ----------------

  test("dedupKeepBest keeps exactly one longest member per cluster") {
    val kept = Dedup.dedupKeepBest(spark, sfDir).collect()
    val clusters = Dedup.nearDupClusters(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("cluster_rep"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
    val chars = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept.length == clusters.size) // one survivor per cluster
    kept.foreach { r =>
      val rep = r.getAs[Long]("cluster_rep")
      val members = clusters(rep)
      val doc = r.getAs[Long]("kept_doc")
      assert(members.contains(doc))
      assert(r.getAs[Long]("n_members") == members.size.toLong)
      assert(r.getAs[Long]("n_dropped") == members.size.toLong - 1)
      // the survivor is the longest member, ties to the lowest id
      val best = members.toSeq.map(d => (chars(d), d)).sortBy(t => (-t._1, t._2)).head._2
      assert(doc == best, s"cluster $rep kept $doc, expected $best")
    }
    // accounting agrees with the histogram query's redundancy totals
    val hist = Dedup.dupClusterHist(spark, sfDir).collect()
    assert(kept.map(_.getAs[Long]("n_dropped")).sum ==
      hist.map(_.getAs[Long]("n_redundant")).sum)
  }

  // ---------------- splitLeakage ----------------

  test("splitLeakage audits every test doc once with bounded rates") {
    val rows = Pipeline.splitLeakage(spark, sfDir).collect()
    val testDocs = Pipeline.dataSplit(spark, sfDir).collect()
      .filter(_.getAs[String]("split") == "test")
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    assert(rows.map(r => r.getAs[String]("source") -> r.getAs[Long]("n_test_docs")).toMap
      == testDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_leaky") <= r.getAs[Long]("n_test_docs"))
      assert(r.getAs[Long]("leaky_ppm") <= 1000000L)
    }
  }

  test("triangleCensus on the corpus obeys the wedge bound") {
    val r = Graph.triangleCensus(spark, sfDir).head()
    // every triangle contributes exactly 3 wedges: 3*tri <= wedges
    assert(3 * r.getAs[Long]("n_triangles") <= r.getAs[Long]("n_wedges"))
    assert(r.getAs[Long]("global_cc_ppm") <= 1000000L)
  }
}
