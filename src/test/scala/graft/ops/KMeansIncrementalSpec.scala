package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** k-means IVF training + incremental near-dup semantics. */
class KMeansIncrementalSpec extends SparkTestBase {
  import spark.implicits._

  test("k-means iterations do not degrade the assignment objective") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val init = emb.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    val before = KMeansIvf.objective(emb, init)
    val trained = KMeansIvf.trainCentroids(spark, emb, k = 8, iters = 3)
    assert(trained.count() == 8)
    val after = KMeansIvf.objective(emb, trained)
    assert(after >= before - 1e-9, s"objective degraded: $before -> $after")
    // every vector is assigned to exactly one centroid
    assert(KMeansIvf.assign(emb, trained).count() == emb.count())
  }

  test("k-means training is deterministic") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val a = KMeansIvf.trainCentroids(spark, emb, 4, 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = KMeansIvf.trainCentroids(spark, emb, 4, 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(v == b(k)) }
  }

  test("IVF recall vs nprobe is monotone and reaches 1.0 at nprobe=k") {
    // ground truth: exact brute-force top-10 neighbours of vec_id=0
    val truth = Similarity.knnBruteForce(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val recalls = Seq(1, 2, 4, 8).map { np =>
      val got = Similarity.ivfTrainedTopK(spark, sfDir, nprobe = np).collect()
        .map(_.getLong(0)).toSet
      np -> truth.intersect(got).size.toDouble / truth.size
    }
    info(s"recall curve (trained IVF, k=8 centroids): " +
      recalls.map { case (np, r) => s"nprobe=$np:${"%.2f".format(r)}" }.mkString(" "))
    // weakly monotone in nprobe
    recalls.sliding(2).foreach { case Seq((np1, r1), (np2, r2)) =>
      assert(r2 >= r1 - 1e-9, s"recall dropped from $r1 (nprobe=$np1) to $r2 (nprobe=$np2)")
    }
    // probing every list IS the exact scan
    assert(recalls.last._2 == 1.0)
    // probing the best list alone should already find a decent share
    assert(recalls.head._2 >= 0.3, s"nprobe=1 recall ${recalls.head._2}")
  }

  test("incremental near-dup finds batch-vs-corpus matches only") {
    val corpus = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // new batch: a near-copy of corpus doc 7 (drop last 2 tokens) + a novel doc
    val doc7 = corpus.filter(col("doc_id") === 7).collect()(0).getString(1)
    val nearCopy = doc7.split(" ").dropRight(2).mkString(" ")
    val novel = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val batch = Seq((100001L, nearCopy), (100002L, novel)).toDF("doc_id", "text")

    val hits = Dedup.incrementalNearDups(spark, corpus, batch).collect()
    assert(hits.exists(r => r.getLong(0) == 100001L && r.getLong(1) == 7L),
      s"near copy of doc 7 not found: ${hits.mkString(",")}")
    assert(!hits.exists(_.getLong(0) == 100002L), "novel doc matched spuriously")
  }
}
