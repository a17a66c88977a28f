package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Product-quantization index: code validity/determinism, recall of
  * the ADC-shortlist + exact-re-rank probe against brute force, and
  * build idempotence (the oracle replay itself is hash-checked by the
  * driver gate; these pin the properties the hash can't express). */
class PqSpec extends SparkTestBase {

  test("codes are dense, in-range, and deterministic across re-encodes") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val codebooks = spark.read.parquet(Pq.buildCodebooks(spark, sfDir)).drop("corpus_key")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    def codesOf() = Pq.encode(emb, codebooks, dim / Pq.M)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val codes = codesOf()
    val n = emb.count()
    assert(codes.size == n * Pq.M, "every (vector, subspace) gets exactly one code")
    assert(codes.values.forall(c => c >= 0 && c < Pq.K))
    assert(codes == codesOf(), "re-encode must be bit-identical")
    // the codebook is actually used: more than one centroid per subspace
    (0 until Pq.M).foreach { m =>
      val used = codes.collect { case ((_, `m`), c) => c }.toSet
      assert(used.size > 1, s"subspace $m collapsed to one centroid")
    }
  }

  test("ADC shortlist + exact re-rank recalls most of the true top-10") {
    val exact = Similarity.knnBruteForce(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val pq = Pq.pqTopK(spark, sfDir).collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(pq).size.toDouble / exact.size
    // 50-candidate shortlist over the 500-vector corpus, then exact
    // re-rank: the PQ approximation only has to get candidates into
    // the top-50 for the re-rank to fix the order
    assert(recall >= 0.5, s"recall@10 = $recall")
    info(s"PQ recall@10 vs brute force: $recall")
  }

  test("SQ8 shortlist + exact re-rank beats PQ recall (1 byte/dim vs 1 byte/subspace)") {
    val exact = Similarity.knnBruteForce(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val sq = Pq.sqTopK(spark, sfDir).collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(sq).size.toDouble / exact.size
    // 64 bytes/vector (vs PQ's 4) makes the affine approximation tight
    // enough that the 50-candidate shortlist should rarely miss
    assert(recall >= 0.8, s"SQ8 recall@10 = $recall")
    info(s"SQ8 recall@10 vs brute force: $recall")
  }

  test("IVF-PQ probe stays inside probed lists and recalls within them") {
    // probed-subset exact top-10 = the best any IVF probe can do at
    // this nprobe; the PQ shortlist + re-rank should recover most of it
    val pq = Pq.ivfPqTopK(spark, sfDir).collect().map(_.getLong(0))
    assert(pq.nonEmpty)
    assert(pq.distinct.length == pq.length)
    val ivfExact = Similarity.ivfTopK(spark, sfDir).collect().map(_.getLong(0)).toSet
    val recall = ivfExact.intersect(pq.toSet).size.toDouble / ivfExact.size
    assert(recall >= 0.5, s"recall@10 vs exact-within-probed-lists = $recall")
    info(s"IVF-PQ recall@10 vs exact probe of same lists: $recall")
  }

  test("codebook build is idempotent per (run, corpus)") {
    val dir1 = Pq.buildCodebooks(spark, sfDir)
    val fs = new org.apache.hadoop.fs.Path(dir1)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val success = new org.apache.hadoop.fs.Path(dir1, "_SUCCESS")
    assert(fs.exists(success))
    val stamp = fs.getFileStatus(success).getModificationTime
    assert(Pq.buildCodebooks(spark, sfDir) == dir1)
    assert(fs.getFileStatus(success).getModificationTime == stamp,
      "second build must reuse the committed codebooks")
    // compression arithmetic the operator exists for: M codes of
    // ceil(log2 K) bits vs dim floats
    val dim = graft.Tables.embeddings(spark, sfDir)
      .select(size(col("embedding"))).head().getInt(0)
    val rawBits = dim * 32
    val codeBits = Pq.M * (32 - Integer.numberOfLeadingZeros(Pq.K - 1))
    assert(rawBits / codeBits >= 128, s"compression ${rawBits}b -> ${codeBits}b")
  }
}
