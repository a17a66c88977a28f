package graft.ops

import graft.SparkTestBase
import graft.lake.{Compaction, Distribution, Layout}
import org.apache.spark.sql.functions._

/** Scale-tooling semantics: salted joins preserve results, IVF probe
  * recall vs exact top-k, compaction preserves data while reducing
  * file count. */
class ScaleToolsSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join result equals unsalted join") {
    val big = graft.Tables.lineitem(spark, sfDir)
    val small = graft.Tables.orders(spark, sfDir)
    val plain = big.join(small, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), sum(col("l_quantity")), sum(col("o_totalprice"))).collect()(0)
    val salted = Skew.saltedJoin(big, small, "l_orderkey", "o_orderkey", "l_partkey", 4)
      .agg(count(lit(1)), sum(col("l_quantity")), sum(col("o_totalprice"))).collect()(0)
    assert(plain == salted)
  }

  test("salt column is deterministic and spans [0, n)") {
    val s = graft.Tables.lineitem(spark, sfDir)
      .select(Skew.saltColumn(col("l_partkey"), 4).as("s"))
    val vals = s.distinct().collect().map(_.getInt(0)).sorted
    assert(vals.toSeq == Seq(0, 1, 2, 3))
    // deterministic across evaluations
    assert(s.collect().toSeq == s.collect().toSeq)
  }

  test("IVF probe recall@10 vs exact brute force is substantial") {
    val exact = Similarity.knnBruteForce(spark, sfDir).collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(spark, sfDir).collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    // nprobe=3 of ~10 lists at sf0.001: expect well above random
    assert(recall >= 0.3, s"recall@10 = $recall")
  }

  test("semantic dedup matches an in-memory within-cluster reference") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // reference cluster assignment: highest rounded cosine, lowest centroid id
    val centroidIds = emb.keys.filter(_ % 50 == 0).toSeq.sorted
    val cluster = emb.map { case (id, v) =>
      id -> centroidIds.map(c => (-cos(v, emb(c)), c)).min._2
    }
    val expected = emb.keys.flatMap { vb =>
      val mates = emb.keys.filter(va => va < vb && cluster(va) == cluster(vb))
        .map(va => va -> cos(emb(va), emb(vb)))
        .filter { case (_, s) => !s.isNaN && s >= 0.35 }
      if (mates.isEmpty) None
      else Some(vb -> ((mates.map(_._1).min, mates.map(_._2).max, mates.size.toLong)))
    }.toMap
    val got = Similarity.semanticDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got == expected, s"got ${got.size} drops, expected ${expected.size}")
    assert(got.nonEmpty, "threshold should fire on the synthetic corpus")
    got.foreach { case (dropped, (keptBy, _, _)) => assert(keptBy < dropped) }
  }

  test("compaction reduces file count and preserves rows") {
    val layout = Layout(tmpDir("compact"))
    import spark.implicits._
    // write several small per-source batches (as streaming would)
    (1 to 5).foreach { i =>
      Seq(("clicks", s"k$i", s"""{"n":$i}"""))
        .toDF("source", "key", "json")
        .repartition(3)
        .write.mode("append").partitionBy("source").format("json")
        .save(layout.distributionDir)
    }
    val dir = new java.io.File(s"${layout.distributionDir}/source=clicks")
    val before = dir.listFiles().count(_.getName.endsWith(".json"))
    assert(before >= 5)
    val n = Compaction.compactSource(spark, layout, "clicks", targetFiles = 1)
    assert(n == 5)
    val after = dir.listFiles().count(_.getName.endsWith(".json"))
    assert(after == 1, s"expected 1 file after compaction, found $after")
    assert(Distribution.subscribe(spark, layout, "clicks").count() == 5)
  }

  test("subscribe detects a stuck compaction swap instead of returning an empty view") {
    val layout = Layout(tmpDir("compactwin"))
    import spark.implicits._
    Seq(("clicks", "k1", """{"n":1}"""))
      .toDF("source", "key", "json")
      .write.mode("append").partitionBy("source").format("json")
      .save(layout.distributionDir)
    val root = new java.io.File(layout.distributionDir)
    val live = new java.io.File(root, "source=clicks")
    val old = new java.io.File(root, "_old_source=clicks")
    // simulate a compaction that crashed mid-swap: partition renamed
    // aside, compacted dir never swapped in
    assert(live.renameTo(old))
    val e = intercept[java.io.IOException] {
      Distribution.subscribe(spark, layout, "clicks", maxWaitMs = 200, pollMs = 20)
    }
    assert(e.getMessage.contains("compaction swap appears stuck"))
    // recovery path named in the error: rename back, subscribe works
    assert(old.renameTo(live))
    assert(Distribution.subscribe(spark, layout, "clicks").count() == 1)
    // and an absent partition with NO transient marker stays a valid
    // empty view (genuinely no data), not an error
    assert(Distribution.subscribe(spark, layout, "nosuch").count() == 0)
  }

  test("subscribeConsistent survives a swap window that subscribe's plan-time check misses") {
    val layout = Layout(tmpDir("consistentsub"))
    import spark.implicits._
    Seq(("clicks", "k1", """{"n":1}"""), ("clicks", "k2", """{"n":2}"""))
      .toDF("source", "key", "json")
      .write.mode("append").partitionBy("source").format("json")
      .save(layout.distributionDir)
    // steady state: same rows as subscribe, already materialized
    val snap = Distribution.subscribeConsistent(spark, layout, "clicks")
    assert(snap.count() == 2)
    // a genuinely empty source returns immediately, like subscribe
    assert(Distribution.subscribeConsistent(spark, layout, "nosuch").count() == 0)

    // mid-swap: partition renamed aside (a compaction in flight),
    // finishing 150 ms later on another thread — the consistent read
    // must wait the window out and return the data, where a lazy
    // subscribe frame planned in the window reads empty
    val root = new java.io.File(layout.distributionDir)
    val live = new java.io.File(root, "source=clicks")
    val old = new java.io.File(root, "_old_source=clicks")
    assert(live.renameTo(old))
    val finisher = new Thread(() => { Thread.sleep(150); old.renameTo(live): Unit })
    finisher.start()
    val during = Distribution.subscribeConsistent(spark, layout, "clicks",
      maxWaitMs = 5000, pollMs = 20)
    finisher.join()
    assert(during.count() == 2, "consistent read must wait out the swap window")
    // and the returned frame is lineage-truncated: rows survive even
    // if the source files vanish afterwards
    assert(live.renameTo(old))
    assert(during.count() == 2)
    assert(old.renameTo(live))
  }
}
