package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics tests for the extension operators (SURVEY.md §5.2 items
  * 2–3): MinHash estimates Jaccard, cosine matches a hand-rolled
  * reference, approx_count_distinct lands within rsd, language ID
  * covers the corpus, and the json-extraction variants agree.
  */
class ExtensionsSpec extends SparkTestBase {
  import org.apache.spark.sql.Row

  test("approx_count_distinct within 3*rsd of exact (approx_ok derived column)") {
    val rows = Aggregates.approxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("approx_ok")),
        s"estimate outside 3*rsd for ${r.getString(0)}")
    }
    // the exact column must agree with the exact-distinct query
    val exact = Aggregates.distinctStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("n_parts"))).toMap
    rows.foreach(r => assert(r.getLong(r.fieldIndex("n_parts")) == exact(r.getString(0))))
  }

  test("approx_percentile within tolerance of exact percentile") {
    val ord = graft.Tables.orders(spark, sfDir)
    val r = ord.agg(
      percentile(col("o_totalprice"), lit(0.5)).as("exact"),
      percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("approx"))
      .collect()(0)
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx vs exact $exact")
  }

  test("cosine matches hand-computed reference") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val c = df.collect()(0).getDouble(0)
    assert(math.abs(c - 10.0 / 14.0) < 1e-12)
  }

  test("codegen CosineSimilarity is bit-identical to the HOF formulation") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      Similarity.cosine(col("embedding"), col("qv")).as("native"),
      Similarity.cosineHof(col("embedding"), col("qv")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("CosineSimilarity null handling") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("knn brute force: self-similarity excluded, scores in [-1,1] desc") {
    val rows = Similarity.knnBruteForce(spark, sfDir).collect()
    assert(rows.length == 10)
    val sims = rows.map(_.getDouble(2))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
    assert(!rows.map(_.getLong(0)).contains(0L))
  }

  test("minhash equality rate approximates Jaccard for near-dup docs") {
    import spark.implicits._
    // two 80%-overlapping token streams + one disjoint
    val base = (1 to 50).map(i => s"tok$i")
    val near = (11 to 60).map(i => s"tok$i")
    val far = (100 to 150).map(i => s"far$i")
    val docs = Seq((0L, base.mkString(" ")), (1L, near.mkString(" ")), (2L, far.mkString(" ")))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("___docs")
    val tmp = tmpDir("mh")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val sigs = Dedup.minhashSignatures(spark, tmp).collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val matches01 = sigs(0L).zip(sigs(1L)).count { case (a, b) => a == b }
    val matches02 = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    // J(0,1) ≈ 0.55 on 3-gram shingles, J(0,2) = 0 → expect more
    // signature agreement with the near doc than the far one.
    assert(matches01 >= matches02)
    assert(matches02 == 0)
  }

  test("simhash banded search is exact at hamming <= 3 (vs brute force)") {
    // pigeonhole: <= 3 differing bits across 4 bands leave one band
    // equal, so the banded candidates must contain EVERY such pair
    val fields = Dedup.simhashFieldsOf(
        graft.Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getLong(0), Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val expected = (for {
      (ida, fa) <- fields; (idb, fb) <- fields if ida < idb
      ham = (0 until 4).map(m => java.lang.Long.bitCount(fa(m) ^ fb(m))).sum
      if ham <= 3
    } yield (ida, idb, ham.toLong)).toSet
    val got = Dedup.simhashNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "corpus should contain simhash near-dups at sf0.001")
  }

  test("lsh near-dup pairs are symmetric-free and above threshold") {
    val pairs = Dedup.lshNearDupPairs(spark, "/root/testdata/sf0.01").collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.5)
    }
  }

  test("ngram jaccard pairs: ordered, thresholded, and ngram <= reordering-blind token jaccard + slack") {
    val ngram = Dedup.ngramJaccardPairs(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val token = Dedup.lshNearDupPairs(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ngram.nonEmpty)
    ngram.foreach { case ((a, b), j) =>
      assert(a < b && j >= 0.3)
      // shingle-set similarity is (weakly) below unigram-set similarity
      // for these pairs: reordering breaks shingles but not tokens
      token.get((a, b)).foreach(tj => assert(j <= tj + 0.05, s"($a,$b): ngram=$j token=$tj"))
    }
  }

  test("language id covers every doc with a prediction") {
    val n = Text.langId(spark, sfDir)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(n == 500) // every sf0.001 doc classified exactly once
  }

  test("regexp json extraction agrees with get_json_object") {
    val ev = graft.Tables.events(spark, sfDir)
    val both = ev.select(
      regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("via_regex"),
      get_json_object(col("props"), "$.k").cast("long").as("via_json"))
    assert(both.filter(col("via_regex") =!= col("via_json")).count() == 0)
  }

  test("typed Dataset surface: case-class rows + groupByKey aggregation") {
    import spark.implicits._
    import ExtensionsSpec.Line
    val ds = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .as[Line]
    val typedAgg = ds.groupByKey(_.l_returnflag)
      .mapGroups((flag, rows) => (flag, rows.map(_.l_quantity).sum))
      .collect().toMap
    val untyped = graft.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typedAgg.keySet == untyped.keySet)
    typedAgg.foreach { case (k, v) => assert(math.abs(v - untyped(k)) < 1e-6) }
  }

  test("exact dedup summary is consistent") {
    val r = Dedup.exactSummary(spark, sfDir).collect()(0)
    val (nDocs, nDistinct, nGroups, nRedundant) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nDocs == 500)
    assert(nDocs - nDistinct == nRedundant)
    assert(nGroups <= nRedundant)
  }
}

object ExtensionsSpec {
  case class Line(l_orderkey: Long, l_quantity: Double, l_returnflag: String)
}
