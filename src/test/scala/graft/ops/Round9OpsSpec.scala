package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-9 ops hardening: the Apriori frequent-1-itemset prune
  * (lossless for pairs above min support, provably smaller self-join
  * input) and the vocabCoverage TakeOrdered shortlist replacing the
  * vocab-sized unpartitioned ranking window. */
class Round9OpsSpec extends SparkTestBase {

  test("assocRules Apriori prune: identical output to the unpruned " +
      "formulation, with a strictly smaller pair-join input") {
    val s = spark
    import s.implicits._
    // 30 baskets; brands A,B frequent (co-occur in 20), brand R rare
    // (1 basket = 3.3% < minSup 10%), brand C mid (5 baskets = 16.7%)
    val ob = (
      (1 to 20).flatMap(i => Seq((i.toLong, "A"), (i.toLong, "B"))) ++
      (21 to 25).flatMap(i => Seq((i.toLong, "A"), (i.toLong, "C"))) ++
      Seq((26L, "R"), (26L, "A")) ++
      (27 to 30).map(i => (i.toLong, "B"))
    ).toDF("basket", "brand")
    val minSup = 10
    val got = Behavior.assocRulesFrom(ob, minSup).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

    // unpruned reference: plain self-join + the same pair-level filter
    val n = ob.select("basket").distinct().count()
    val sup = ob.groupBy("brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val baskets = ob.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val pairCounts = baskets.values.toSeq
      .flatMap(bs => for (a <- bs; b <- bs if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = pairCounts.toSeq.collect {
      case ((a, b), supAb) if supAb * 100 >= n * minSup =>
        (a, b, supAb, sup(a), sup(b),
          supAb * 1000000L / sup(a),
          supAb * n * 1000000L / (sup(a) * sup(b)))
    }.sortBy(t => (t._1, t._2))
    assert(got == want, s"prune changed the rule table:\n$got\nvs\n$want")
    assert(got.nonEmpty && got.exists(t => t._1 == "A" && t._2 == "B"))
    assert(!got.exists(t => t._1 == "R" || t._2 == "R"))

    // the prune demonstrably shrinks the self-join input: R's rows
    // (and any other infrequent brand's) are gone before the join
    val pruned = Behavior.frequentBaskets(ob, minSup)
    assert(pruned.count() < ob.count(),
      "frequent-itemset prune removed nothing on a corpus with a rare brand")
    assert(pruned.filter(col("brand") === "R").isEmpty)
  }

  test("assocRulesFrom at minSup 0 keeps every brand (prune vacuous, " +
      "no lossy edge at the boundary)") {
    val s = spark
    import s.implicits._
    val ob = Seq((1L, "A"), (1L, "B"), (2L, "A")).toDF("basket", "brand")
    val rows = Behavior.assocRulesFrom(ob, 0).collect()
    assert(rows.length == 1 && rows.head.getString(0) == "A" &&
      rows.head.getString(1) == "B")
    assert(Behavior.frequentBaskets(ob, 0).count() == 3L)
  }

  test("vocabCoverage plans a TakeOrdered shortlist — no unpartitioned " +
      "window over the full vocabulary, values unchanged") {
    val df = Text.vocabCoverage(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected the distributed top-k shortlist in the plan:\n$plan")
    // the only Window runs above the ≤ max(ks)-row shortlist: it must
    // sit downstream of the TakeOrdered, never directly over the
    // vocab-sized aggregate output
    val lines = plan.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window"))
    val takeIdx = lines.indexWhere(_.contains("TakeOrderedAndProject"))
    assert(winIdx >= 0 && takeIdx > winIdx,
      "the ranking window must consume the TakeOrdered shortlist")
    // correctness at the boundary: coverage at max K equals the sum of
    // the top-1024 tf whether or not the full vocab is smaller
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val counts = graft.Tables.documents(spark, sfDir)
      .selectExpr("explode(split(text, ' ')) AS token")
      .groupBy("token").count().collect().map(_.getLong(1)).sorted.reverse
    assert(rows(1024L) == counts.take(1024).sum)
    assert(rows(4L) == counts.take(4).sum)
  }
}
