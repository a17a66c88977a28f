package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MergeScd2Spec extends SparkTestBase {

  test("mergeUpsert routes every key to the right MERGE op with exact balances") {
    val target = graft.Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 3 =!= 0).collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        math.round(r.getAs[Double]("c_acctbal") * 100)).toMap
    val spend = graft.Tables.orders(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
      .view.mapValues(_.map(r => math.round(r.getAs[Double]("o_totalprice") * 100)).sum)
      .toMap
    val got = Joins.mergeUpsert(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("new_bal_cents"), r.getAs[String]("op")))
    assert(got.map(_._1).toSet == (target.keySet ++ spend.keySet))
    got.foreach { case (k, bal, op) =>
      (target.get(k), spend.get(k)) match {
        case (Some(t), Some(s)) => assert(op == "update" && bal == t + s, s"key $k")
        case (Some(t), None)    => assert(op == "keep" && bal == t, s"key $k")
        case (None, Some(s))    => assert(op == "insert" && bal == s, s"key $k")
        case (None, None)       => fail(s"key $k came from neither side")
      }
    }
    // the target filter must actually exercise the insert path
    assert(got.exists(_._3 == "insert") && got.exists(_._3 == "update"))
  }

  test("scd2Intervals tile each user's timeline with alternating states") {
    val rows = EventOps.scd2Intervals(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("run_seq"),
        r.getAs[String]("state"), r.getAs[Long]("valid_from_ms"),
        Option(r.getAs[java.lang.Long]("valid_to_ms")).map(_.toLong),
        r.getAs[Long]("n_events")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, runs) =>
      val sorted = runs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"user $user: run_seq gaps")
      sorted.sliding(2).foreach {
        case Array(prev, next) =>
          assert(prev._5.contains(next._4), s"user $user: interval ${prev._2} must close at next open")
          assert(prev._3 != next._3, s"user $user: consecutive runs share state — not collapsed")
        case _ =>
      }
      assert(sorted.last._5.isEmpty, s"user $user: final interval must be open-ended")
      // run events cover exactly the user's events
      val expected = graft.Tables.events(spark, sfDir)
        .filter(col("user_id") === user).count()
      assert(sorted.map(_._6).sum == expected, s"user $user: n_events must cover the log")
    }
  }

  test("sparseCosinePairs scores match a JVM tf-idf replay on the emitted pairs") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tokensOf = docs.view.mapValues(_.split(" ", -1).toSeq).toMap
    val n = docs.size.toDouble
    val dfMap = tokensOf.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    def weights(id: Long): Map[String, Long] =
      tokensOf(id).groupBy(identity).map { case (t, ts) =>
        t -> ts.size * math.round(math.log(n / dfMap(t)) * 10000)
      }
    val got = Dedup.sparseCosinePairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("cosine")))
    assert(got.nonEmpty)
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sortBy(-_), "must come out cosine-desc")
    got.foreach { case (a, b, cos) =>
      val wa = weights(a); val wb = weights(b)
      val dot = wa.keySet.intersect(wb.keySet).toSeq.map(t => wa(t) * wb(t)).sum
      val na = math.sqrt(wa.values.map(w => w * w).sum.toDouble)
      val nb = math.sqrt(wb.values.map(w => w * w).sum.toDouble)
      val expected = dot / (na * nb)
      assert(math.abs(cos - expected) < 1e-3, s"pair ($a,$b): $cos vs $expected")
      assert(cos <= 1.0001 && cos >= -1.0001)
    }
  }
}
