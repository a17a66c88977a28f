package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariant + JVM-replay coverage for the round-5 analytics batch:
  * shingle containment, RFM segmentation, market share, Zipf fit. The
  * exactness proof for each lives in the DuckDB oracle; these tests
  * pin the semantics that a hash compare alone would not explain. */
class AnalyticsOpsSpec extends SparkTestBase {

  // ---------------- shingleContainment ----------------

  test("shingleContainment: bounds, threshold, and dominance over Jaccard") {
    val rows = Dedup.shingleContainment(spark, sfDir).collect()
    assert(rows.nonEmpty, "corpus has planted near-dups; containment must find pairs")
    rows.foreach { r =>
      val ab = r.getAs[Long]("cont_a_in_b_ppm")
      val ba = r.getAs[Long]("cont_b_in_a_ppm")
      assert(ab >= 0 && ab <= 1000000L && ba >= 0 && ba <= 1000000L)
      assert(math.max(ab, ba) >= 600000L, "below-threshold pair leaked through")
    }
    // containment >= Jaccard on the same pair: inter/|A| >= inter/|A∪B|
    val cont = Dedup.shingleContainment(spark, sfDir, minPpm = 0L)
      .select(col("doc_a"), col("doc_b"),
        greatest(col("cont_a_in_b_ppm"), col("cont_b_in_a_ppm")).as("cont"))
    val jac = Dedup.ngramJaccardPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), col("ngram_jaccard"))
    val joined = cont.join(jac, Seq("doc_a", "doc_b")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val c = r.getAs[Long]("cont")
      val j = (r.getAs[Double]("ngram_jaccard") * 1000000L).toLong
      assert(c >= j - 200, s"containment $c below Jaccard $j on ${r}")
    }
  }

  // ---------------- rfmSegments ----------------

  /** DuckDB quantile_cont / Spark percentile shared definition. */
  private def quantileCont(sorted: Array[Long], p: Double): Double = {
    val h = (sorted.length - 1) * p
    val lo = math.floor(h).toInt
    if (lo + 1 >= sorted.length) sorted(lo).toDouble
    else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
  }

  test("rfmSegments matches a JVM replay of the whole segmentation") {
    val orders = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"),
        col("o_totalprice"))
      .collect()
    val maxMs = orders.map(_.getAs[Long]("ms")).max
    val per = orders.groupBy(_.getAs[Long]("o_custkey")).map { case (ck, rs) =>
      val rec = (maxMs - rs.map(_.getAs[Long]("ms")).max) / 86400000L
      val freq = rs.length.toLong
      val mon = rs.map(r => math.round(r.getAs[Double]("o_totalprice") * 100)).sum
      (ck, rec, freq, mon)
    }.toArray
    def thresholds(xs: Array[Long]): Array[Double] = {
      val s = xs.sorted
      Array(quantileCont(s, 0.25), quantileCont(s, 0.5), quantileCont(s, 0.75))
    }
    val rq = thresholds(per.map(_._2))
    val fq = thresholds(per.map(_._3))
    val mq = thresholds(per.map(_._4))
    def above(v: Long, q: Array[Double]): Int = q.count(v.toDouble > _)
    val expected = per.groupBy { case (_, rec, freq, mon) =>
      (1 + above(rec, rq), 4 - above(freq, fq), 4 - above(mon, mq))
    }.map { case (k, vs) => k -> ((vs.length.toLong, vs.map(_._4).sum)) }
    val got = Aggregates.rfmSegments(spark, sfDir).collect().map { r =>
      (r.getAs[Int]("r"), r.getAs[Int]("f"), r.getAs[Int]("m")) ->
        ((r.getAs[Long]("n_customers"), r.getAs[Long]("sum_monetary_cents")))
    }.toMap
    assert(got == expected)
    // partition of the ordering-customer population
    assert(got.values.map(_._1).sum == per.length.toLong)
  }

  // ---------------- marketShare ----------------

  test("marketShare: year totals are consistent and shares sum to ~1e6") {
    val rows = Joins.marketShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("o_year")).foreach { case (_, rs) =>
      val yearCents = rs.map(_.getAs[Long]("year_cents")).distinct
      assert(yearCents.length == 1, "year_cents must be constant within a year")
      assert(rs.map(_.getAs[Long]("nation_cents")).sum == yearCents.head)
      val shareSum = rs.map(_.getAs[Long]("share_ppm")).sum
      // truncating DIV loses < 1 ppm per nation row
      assert(shareSum <= 1000000L && shareSum > 1000000L - rs.length,
        s"share sum $shareSum out of range for ${rs.length} nations")
      rs.foreach { r =>
        assert(r.getAs[Long]("share_ppm") ==
          r.getAs[Long]("nation_cents") * 1000000L / yearCents.head)
      }
    }
    // suppliers from every nation of the market region's 5-nation ring
    val nations = rows.map(_.getAs[String]("supp_nation")).distinct
    assert(nations.forall(_.startsWith("NATION_")))
  }

  test("marketShare region parameter restricts the market") {
    val asia = Joins.marketShare(spark, sfDir, "ASIA").collect()
      .map(_.getAs[Long]("nation_cents")).sum
    val europe = Joins.marketShare(spark, sfDir, "EUROPE").collect()
      .map(_.getAs[Long]("nation_cents")).sum
    val all = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")))
      .collect()(0).getLong(0)
    assert(asia > 0 && europe > 0 && asia + europe < all,
      "each region market must be a strict subset of global revenue")
  }

  // ---------------- zipfSlope ----------------

  test("zipfSlope matches an exact JVM least-squares replay") {
    val tf = graft.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count().collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("count"))
      .sortBy { case (t, c) => (-c, t) }
    val pts = tf.zipWithIndex.map { case ((_, c), i) =>
      (math.round(math.log(i + 1.0) * 10000), math.round(math.log(c.toDouble) * 10000))
    }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n / 10000.0
    val row = Text.zipfSlope(spark, sfDir).collect()(0)
    assert(row.getAs[Long]("n") == pts.length.toLong)
    assert(row.getAs[Double]("slope") ==
      BigDecimal(slope).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
    assert(row.getAs[Double]("intercept") ==
      BigDecimal(intercept).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
    // a frequency-ranked corpus always slopes downward
    assert(row.getAs[Double]("slope") < 0.0)
  }
}
