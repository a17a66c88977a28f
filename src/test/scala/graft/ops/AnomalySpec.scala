package graft.ops

import graft.SparkTestBase

class AnomalySpec extends SparkTestBase {

  /** JVM replay of the query's exact-moments-then-double decision:
    * micro-scaled values summed as BigInt (exact, order-free), the flag
    * and z computed with the letter-identical double formula. */
  private def replay(sfDir: String): Seq[(String, Long, Long, Long, Double)] = {
    val rows = graft.Tables.events(spark, sfDir)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getString(1), r.getLong(0),
        BigDecimal(r.getDouble(2) * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val byType = rows.groupBy(_._1)
    byType.toSeq.flatMap { case (tpe, es) =>
      val n = es.length.toLong
      val s = es.map(e => BigInt(e._3)).sum
      val q = es.map(e => BigInt(e._3) * BigInt(e._3)).sum
      val nd = n.toDouble; val sd = s.toDouble; val qd = q.toDouble
      es.flatMap { case (_, id, v) =>
        val dev = nd * v.toDouble - sd
        if (dev * dev > 9.0 * (nd * qd - sd * sd))
          Some((tpe, id, v, n,
            BigDecimal(dev / math.sqrt(nd * qd - sd * sd))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        else None
      }
    }.sortBy(t => (t._1, t._2))
  }

  test("anomalyZscore matches the exact-moment JVM replay") {
    val got = Aggregates.anomalyZscore(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        r.getAs[Long]("value_e6"), r.getAs[Long]("n"), r.getAs[Double]("z"))).toSeq
    val expected = replay(sfDir)
    assert(got.map(t => (t._1, t._2, t._3, t._4)) ==
      expected.map(t => (t._1, t._2, t._3, t._4)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._5 - e._5) < 1e-9, s"z mismatch for event ${g._2}")
    }
  }

  test("every flagged event is > 3 sigma; all are far-tail values") {
    val flagged = Aggregates.anomalyZscore(spark, sfDir).collect()
    assert(flagged.nonEmpty, "no outliers at sf0.001 — threshold test is vacuous")
    flagged.foreach { r =>
      assert(math.abs(r.getAs[Double]("z")) > 3.0 - 1e-4)
    }
  }
}
