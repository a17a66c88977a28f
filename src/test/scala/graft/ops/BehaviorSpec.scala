package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the banded interval-overlap join ([[Behavior.sessionOverlapOf]])
  * row-for-row against the naive O(n²) inequality self-join it
  * replaces at scale — the single-capture argument (later session's
  * start bucket is always among the earlier session's covered buckets;
  * ties break on (start, user)) is subtle enough to deserve a direct
  * equivalence witness beyond the oracle run. */
class BehaviorSpec extends SparkTestBase {
  import spark.implicits._

  private val HourMs = 3600000L

  private def naiveOverlap(s: org.apache.spark.sql.DataFrame) = {
    val a = s.select(col("user_id").as("user_a"),
      col("session_start_ms").as("start_a"), col("session_end_ms").as("end_a"))
    val b = s.select(col("user_id").as("user_b"),
      col("session_start_ms").as("start_b"), col("session_end_ms").as("end_b"))
    a.crossJoin(b)
      .filter(col("user_a") =!= col("user_b"))
      .filter(col("start_b") <= col("end_a") && col("start_a") <= col("end_b"))
      .filter(col("start_a") < col("start_b") ||
        (col("start_a") === col("start_b") && col("user_a") < col("user_b")))
      .groupBy(floor(greatest(col("start_a"), col("start_b")) / lit(HourMs.toDouble))
        .cast("long").as("hour_bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("banded session overlap == naive inequality self-join, incl. boundary corners") {
    val rnd = new scala.util.Random(42)
    val random = (0 until 200).map { i =>
      val start = rnd.nextLong(10L * HourMs)
      (i.toLong % 10, start, start + rnd.nextLong(5L * HourMs / 2))
    }
    val corners = Seq(
      // equal starts, different users (the tie-break corner)
      (90L, 7L * HourMs + 5, 7L * HourMs + 100),
      (91L, 7L * HourMs + 5, 7L * HourMs + 200),
      // end exactly ON a bucket boundary, next starts exactly there
      (92L, 11L * HourMs, 12L * HourMs),
      (93L, 12L * HourMs, 12L * HourMs + 1),
      // point session (start == end) inside a long containing session
      (94L, 13L * HourMs + 7, 13L * HourMs + 7),
      (95L, 13L * HourMs, 16L * HourMs))
    val s = (random ++ corners)
      .toDF("user_id", "session_start_ms", "session_end_ms")
    val naive = naiveOverlap(s)
    // band width must not change the result — only the plan's
    // fan-out/bucket-size trade (minute bands for dense corpora, the
    // default hour, and a band wider than the reporting bucket)
    Seq(60000L, 3600000L, 7200000L).foreach { bandMs =>
      val banded = Behavior.sessionOverlapOf(s, bandMs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(banded == naive,
        s"bandMs=$bandMs banded=${banded.toSeq.sorted} naive=${naive.toSeq.sorted}")
    }
    assert(naive.values.sum > 50, "fixture must actually exercise overlaps")
  }

  test("band-width chooser: density forces the ladder down; choice never changes results") {
    // sparse corpus (day-scale range, few sessions): widest rung
    val sparse = (0 until 50).map { i =>
      (i.toLong % 10, i * 30L * 60000L, i * 30L * 60000L + 10L * 60000L)
    }.toDF("user_id", "session_start_ms", "session_end_ms")
    assert(Behavior.chooseBandMs(sparse) == 3600000L)

    // the 1M-event regime in miniature: minute-scale sessions, enough
    // of them that hour bands go quadratic → minute rung
    val rnd = new scala.util.Random(7)
    val mid = (0 until 20000).map { i =>
      val start = rnd.nextLong(10L * 24 * HourMs)
      (i.toLong % 500, start, start + 10 * 60000L + rnd.nextLong(50L * 60000L))
    }.toDF("user_id", "session_start_ms", "session_end_ms")
    assert(Behavior.chooseBandMs(mid) == 60000L)

    // flash-dense corpus: 30k short sessions inside 10 minutes — the
    // per-minute density that forces the SECOND-band fallback
    val dense = (0 until 30000).map { i =>
      val start = rnd.nextLong(10L * 60000L)
      (i.toLong, start, start + 5000L + rnd.nextLong(25000L))
    }.toDF("user_id", "session_start_ms", "session_end_ms")
    assert(Behavior.chooseBandMs(dense) == 1000L)

    // degenerate corpora never crash the chooser
    assert(Behavior.chooseBandMs(sparse.limit(0)) == 3600000L)
    assert(Behavior.chooseBandMs(sparse.limit(1)) == 3600000L)

    // the chosen band is an optimization only — results identical to
    // the naive join on a dense slice
    val slice = dense.limit(400)
    val naive = naiveOverlap(slice)
    val chosen = Behavior.sessionOverlapOf(slice, Behavior.chooseBandMs(slice))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chosen == naive)

    // the oracle-checked integer formulation (q_band_choice) agrees
    // with the production double chooser wherever margins are real
    Seq(sparse, mid, dense).foreach { s =>
      val q = Behavior.bandChoiceOf(s).collect()(0)
      assert(q.getAs[Long]("chosen_band_ms") == Behavior.chooseBandMs(s),
        s"integer query and double chooser disagree on ${q.mkString(",")}")
    }
  }

  test("markovTransitions matches a JVM per-user lag replay and rows are stochastic") {
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "event_type", "unix_millis(ts) AS ts_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).values.toSeq.flatMap { es =>
      es.sortBy(e => (e._4, e._2)).toSeq.sliding(2).collect {
        case Seq((_, _, a, _), (_, _, b, _)) => (a, b)
      }
    }
    val expected = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = Behavior.markovTransitions(spark, sfDir).collect()
      .map(r => (r.getAs[String]("from_state"), r.getAs[String]("to_state"),
        r.getAs[Long]("n"), r.getAs[Long]("p_ppm")))
    assert(got.map(t => (t._1, t._2) -> t._3).toMap == expected)
    got.groupBy(_._1).foreach { case (from, rows) =>
      val total = rows.map(_._3).sum
      rows.foreach { case (_, to, n, ppm) =>
        assert(ppm == n * 1000000L / total, s"$from->$to ppm")
      }
      // truncating division can only lose: row sums to 1e6 minus dust
      val ppmSum = rows.map(_._4).sum
      assert(ppmSum <= 1000000L && ppmSum > 1000000L - rows.length, s"$from row sum $ppmSum")
    }
  }

  test("timeWeightedAvg matches a JVM interval replay (plain AVG would differ)") {
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "unix_millis(ts) AS ts_ms",
        "CAST(round(value * 100) AS BIGINT) AS v_e2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).view.mapValues { es =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val spans = sorted.zip(sorted.tail).map { case (a, b) => (a._4, b._3 - a._3) }
      val svd = spans.map { case (v, d) => BigInt(v) * BigInt(d) }.sum
      val sd = spans.map(s => BigInt(s._2)).sum
      val twa = BigDecimal(svd.toDouble / sd.toDouble / 100.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (spans.length.toLong, spans.map(_._2).sum, twa)
    }.toMap
    val got = EventOps.timeWeightedAvg(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("total_ms"), r.getAs[Double]("twa")))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (u, (n, t, twa)) =>
      val (en, et, etwa) = expected(u)
      assert(n == en && t == et, s"user $u spans")
      assert(math.abs(twa - etwa) < 1e-9, s"user $u twa $twa vs $etwa")
    }
  }

  test("chiSquare margins are consistent and contributions are the margin form") {
    val rows = Behavior.chiSquare(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("weekday"),
        r.getAs[Long]("o"), r.getAs[Long]("r"), r.getAs[Long]("c"),
        r.getAs[Double]("contrib")))
    val n = rows.map(_._3).sum
    rows.groupBy(_._1).foreach { case (t, rs) =>
      assert(rs.map(_._3).sum == rs.head._4, s"row margin for $t") }
    rows.groupBy(_._2).foreach { case (d, rs) =>
      assert(rs.map(_._3).sum == rs.head._5, s"col margin for $d") }
    rows.foreach { case (_, _, o, r, c, contrib) =>
      val od = o.toDouble; val rd = r.toDouble; val cd = c.toDouble; val nd = n.toDouble
      val e = BigDecimal((od * nd - rd * cd) * (od * nd - rd * cd) / (nd * rd * cd))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(contrib - e) < 1e-9)
    }
  }

  test("cohortMatrix: week-0 cells are the cohort sizes and cells never exceed them") {
    val rows = Behavior.cohortMatrix(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("weeks_since"),
        r.getAs[Long]("n_active"), r.getAs[Long]("retained_ppm")))
    assert(rows.nonEmpty)
    val sizes = rows.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    rows.foreach { case (c, k, n, ppm) =>
      assert(n <= sizes(c), s"cohort $c week $k exceeds its size")
      assert(ppm == n * 1000000L / sizes(c))
      if (k == 0) assert(ppm == 1000000L, "everyone is active in their first week")
    }
    // matrix covers every (user, week) exactly once
    val total = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(floor(unix_millis(ts) / 604800000) AS BIGINT) AS week")
      .distinct().count()
    assert(rows.map(_._3).sum == total)
  }

  test("phraseSearch matches a JVM token-scan replay") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      val hits = (0 until t.length - 1).filter(i => t(i) == "sort" && t(i + 1) == "merge")
      if (hits.nonEmpty) Some((id, hits.length.toLong, hits.head.toLong)) else None
    }.sortBy(_._1).toSeq
    val got = graft.ops.Text.phraseSearch(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("first_pos"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "fixture must contain the phrase")
  }

  test("slidingDau counts exactly the users active in each trailing 7-day window") {
    val ud = graft.Tables.events(spark, sfDir)
      .selectExpr("unix_millis(ts) DIV 86400000 AS day", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val maxDay = ud.map(_._1).max
    val expected = ud.flatMap { case (d, u) => (d to math.min(d + 6, maxDay)).map(_ -> u) }
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    val got = Behavior.slidingDau(spark, sfDir).collect()
      .map(r => r.getAs[Long]("report_day") -> r.getAs[Long]("dau7")).toMap
    assert(got == expected)
  }
}
