package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-8 continuation queries: the DP histogram release
  * ([[Pipeline.dpCounts]]), the supervised Naive-Bayes quality
  * classifier ([[Text.nbQuality]]), and the recursive-CTE calendar
  * spine through shared SQL text ([[graft.Views.recursiveSpineSql]]) —
  * each replayed exactly in plain Scala (BigDecimal HALF_UP to match
  * Spark's `round`) or pinned by closed-form invariants, plus the plan
  * shapes that make them scale. */
class Round8ContinuationSpec extends SparkTestBase {

  private def halfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dpCounts: exact plain-Scala replay of the seeded Laplace draw; " +
      "true counts match the direct aggregate; release is exact BIGINT") {
    val eps = 500000L
    val got = Pipeline.dpCounts(spark, sfDir, eps).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val trueCounts = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted && got.nonEmpty)
    got.foreach { case (et, nTrue, epsPpm, noiseE6, noisyE6) =>
      assert(nTrue == trueCounts(et))
      assert(epsPpm == eps)
      val h = java.lang.Long.parseLong(md5Hex(et).take(12), 16)
      val u = (h + 0.5) / 281474976710656.0
      val b = 1000000.0 / eps
      val noise = -b * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
      assert(noiseE6 == halfUp(noise * 1e6), s"$et: noise draw must replay exactly")
      assert(noisyE6 == nTrue * 1000000L + noiseE6, "release is exact integer arithmetic")
    }
    // ε scaling: b = 1/ε, and the draw is linear in b for a fixed seed
    val half = Pipeline.dpCounts(spark, sfDir, eps / 2).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    got.foreach { case (et, _, _, noiseE6, _) =>
      assert(math.abs(half(et) - 2L * noiseE6) <= 1L,
        s"$et: halving epsilon must double the Laplace scale (one rounding ulp)")
    }
  }

  test("dpCounts plan: one hash aggregate, no join, noise is a per-group " +
      "scalar expression") {
    val p = Pipeline.dpCounts(spark, sfDir).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(p.contains("HashAggregate"))
  }

  test("nbQuality: exact plain-Scala Naive-Bayes replay (labels from the " +
      "proven decile expression), admitted <= scored, doc accounting exact") {
    val docs = graft.Tables.documents(spark, sfDir).filter(col("text").isNotNull)
    val seed = docs.filter(col("doc_id") % 20 === 0)
      .select(col("text"), (Text.qualityDecile >= 7).as("pos"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    def toks(text: String): Seq[String] = text.split(" ", -1).toSeq
    val cp = new scala.collection.mutable.HashMap[String, Long]().withDefaultValue(0L)
    val cn = new scala.collection.mutable.HashMap[String, Long]().withDefaultValue(0L)
    seed.foreach { case (t, pos) =>
      toks(t).foreach(tok => if (pos) cp(tok) += 1 else cn(tok) += 1)
    }
    val vocab = (cp.keySet ++ cn.keySet).toSet
    val (np, nn, v) = (cp.values.sum, cn.values.sum, vocab.size.toLong)
    val dpos = seed.count(_._2).toLong
    val dneg = seed.size - dpos
    def llr(tok: String): Long =
      if (!vocab.contains(tok))
        halfUp((math.log(1.0 / (np + v)) - math.log(1.0 / (nn + v))) * 10000)
      else halfUp((math.log((cp(tok) + 1.0) / (np + v)) -
        math.log((cn(tok) + 1.0) / (nn + v))) * 10000)
    val prior = halfUp(math.log((dpos + 1.0) / (dneg + 1.0)) * 10000)
    val probe = docs.filter(col("doc_id") % 20 =!= 0)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = probe.map { case (src, t) =>
      (src, prior + toks(t).map(llr).sum)
    }.groupBy(_._1).map { case (src, xs) =>
      val scores = xs.map(_._2)
      val admitted = scores.count(_ > 0).toLong
      (src, (scores.size.toLong, admitted,
        admitted * 1000000L / scores.size, scores.sum))
    }
    val got = Text.nbQuality(spark, sfDir).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected, s"NB replay mismatch:\n got $got\n exp $expected")
    assert(got.values.map(_._1).sum == probe.length,
      "every scored doc lands in exactly one source row")
    got.values.foreach { case (n, adm, ppm, _) =>
      assert(adm <= n && ppm <= 1000000L)
    }
  }

  test("nbConfusion: the matrix partitions the scored docs exactly and " +
      "agrees with nbQuality's admission counts cell-for-cell") {
    val adm = Text.nbQuality(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val conf = Text.nbConfusion(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(conf.nonEmpty && conf.map(_._1).toSet == adm.keySet)
    conf.foreach { case (src, n, tp, fp, fn, tn, accPpm) =>
      assert(tp + fp + fn + tn == n, s"$src: matrix must partition the docs")
      assert(tp + fp == adm(src)._2,
        s"$src: predicted-positive mass must equal nbQuality's admissions")
      assert(n == adm(src)._1)
      assert(accPpm == (tp + tn) * 1000000L / n)
    }
  }

  test("nbQuality plan: the model/scalars ride broadcasts (1-row or " +
      "seed-vocab-sized); no cartesian product; the corpus is scanned, " +
      "never nested-looped against itself") {
    val p = Text.nbQuality(spark, sfDir).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }

  test("recursiveSpine: 84 consecutive first-of-month rows, order totals " +
      "conserve exactly, empty months zero-fill") {
    val rows = graft.Views.recursiveSpine(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    assert(rows.length == 84)
    rows.zipWithIndex.foreach { case ((d, _, _), i) =>
      assert(d == java.time.LocalDate.of(1995 + i / 12, i % 12 + 1, 1),
        s"row $i: $d is not the spine month")
    }
    val orders = graft.Tables.orders(spark, sfDir)
    val nOrders = orders.count()
    val cents = orders.agg(
      sum(round(col("o_totalprice") * 100).cast("long"))).collect()(0).getLong(0)
    assert(rows.map(_._2).sum == nOrders, "spine conserves the order count")
    assert(rows.map(_._3).sum == cents, "spine conserves the cents mass")
    assert(rows.exists(r => r._2 == 0L && r._3 == 0L),
      "the spine's raison d'etre: months with no orders are PRESENT at zero")
    // zero rows only where the corpus truly has no orders in the month
    val present = orders.select(
      ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1).as("m"))
      .distinct().collect().map(_.getInt(0)).toSet
    rows.zipWithIndex.foreach { case ((_, n, _), i) =>
      assert((n > 0) == present.contains(i), s"month $i zero-fill mismatch")
    }
  }

  test("recursiveSpine plan: executes through UnionLoop (real recursion, " +
      "not an unrolled literal), spine side stays driver-bounded") {
    val qe = graft.Views.recursiveSpine(spark, sfDir).queryExecution
    assert(qe.optimizedPlan.toString.contains("UnionLoop") ||
      qe.executedPlan.toString.contains("UnionLoop"),
      "the shared SQL text must plan as a recursive CTE")
  }

  /** The zero-filled per-type daily series, replayed in plain Scala
    * from the raw events — the shared input of the time-series trio. */
  private def dailySeriesReplay(): Map[String, Array[Long]] = {
    val rows = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_millis(ts) DIV 86400000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val d0 = rows.map(_._2).min
    val d1 = rows.map(_._2).max
    val n = (d1 - d0 + 1).toInt
    rows.groupBy(_._1).map { case (et, rs) =>
      val xs = new Array[Long](n)
      rs.foreach { case (_, d) => xs((d - d0).toInt) += 1 }
      et -> xs
    }
  }

  test("autocorr: exact plain-Scala replay over the zero-filled series; " +
      "|r| bounded by 1 (Cauchy-Schwarz)") {
    val series = dailySeriesReplay()
    val got = EventOps.autocorr(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.nonEmpty)
    got.foreach { case ((et, lag), (nPairs, num, den, rE6)) =>
      val xs = series(et); val n = xs.length.toLong; val s = xs.sum
      val dev = xs.map(_ * n - s)
      val k = lag.toInt
      val expNum = (0 until xs.length - k).map(t => dev(t) * dev(t + k)).sum
      val expDen = dev.map(d => d * d).sum
      assert(nPairs == xs.length - k)
      assert(num == expNum && den == expDen, s"($et, $lag) moment mismatch")
      assert(rE6 == halfUp(1e6 * expNum / expDen), s"($et, $lag) r mismatch")
      assert(math.abs(rE6) <= 1000000L, "Cauchy-Schwarz bound")
    }
  }

  test("holtForecast: exact plain-Scala fold replay; a constant series " +
      "yields zero trend and level = x") {
    val series = dailySeriesReplay()
    val got = EventOps.holtForecast(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    def replay(xs: Array[Long]): (Long, Long) = {
      var l = xs(0) * 1000000L
      var b = (xs(1) - xs(0)) * 1000000L
      (1 until xs.length).foreach { t =>
        val l2 = math.floorDiv(xs(t) * 1000000L + l + b, 2L)
        b = math.floorDiv(3L * (l2 - l) + 7L * b, 10L)
        l = l2
      }
      (l, b)
    }
    series.foreach { case (et, xs) =>
      val (l, b) = replay(xs)
      val (nDays, level, trend, forecast) = got(et)
      assert(nDays == xs.length)
      assert(level == l && trend == b, s"$et fold mismatch: got ($level,$trend) exp ($l,$b)")
      assert(forecast == l + b)
    }
    val (lc, bc) = replay(Array.fill(10)(42L))
    assert(lc == 42000000L && bc == 0L, "constant series: level = x, trend = 0")
  }

  test("changepoint: brute-force argmax replay; split means reproduce") {
    val series = dailySeriesReplay()
    val got = EventOps.changepoint(spark, sfDir).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    series.foreach { case (et, xs) =>
      val n = xs.length.toLong; val s = xs.sum
      val best = (1L until n).map { p =>
        val st = xs.take(p.toInt).sum
        val a = st * n - s * p
        (halfUp(1e6 * a * a / (p * (n - p))), -p, st)
      }.max
      val (nDays, splitP, score, mb, ma) = got(et)
      assert(nDays == n && splitP == -best._2 && score == best._1, s"$et argmax mismatch")
      assert(mb == halfUp(1e6 * best._3 / splitP))
      assert(ma == halfUp(1e6 * (s - best._3) / (n - splitP)))
    }
  }

  test("seasonalDecompose: exact plain-Scala replay; x = trend + seasonal " +
      "+ residual holds row-exactly by construction") {
    val series = dailySeriesReplay()
    val got = EventOps.seasonalDecompose(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    series.foreach { case (et, xs) =>
      val n = xs.length
      val trend = (0 until n).map { t =>
        val lo = math.max(0, t - 3); val hi = math.min(n - 1, t + 3)
        val sw = (lo to hi).map(xs).sum
        sw * 1000000L / (hi - lo + 1) // non-negative: DIV == floor
      }
      val det = (0 until n).map(t => xs(t) * 1000000L - trend(t))
      val seasonal = (0 until 7).map { d =>
        val vals = (0 until n).filter(_ % 7 == d).map(det)
        d -> math.floor(vals.sum.toDouble / vals.size).toLong
      }.toMap
      val res = (0 until n).map(t => det(t) - seasonal(t % 7))
      val mad = math.floor(res.map(math.abs).sum.toDouble / n).toLong
      (0 until n).foreach { t =>
        val (gx, gtr, gse, gre, gan) = got((et, t.toLong))
        assert(gx == xs(t) && gtr == trend(t) && gse == seasonal(t % 7) &&
          gre == res(t), s"($et, $t) decomposition mismatch")
        assert(gan == (math.abs(res(t)) > mad * 3))
        assert(gx * 1000000L == gtr + gse + gre,
          "additive identity must hold row-exactly")
      }
    }
  }

  test("bootstrapCi: exact plain-Scala Poisson-bootstrap replay; interval " +
      "ordered and rank-based") {
    val rows = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val reps = 32
    val thresholds = Aggregates.poissonHexThresholds
    def weight(id: Long, rep: Int): Long = {
      val h = md5Hex(s"$id:$rep").take(12)
      thresholds.count(t => h >= t).toLong
    }
    val expected = rows.groupBy(_._1).map { case (et, rs) =>
      val repMeans = (0 until reps).map { rep =>
        val ws = rs.map { case (_, id, c) => (weight(id, rep), c) }
        val sw = ws.map(_._1).sum
        (ws.map { case (w, c) => w * c }.sum * 10000L / sw, rep)
      }.sortBy(identity).map(_._1)
      val n = rs.length.toLong
      val mean = rs.map(_._3).sum * 10000L / n
      et -> (n, mean, repMeans(1), repMeans(reps - 2),
        repMeans(reps - 2) - repMeans(1))
    }
    val actual = Aggregates.bootstrapCi(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(actual == expected, s"bootstrap replay mismatch:\n $actual\n $expected")
    actual.values.foreach { case (_, _, lo, hi, spread) =>
      assert(lo <= hi && spread == hi - lo)
    }
  }

  test("assocRules: exact plain-Scala basket replay; support/confidence/" +
      "lift identities hold") {
    val ob = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val baskets = ob.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n = baskets.size.toLong
    val sup = ob.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairCounts = new scala.collection.mutable.HashMap[(String, String), Long]()
      .withDefaultValue(0L)
    baskets.values.foreach { bs =>
      val s = bs.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.size) pairCounts((s(i), s(j))) += 1
    }
    val expected = pairCounts.toSeq.collect {
      case ((a, b), sab) if sab * 100 >= n =>
        (a, b, sab, sup(a), sup(b), sab * 1000000L / sup(a),
          sab * n * 1000000L / (sup(a) * sup(b)))
    }.sortBy(t => (t._1, t._2))
    val got = Behavior.assocRules(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected, s"basket replay mismatch: got ${got.take(3)}…")
    got.foreach { case (_, _, sab, sa, sb, conf, _) =>
      assert(sab <= math.min(sa, sb), "support of the pair bounds by each side")
      assert(conf <= 1000000L)
    }
    assert(got.nonEmpty)
  }

  test("goldenRecord: clusters are transitively-closed components of the " +
      "fuzzy pairs, the canonical is a max-parts member, and part mass is " +
      "conserved across clusters + singletons") {
    val pairs = SetAndScalar.fuzzyNamePairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val golden = SetAndScalar.goldenRecord(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reference components via plain transitive closure
    val adj = new scala.collection.mutable.HashMap[String, Set[String]]()
      .withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    var comps = Map.empty[String, Set[String]]
    val seen = scala.collection.mutable.Set.empty[String]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!seen.contains(start)) {
        var frontier = Set(start); var comp = Set.empty[String]
        while (frontier.nonEmpty) {
          comp ++= frontier; seen ++= frontier
          frontier = frontier.flatMap(adj).diff(comp)
        }
        comps += (comp.min -> comp)
      }
    }
    val parts = graft.Tables.part(spark, sfDir).groupBy(col("p_name"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = comps.values.filter(_.size >= 2).map { comp =>
      val canonical = comp.toSeq.map(n => (-parts(n), n)).min._2
      (canonical, comp.size.toLong, comp.toSeq.map(parts).sum, parts(canonical))
    }.toSeq.sortBy(_._1)
    assert(golden.toSeq == expected,
      s"golden record must replay the closure + survivorship exactly")
    // conservation: clustered mass + unclustered names = all parts
    val clusteredNames = comps.values.filter(_.size >= 2).flatten.toSet
    val unclustered = parts.filterNot(kv => clusteredNames.contains(kv._1)).values.sum
    assert(golden.map(_._3).sum + unclustered == parts.values.sum,
      "every part belongs to exactly one cluster or stays a singleton")

    // the driver guard fires via a distributed COUNT, before any edge
    // is collected: an over-cap match graph fails loud naming the cap,
    // never an OOM from collect-then-require (cap injected below the
    // real edge count so the corpus trips it)
    val eCap = intercept[IllegalArgumentException](
      SetAndScalar.goldenRecord(spark, sfDir, maxEdges = 0L))
    assert(eCap.getMessage.contains("exceed the driver guard"))
  }
}
