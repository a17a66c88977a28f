package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Driver-side exact replays and invariants for the round-6 session-2
  * operator batch: CEP pattern matching, compaction planning, Z-order
  * skipping, JL projection, the quality×dup cross audit, and the
  * Kneser–Ney LM. Each test re-derives the query's answer (or a
  * provable invariant of it) from raw collected inputs in plain
  * Scala, independent of both Spark SQL and the DuckDB oracle. */
class Round6OpsSpec extends SparkTestBase {

  test("seqPattern == plain-Scala pattern automaton over the filtered stream") {
    val spanMs = 172800000L
    val raw = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = raw.groupBy(_._1).flatMap { case (user, rows) =>
      val seq = rows.sortBy(r => (r._3, r._4))
      val spans = seq.sliding(3).collect {
        case Array(a, b, c)
          if a._2 == "view" && b._2 == "click" && c._2 == "purchase" &&
            c._3 - a._3 <= spanMs => c._3 - a._3
      }.toSeq
      if (spans.isEmpty) None
      else Some(user -> ((spans.size.toLong, spans.min, spans.max)))
    }.toMap
    val got = Behavior.seqPattern(spark, sfDir, spanMs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "pattern should fire at sf0.001 with the 48h span")
  }

  test("compactionPlan == plain-Scala first-fit packing; conserves events and bytes") {
    val target = 131072L
    val objs = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_millis(ts) DIV 3600000"),
        (coalesce(length(col("props")), lit(0)) + lit(64)).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = objs.groupBy(r => (r._1, r._2))
      .map { case ((t, h), rs) => (t, h, rs.size.toLong, rs.map(_._3).sum) }
      .toSeq.groupBy(_._1).toSeq.flatMap { case (t, hs) =>
        var cum = 0L
        hs.sortBy(_._2).map { case (_, h, n, bytes) =>
          val grp = cum / target; cum += bytes; ((t, grp), (1L, bytes, n, h, h))
        }
      }.groupBy(_._1).map { case (k, vs) =>
        val v = vs.map(_._2)
        k -> ((v.map(_._1).sum, v.map(_._2).sum, v.map(_._3).sum,
          v.map(_._4).min, v.map(_._5).max))
      }
    val got = EventOps.compactionPlan(spark, sfDir, target).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected)
    // conservation: every event and byte lands in exactly one group
    assert(got.values.map(_._3).sum == objs.map(_ => 1L).sum)
    assert(got.values.map(_._2).sum == objs.map(_._3).sum)
    // groups respect the target: all but each type's last group close
    // at or past one target of cumulative payload (first-fit property:
    // group g starts only when cum passed g·target)
    got.keys.groupBy(_._1).foreach { case (_, ks) =>
      val grps = ks.map(_._2).toSeq.sorted
      assert(grps == grps.distinct && grps.head == 0L)
    }
  }

  test("zorderSkip: zones are aligned 8x8 tiles, skips are sound, matches are complete") {
    val rows = EventOps.zorderSkip(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minX, maxX) = (r.getLong(2), r.getLong(3))
      val (minY, maxY) = (r.getLong(4), r.getLong(5))
      val (nMatch, canSkip) = (r.getLong(6), r.getBoolean(7))
      // a Z-range of 64 cells is one aligned 8×8 tile: bounds stay
      // inside a single (x DIV 8, y DIV 8) tile
      assert(minX / 8 == maxX / 8 && minY / 8 == maxY / 8,
        s"zone ${r.getLong(0)} spans tiles: x[$minX,$maxX] y[$minY,$maxY]")
      if (canSkip) assert(nMatch == 0, s"unsound skip in zone ${r.getLong(0)}")
    }
    // completeness: zone-level matches sum to the direct predicate count
    val direct = Tables.events(spark, sfDir)
      .filter(col("user_id") % 256 >= 96 && col("user_id") % 256 < 160 &&
        expr("(unix_millis(ts) DIV 3600000) % 256").between(8, 15))
      .count()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.events(spark, sfDir).count(), "zones partition the corpus")
    assert(rows.map(_.getLong(6)).sum == direct)
  }

  test("jlProjection: exact column replays, distortion bounded, all pairs present") {
    val rows = Similarity.jlProjection(spark, sfDir).collect()
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // every non-NaN pair appears exactly once
    assert(rows.length == emb.size * (emb.size - 1) / 2)
    // exact-cosine column replay on a sample of pairs
    rows.take(50).foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (va, vb) = (emb(a), emb(b))
      val dot = va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val cos = dot / (math.sqrt(va.map(x => x.toDouble * x).sum) *
        math.sqrt(vb.map(x => x.toDouble * x).sum))
      val cosE4 = math.round(BigDecimal(cos).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 10000)
      assert(r.getLong(2) == cosE4, s"pair ($a,$b): ${r.getLong(2)} vs $cosE4")
    }
    // JL distortion: mean absolute cosine error under 0.45 at k=8
    // (1/√8 ≈ 0.35 expected single-pair deviation scale)
    val errs = rows.filter(!_.isNullAt(4)).map(_.getLong(4))
    assert(errs.nonEmpty && errs.sum / errs.length < 4500,
      s"mean err_e4 ${errs.sum / errs.length}")
  }

  test("qualityDupLift: partitions the corpus, rates and lift replay exactly") {
    val rows = Selection.qualityDupLift(spark, sfDir).collect()
    val nTotal = rows.map(_.getLong(1)).sum
    val nDupTotal = rows.map(_.getLong(2)).sum
    assert(nTotal == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val (nDocs, nDup) = (r.getLong(1), r.getLong(2))
      assert(nDup <= nDocs)
      assert(r.getLong(3) == nDup * 1000000L / nDocs)
      if (nDupTotal == 0) assert(r.isNullAt(4))
      else assert(r.getLong(4) == nDup * nTotal * 1000L / (nDocs * nDupTotal))
    }
    assert(nDupTotal > 0, "sf0.001 corpus has confirmed near-dups")
  }

  test("skewProfile: exact share/salt replay; salting the hot keys restores fair slices") {
    val rows = Skew.skewProfile(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
    val total = rows.map(_._2).sum
    rows.foreach { case (_, n, share, hot, salt) =>
      assert(share == n * 1000000L / total)
      assert(hot == (share * 32 > 1000000L))
      assert(salt == math.max(1L, (share * 32 + 999999L) / 1000000L))
      // the recommendation's point: each salted sub-key is at or under
      // a fair 1/parallelism slice (integer slack of one rounding step)
      assert(share / salt <= 1000000L / 32 + 1)
    }
    // 5 event types at ~20% each: all hot for a 32-way shuffle
    assert(rows.forall(_._4), "every 5-way key is hot at parallelism 32")
  }

  test("vocabGrowth == plain-Scala first-occurrence cohorts; curve is monotone") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
      .sortBy(_._1)
    val firstPos = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var gpos = 0L
    docs.foreach { case (_, text) =>
      text.split(" ", -1).foreach { tok =>
        if (!firstPos.contains(tok)) firstPos(tok) = gpos
        gpos += 1
      }
    }
    val expected = firstPos.values
      .groupBy(p => 63 - java.lang.Long.numberOfLeadingZeros(p + 1))
      .map { case (c, ps) => c.toLong -> ps.size.toLong }
    val got = Text.vocabGrowth(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(r => r._1 -> r._2).toMap == expected)
    // cumulative column telescopes and the curve is strictly monotone
    var cum = 0L
    got.foreach { case (c, n, v, prefix) =>
      cum += n
      assert(v == cum)
      assert(prefix == (1L << (c + 1)) - 1)
    }
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted)
  }

  test("cooccurWindow == brute-force windowed pair count + PMI replay") {
    val window = 4
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => Option(r.getString(1)).getOrElse(""))
    val pairs = docs.flatMap { text =>
      val t = text.split(" ", -1)
      for { i <- t.indices; j <- (i + 1) to math.min(i + window, t.length - 1) }
        yield (t(i), t(j))
    }
    val cb = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = cb.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val c2 = cb.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val n = cb.values.sum
    val expected = cb.filter(_._2 >= 10).map { case ((w1, w2), c12) =>
      (w1, w2, c12, math.round(math.log(c12.toDouble * n / (c1(w1) * c2(w2))) * 10000))
    }.toSeq.sortBy(r => (-r._4, r._1, r._2)).take(100)
    val got = Text.cooccurWindow(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.size == 100)
  }

  test("contextLenPlanner: kept+lost conserves tokens; losses shrink as budgets grow") {
    val rows = Pipeline.contextLenPlanner(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val totalTokens = Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).cast("long")).collect().map(_.getLong(0)).sum
    rows.foreach { case (_, _, _, kept, lost, ppm) =>
      assert(kept + lost == totalTokens, "truncation must conserve token mass")
      assert(ppm == lost * 1000000L / (kept + lost))
    }
    // monotone: a bigger budget never truncates more docs or tokens
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._5 <= a._5)
    }
    assert(rows.map(_._1).toSeq == Pipeline.ContextBudgets)
  }

  test("labelBalance: shares partition the corpus; imbalance replays exactly") {
    val rows = Similarity.labelBalance(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.map(_._2).sum
    assert(total == Tables.embeddings(spark, sfDir).count())
    val ratio = rows.map(_._2).max * 1000L / rows.map(_._2).min
    rows.foreach { case (_, n, share, imb) =>
      assert(share == n * 1000000L / total)
      assert(imb == ratio)
    }
  }

  test("knLm == plain-Scala interpolated Kneser-Ney replay") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
    def grams(text: String): Seq[(String, String)] = {
      val t = text.split(" ", -1)
      if (t.length < 2) Seq.empty else t.sliding(2).map(a => (a(0), a(1))).toSeq
    }
    val train = docs.filter(_._1 % 20 == 0).flatMap(d => grams(d._2))
    val c12 = train.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ctx1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val n1fwd = c12.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val n1bwd = c12.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val nTypes = c12.size.toLong
    val expected = docs.filter(_._1 % 20 != 0).flatMap { case (id, text) =>
      val gs = grams(text)
      if (gs.isEmpty) None else {
        val scored = gs.map { g =>
          val pCont = n1bwd.getOrElse(g._2, 1L).toDouble / nTypes
          val uCtx = if (ctx1.contains(g._1)) 0L else 1L
          val uBi = if (c12.contains(g)) 0L else 1L
          val p =
            if (uCtx == 0)
              math.max(c12.getOrElse(g, 0L).toDouble - 0.75, 0.0) / ctx1(g._1) +
                (0.75 * n1fwd(g._1) / ctx1(g._1)) * pCont
            else pCont
          (uCtx, uBi, math.round(-math.log(p) * 10000))
        }
        Some(id -> ((scored.size.toLong, scored.map(_._1).sum, scored.map(_._2).sum,
          scored.map(_._3).sum, scored.map(_._3).sum / scored.size)))
      }
    }.toMap
    val got = Text.knLm(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected)
    // held-out scoring must exercise the unseen branches at sf0.001
    assert(got.values.map(_._2).sum > 0 || got.values.map(_._3).sum > 0)
  }
}
