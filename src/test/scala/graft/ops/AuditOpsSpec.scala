package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariant tests for the round-5 session-3 audit surface:
  * normalization-tier dedup, CCNet perplexity buckets, k-anonymity,
  * the zone-map skipping index, the LSH (bands × rows) tuning table
  * and the IVF recall table. Engine-vs-oracle parity is the driver
  * gate's job; these pin the semantic invariants a green hash can't
  * express (set-inclusion monotonicity, partition-of-corpus,
  * skip-soundness, recall bounds).
  */
class AuditOpsSpec extends SparkTestBase {

  // ---------------- normDedup ----------------

  test("normDedup: raw dups are norm dups; norm_only closes the gap exactly") {
    val rows = Dedup.normDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val raw = r.getAs[Long]("raw_dup_docs")
      val norm = r.getAs[Long]("norm_dup_docs")
      val only = r.getAs[Long]("norm_only_docs")
      // identical text ⇒ identical normalized text, so the raw-dup set
      // is a subset of the norm-dup set and the difference is norm_only
      assert(norm >= raw, s"$r")
      assert(norm == raw + only, s"$r")
      assert(r.getAs[Long]("n_docs") >= norm)
    }
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
  }

  // ---------------- ccnetBuckets ----------------

  test("ccnetBuckets: terciles partition the scored docs, sizes within 1, NLL ranges ordered") {
    val rows = Text.ccnetBuckets(spark, sfDir).collect()
    val scored = graft.Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == scored)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val byBucket = rs.sortBy(_.getAs[Long]("bucket"))
      assert(byBucket.map(_.getAs[Long]("bucket")).toSeq == Seq(0L, 1L, 2L), src)
      val sizes = byBucket.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, s"$src tercile sizes $sizes")
      // buckets are ordered by score: a later bucket's min can equal
      // the previous max only when a tied cell is cut by the boundary
      byBucket.sliding(2).foreach { case Array(lo, hi) =>
        assert(hi.getAs[Long]("min_nll") >= lo.getAs[Long]("max_nll"),
          s"$src bucket ranges overlap")
      }
    }
  }

  // ---------------- kAnonymity ----------------

  test("kAnonymity: driver-side replay of the QI grouping agrees exactly") {
    val rows = Pipeline.kAnonymity(spark, sfDir).collect()
    val cust = graft.Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), col("c_nationkey").cast("long"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySeg = cust.groupBy(_._1)
    rows.foreach { r =>
      val seg = r.getAs[String]("segment")
      val groups = bySeg(seg).groupBy(identity).values.map(_.size.toLong).toSeq
      assert(r.getAs[Long]("n_rows") == groups.sum)
      assert(r.getAs[Long]("n_groups") == groups.size)
      assert(r.getAs[Long]("k_anonymity") == groups.min)
      assert(r.getAs[Long]("small_groups") == groups.count(_ < 5))
      assert(r.getAs[Long]("suppressed_rows") == groups.filter(_ < 5).sum)
    }
  }

  // ---------------- incrAggDelete ----------------

  test("incrAggDelete: both the keep-stored and recompute branches are LIVE " +
      "on this corpus, and the result equals the flat recompute") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("event_id"), round(col("value") * 100).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byGroup = ev.groupBy(t => (t._1, t._2))
    var affected = 0; var safe = 0
    byGroup.foreach { case (_, rows) =>
      val del = rows.filter(_._3 % 97 == 0)
      val kept = rows.filterNot(_._3 % 97 == 0)
      if (del.nonEmpty && kept.nonEmpty) {
        val (mn, mx) = (rows.map(_._4).min, rows.map(_._4).max)
        if (del.map(_._4).min <= mn || del.map(_._4).max >= mx) affected += 1
        else safe += 1
      } else if (del.isEmpty) safe += 1
    }
    assert(affected > 0, "no group's extremum was deleted — recompute branch untested")
    assert(safe > 0, "every group recomputed — the keep-stored branch is untested")
    // and the maintained view equals the flat recompute exactly
    val got = graft.ops.Aggregates.incrAggDelete(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val flat = graft.Tables.events(spark, sfDir)
      .filter(col("event_id") % 97 =!= 0)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(round(col("value") * 100).cast("long")).cast("long").as("sum_cents"),
        min(round(col("value") * 100).cast("long")).cast("long").as("min_cents"),
        max(round(col("value") * 100).cast("long")).cast("long").as("max_cents"))
      .select("event_type", "day", "n_events", "sum_cents", "min_cents", "max_cents")
      .collect().map(_.toString).sorted.toSeq
    assert(got == flat)
  }

  // ---------------- tCloseness ----------------

  test("tCloseness: driver-side exact-TVD replay agrees; t bounds hold") {
    val rows = Pipeline.tCloseness(spark, sfDir).collect()
    val cust = graft.Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long"),
        floor(col("c_acctbal") / 1000).cast("long"), col("c_mktsegment"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nTotal = cust.length.toLong
    val globalSeg = cust.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val byNation = cust.groupBy(_._1)
    rows.foreach { r =>
      val nation = r.getAs[Number]("nation").longValue()
      val groups = byNation(nation).groupBy(_._2)
      val tPpms = groups.toSeq.map { case (_, members) =>
        val nG = members.length.toLong
        val cellCnt = members.groupBy(_._3).view.mapValues(_.length.toLong).toMap
        val distNum = globalSeg.map { case (seg, nSeg) =>
          math.abs(cellCnt.getOrElse(seg, 0L) * nTotal - nSeg * nG)
        }.sum
        nG -> distNum * 1000000L / (2L * nG * nTotal)
      }.toSeq
      assert(r.getAs[Long]("n_rows") == byNation(nation).length.toLong)
      assert(r.getAs[Long]("n_groups") == groups.size.toLong)
      assert(r.getAs[Long]("t_max_ppm") == tPpms.map(_._2).max)
      assert(r.getAs[Long]("weak_groups") == tPpms.count(_._2 > 200000L).toLong)
      assert(r.getAs[Long]("exposed_rows") ==
        tPpms.filter(_._2 > 200000L).map(_._1).sum)
      // TVD is a [0, 1] metric — ppm must stay inside the unit interval
      assert(r.getAs[Long]("t_max_ppm") >= 0 && r.getAs[Long]("t_max_ppm") <= 1000000L)
    }
  }

  // ---------------- zoneMap ----------------

  test("zoneMap: skip decisions are sound and zones cover the table") {
    val rows = EventOps.zoneMap(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("min_ts_ms") <= r.getAs[Long]("max_ts_ms"))
      if (r.getAs[Boolean]("can_skip"))
        assert(r.getAs[Long]("n_match") == 0,
          s"zone ${r.getAs[Long]("zone")} skippable but matches rows")
    }
    val nEvents = graft.Tables.events(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == nEvents)
    // the zone map's matched mass equals the range query it audits
    val inRange = graft.Tables.events(spark, sfDir)
      .filter(col("ts") >= to_timestamp(lit("2024-01-08 00:00:00")) &&
        col("ts") < to_timestamp(lit("2024-01-15 00:00:00"))).count()
    assert(rows.map(_.getAs[Long]("n_match")).sum == inRange)
  }

  // ---------------- lshBandTune ----------------

  test("lshBandTune: candidate monotonicity in (bands, rows) and exact truth recall") {
    val rows = Dedup.lshBandTune(spark, sfDir).collect()
      .map(r => r.getAs[String]("cfg") -> r).toMap
    def cand(c: String) = rows(c).getAs[Long]("n_candidates")
    // more rows per band ⇒ stricter bands ⇒ fewer candidates
    assert(cand("b1r4") <= cand("b1r2"))
    assert(cand("b1r2") <= cand("b1r1"))
    // more bands ⇒ more chances to collide ⇒ more candidates
    assert(cand("b1r1") <= cand("b2r1"))
    assert(cand("b2r1") <= cand("b4r1"))
    assert(cand("b2r2") <= cand("b4r1"))
    // ground truth is b4r1's confirmed set: its recall is 10⁶ by
    // construction, and nobody exceeds it
    assert(rows("b4r1").getAs[Long]("recall_ppm") == 1000000L)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_confirmed") <= r.getAs[Long]("n_candidates"))
      assert(r.getAs[Long]("recall_ppm") <= 1000000L)
      assert(r.getAs[Long]("precision_ppm") <= 1000000L)
    }
  }

  // ---------------- bm25 ----------------

  test("bm25: exact JVM replay of the scoring function on the full corpus") {
    def e4(x: Double): Long =
      java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP)
        .longValue
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = docs.length.toLong
    val sumDl = docs.map(_._2.size.toLong).sum
    val terms = Text.Bm25Terms
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val expected = docs.flatMap { case (id, toks) =>
      val dl = toks.size.toLong
      val scores = terms.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None
        else Some(e4(math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl.toDouble * n) / sumDl)) * 10000))
      }
      if (scores.isEmpty) None
      else Some((id, dl, scores.size.toLong, scores.sum))
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(20).toSeq
    val got = Text.bm25(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dl"),
        r.getAs[Long]("n_hit_terms"), r.getAs[Long]("bm25_e4"))).toSeq
    assert(got == expected)
  }

  // ---------------- mmrRerank ----------------

  test("mmrRerank: distinct picks, relevance-topped, scores non-increasing") {
    val rows = Similarity.mmrRerank(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("rnk")).toSeq == (1L to 5L))
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length)
    // rank 1 is pure relevance — must agree with the exact kNN winner
    val knnTop = Similarity.knnBruteForce(spark, sfDir).collect().head.getAs[Long]("vec_id")
    assert(ids.head == knnTop)
    // from rank 2 on, each winner lost (or tied) against every earlier
    // one under a penalty that only grows with the selected set — the
    // greedy score sequence cannot rise. (Rank 1 carries NO penalty, so
    // rank 2 may legitimately exceed it when pairwise cosines are
    // negative: −3·max_p turns into a bonus.)
    val scores = rows.map(_.getAs[Long]("score_e5"))
    scores.drop(1).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, s"MMR scores rose: ${scores.toSeq}")
      case _ =>
    }
    assert(scores.head == 7 * rows.head.getAs[Long]("qsim_e4"))
  }

  // ---------------- maxSim ----------------

  test("maxSim: score is the exact sum of per-query-token maxima over every label") {
    val rows = Similarity.maxSim(spark, sfDir).collect()
    val labels = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") >= 3).select(col("label")).distinct().count()
    assert(rows.length == labels)
    rows.foreach { r =>
      val ms = (0 until 3).map(i => r.getAs[Long](s"m$i"))
      assert(r.getAs[Long]("maxsim_e4") == ms.sum, s"$r")
      ms.foreach(m => assert(m <= 10000L && m >= -10000L))
    }
    // ranking order is total: descending score, label tiebreak
    val scores = rows.map(r => (r.getAs[Long]("maxsim_e4"), r.getAs[Long]("label")))
    assert(scores.sortBy { case (s2, l) => (-s2, l) }.toSeq == scores.toSeq)
  }

  // ---------------- madOutliers ----------------

  test("madOutliers: exact JVM replay of median, MAD and the modified z flag") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def medianOf(xs: Seq[Long]): Long = {
      // smallest value whose cumulative count reaches half the total —
      // the 2·cum ≥ tot order statistic, NOT midpoint interpolation
      val sorted = xs.sorted; val tot = sorted.size
      sorted.zipWithIndex.collectFirst { case (v, i) if (i + 1) * 2 >= tot => v }.get
    }
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val vs = rows.map(_._2).toSeq
      val m = medianOf(vs)
      val mad = medianOf(vs.map(v => math.abs(v - m)))
      val out = vs.count(v => math.abs(v - m) * 6745 > mad * 35000)
      t -> (vs.size.toLong, m, mad, out.toLong)
    }
    val got = Aggregates.madOutliers(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, m, mad, out) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("median_c") == m, s"median mismatch: $r")
      assert(r.getAs[Long]("mad_c") == mad, s"MAD mismatch: $r")
      assert(r.getAs[Long]("n_outliers") == out, s"outlier count mismatch: $r")
    }
  }

  // ---------------- knnClassify ----------------

  test("knnClassify: eval partition accounting and accuracy bounds hold") {
    val rows = Similarity.knnClassify(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val holdout = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 20 === 0).count()
    assert(rows.map(_.getAs[Long]("n_eval")).sum <= holdout)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_eval"))
      assert(r.getAs[Long]("acc_ppm") <= 1000000L)
    }
  }

  // ---------------- survivalHazard ----------------

  test("survivalHazard: life-table identities hold (at-risk telescopes, censoring caps churn)") {
    val rows = Behavior.survivalHazard(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val users = graft.Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    // at_risk at lifetime 0 is the whole population; it telescopes:
    // at_risk(d) − ending(d) = at_risk(next d)
    val byLt = rows.sortBy(_.getAs[Long]("lifetime"))
    // the shortest observed lifetime's at-risk set is the whole
    // population (reverse cumsum over the complete histogram)
    assert(byLt.head.getAs[Long]("at_risk") == users)
    byLt.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("at_risk") > b.getAs[Long]("at_risk"))
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_churned") <= r.getAs[Long]("at_risk"))
      assert(r.getAs[Long]("hazard_ppm") <= 1000000L)
    }
  }

  // ---------------- ivfRecall ----------------

  test("ivfRecall: recall is bounded and non-decreasing in nprobe") {
    val rows = Similarity.ivfRecall(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ret") <= 10)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_ret"))
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_exact"))
    }
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val byProbe = rs.sortBy(_.getAs[Long]("nprobe")).map(_.getAs[Long]("recall_ppm"))
      byProbe.sliding(2).foreach {
        case Array(lo, hi) => assert(hi >= lo, s"q$q recall decreased: $byProbe")
        case _ =>
      }
    }
  }

  test("ivfPqRecall: defaults bounded; probe-everything limit is EXACT (recall 1e6)") {
    val rows = Pq.ivfPqRecall(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ret") == 10 && r.getAs[Long]("n_exact") == 10)
      val ppm = r.getAs[Long]("recall_ppm")
      assert(ppm >= 0 && ppm <= 1000000, s"recall out of range: $r")
    }
    // nprobe >= all 10 lists and shortlist >= corpus: ADC ordering is
    // irrelevant (everything survives to the exact re-rank), so the PQ
    // probe MUST return the exact top-k — quantization loss only ever
    // comes from the list prune and the shortlist cut
    val exhaustive = Pq.ivfPqRecall(spark, sfDir, nQueries = 3,
      nprobe = 10, shortlist = 500).collect()
    exhaustive.foreach(r =>
      assert(r.getAs[Long]("recall_ppm") == 1000000L, s"limit not exact: $r"))
  }
}
