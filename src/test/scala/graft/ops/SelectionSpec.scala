package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariant + JVM-replay tests for the data-selection surface
  * (`ops/Selection.scala`, `Similarity.hardNegatives`). Engine-vs-
  * oracle parity is the driver gate's job; these pin the semantics a
  * green hash can't express: exact-budget apportionment, driver-side
  * replays of the integer-nats arithmetic, and the two-phase top-k
  * rewrite against brute force.
  */
class SelectionSpec extends SparkTestBase {

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** Spark round() semantics: HALF_UP away from zero. */
  private def roundTmn(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 10000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  private lazy val docs: Seq[(Long, String, String)] =
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  // ---------------- dsirWeights ----------------

  test("dsirWeights matches a driver-side replay and favors the target source") {
    val buckets = 512
    val bucketOf = (tok: String) =>
      java.lang.Long.parseLong(md5Hex(tok).take(8), 16) % buckets
    val toks = docs.flatMap { case (id, src, text) =>
      text.split(" ", -1).map(t => (id, src, bucketOf(t))) }
    val cT = toks.filter(_._2 == "src0").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cR = toks.filter(_._2 != "src0").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val (tt, tr) = (cT.values.sum, cR.values.sum)
    val llr = (0L until buckets).map { b =>
      b -> roundTmn(math.log((cT.getOrElse(b, 0L) + 1.0) / (tt + buckets)) -
        math.log((cR.getOrElse(b, 0L) + 1.0) / (tr + buckets)))
    }.toMap
    val docW = toks.groupBy(t => (t._1, t._2))
      .view.mapValues(_.map(t => llr(t._3)).sum).toMap
    val expect = docW.groupBy(_._1._2).map { case (src, m) =>
      val ws = m.values.toSeq
      (src, (m.size.toLong, ws.sum, ws.min, ws.max, ws.count(_ > 0).toLong))
    }
    val got = Selection.dsirWeights(spark, sfDir).collect().map { r =>
      (r.getAs[String]("source"),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_w_tmn"),
          r.getAs[Long]("min_w_tmn"), r.getAs[Long]("max_w_tmn"),
          r.getAs[Long]("n_target_like")))
    }.toMap
    assert(got == expect)
    // the LLR is trained ON src0: its PER-TOKEN mean weight must top
    // every other source (per-doc means are confounded by doc length)
    val tokCount = toks.groupBy(_._2).view.mapValues(_.size.toLong)
    val perTok = got.map { case (src, (_, sum, _, _, _)) =>
      src -> sum.toDouble / tokCount(src) }
    assert(perTok.maxBy(_._2)._1 == "src0")
  }

  test("dsir model is dense: unseen-bucket tokens score the smoothed ratio, not zero") {
    import spark.implicits._
    val corpus = graft.Tables.documents(spark, sfDir)
    val llr = Selection.dsirLlrTable(corpus, "src0")
    val model = llr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every one of the 512 buckets carries a score — including those
    // no training token hashed to
    assert(model.size == 512)
    // an out-of-vocabulary doc still gets the exact model sum
    val oov = Seq((999L, "zzqx9 wvvk7 zzqx9")).toDF("doc_id", "text")
    val got = Selection.dsirDocWeights(oov, llr).collect()
    assert(got.length == 1)
    val bucketOf = (tok: String) =>
      java.lang.Long.parseLong(md5Hex(tok).take(8), 16) % 512
    val expect = Seq("zzqx9", "wvvk7", "zzqx9").map(t => model(bucketOf(t))).sum
    assert(got.head.getAs[Long]("w_tmn") == expect)
  }

  // ---------------- proportionalAlloc ----------------

  test("proportionalAlloc hits the budget exactly with quota in {base, base+1}") {
    val rows = Selection.proportionalAlloc(spark, sfDir, budget = 1000).collect()
    assert(rows.map(_.getAs[Long]("quota")).sum == 1000L)
    rows.foreach { r =>
      val extra = r.getAs[Long]("extra")
      assert(extra == 0L || extra == 1L)
      assert(r.getAs[Long]("quota") == r.getAs[Long]("base_quota") + extra)
    }
    // proportionality: base quotas ordered with token mass
    val byTok = rows.sortBy(_.getAs[Long]("src_tokens"))
    assert(byTok.map(_.getAs[Long]("base_quota")).toSeq ==
      byTok.map(_.getAs[Long]("base_quota")).sortBy(identity).toSeq)
    // a budget no source can fill fractionally still sums exactly
    assert(Selection.proportionalAlloc(spark, sfDir, budget = 7).collect()
      .map(_.getAs[Long]("quota")).sum == 7L)
  }

  // ---------------- temperatureMix ----------------

  test("temperatureMix hits the budget exactly and flattens the proportional plan") {
    val temp = Selection.temperatureMix(spark, sfDir, budget = 1000, alpha = 0.7)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("quota")).toMap
    assert(temp.values.sum == 1000L)
    val prop = Selection.proportionalAlloc(spark, sfDir, budget = 1000)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("quota")).toMap
    // α < 1 damps the spread: the temperature plan's range is no wider
    assert(temp.values.max - temp.values.min <= prop.values.max - prop.values.min)
    // α = 1 degenerates to (within rounding of the 1e4-scaled weight)
    // the proportional plan
    val flat = Selection.temperatureMix(spark, sfDir, budget = 1000, alpha = 1.0)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("quota")).toMap
    flat.foreach { case (s, q) => assert(math.abs(q - prop(s)) <= 1L) }
  }

  // ---------------- exactSample ----------------

  test("exactSample keeps exactly the quota-smallest hashes per source") {
    val alloc = Selection.proportionalAlloc(spark, sfDir, budget = 1000).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("quota")).toMap
    val expect = docs.groupBy(_._2).map { case (src, g) =>
      val ranked = g.map { case (id, _, text) =>
        (java.lang.Long.parseLong(md5Hex(s"sample:$id").take(8), 16), id,
          text.split(" ", -1).length.toLong)
      }.sortBy(t => (t._1, t._2)).take(alloc(src).toInt)
      src -> (math.min(alloc(src), g.size.toLong), ranked.map(_._3).sum,
        ranked.map(_._2 % 1000003L).sum)
    }.filter(_._2._1 > 0)
    val got = Selection.exactSample(spark, sfDir).collect().map { r =>
      r.getAs[String]("source") ->
        (r.getAs[Long]("kept_docs"), r.getAs[Long]("kept_tokens"),
          r.getAs[Long]("id_check"))
    }.toMap
    assert(got == expect)
  }

  // ---------------- weightedMedian ----------------

  test("weightedMedian matches brute force on both weightings") {
    val lens = docs.map { case (_, src, text) => (src, text.split(" ", -1).length.toLong) }
    def medianBy(vals: Seq[(Long, Long)]): Long = { // (len, weight), sorted
      val tot = vals.map(_._2).sum
      var cum = 0L
      vals.sortBy(_._1).collectFirst {
        case (len, w) if { cum += w; cum * 2 >= tot } => len
      }.get
    }
    val expect = lens.groupBy(_._1).view.mapValues { g =>
      val ls = g.map(_._2)
      (medianBy(ls.groupBy(identity).view.mapValues(_.size.toLong).toSeq),
        medianBy(ls.groupBy(identity).view.mapValues(v => v.head * v.size).toSeq))
    }.toMap
    val got = Selection.weightedMedian(spark, sfDir).collect().map { r =>
      r.getAs[String]("source") ->
        (r.getAs[Long]("median_len"), r.getAs[Long]("token_weighted_median_len"))
    }.toMap
    assert(got == expect)
  }

  // ---------------- lengthDrift ----------------

  test("lengthDrift matches a brute-force scaled-integer KS replay") {
    val lens = docs.map { case (_, src, text) => (src, text.split(" ", -1).length.toLong) }
    val bySrc = lens.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val support = lens.map(_._2).distinct.sorted
    def cdfPpm(src: String): Map[Long, Long] = {
      val vals = bySrc(src).sorted
      val n = vals.size.toLong
      support.map(x => x -> vals.count(_ <= x).toLong * 1000000L / n).toMap
    }
    val cdfs = bySrc.keys.map(s => s -> cdfPpm(s)).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val expect = (for {
      a <- srcs; b <- srcs if a < b
    } yield (a, b) -> support.map(x => math.abs(cdfs(a)(x) - cdfs(b)(x))).max).toMap
    val got = Selection.lengthDrift(spark, sfDir).collect().map { r =>
      (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("ks_d_ppm")
    }.toMap
    assert(got == expect)
    assert(got.size == srcs.size * (srcs.size - 1) / 2)
    // D is a ppm-scaled statistic in [0, 1e6]
    got.values.foreach(d => assert(d >= 0 && d <= 1000000L))
  }

  // ---------------- ngramDiversity ----------------

  test("ngramDiversity counts distinct/total grams like a driver replay") {
    val expect = docs.groupBy(_._2).view.mapValues { g =>
      val tokss = g.map(_._3.split(" ", -1).toSeq)
      val unis = tokss.flatten
      val tris = tokss.flatMap(t => t.sliding(3).filter(_.size == 3).map(_.mkString(" ")))
      (unis.size.toLong, unis.distinct.size.toLong,
        tris.size.toLong, tris.distinct.size.toLong)
    }.toMap
    val got = Selection.ngramDiversity(spark, sfDir).collect().map { r =>
      r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("distinct_tokens"),
          r.getAs[Long]("n_3grams"), r.getAs[Long]("distinct_3grams"))
    }.toMap
    assert(got == expect)
    Selection.ngramDiversity(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("distinct_tokens") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("tri_ttr_ppm") <= 1000000L)
    }
  }

  // ---------------- charEntropy ----------------

  test("charEntropy matches the per-doc integer-nats replay") {
    val expect = docs.filter(_._3.nonEmpty).map { case (id, _, text) =>
      val n = text.length.toLong
      val ent = text.groupBy(identity).values.map { g =>
        val c = g.length.toLong
        c * roundTmn(math.log(n.toDouble / c))
      }.sum / n
      id -> (n, ent)
    }.toMap
    val got = Selection.charEntropy(spark, sfDir).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars_counted"), r.getAs[Long]("ent_tmn"))
    }.toMap
    assert(got == expect)
    // entropy of n distinct chars is ln(n): bounded by ln of doc length
    got.foreach { case (_, (n, ent)) =>
      assert(ent >= 0 && ent <= roundTmn(math.log(n.toDouble)))
    }
  }

  // ---------------- prefixDup ----------------

  test("uniMaxAlloc equals an ITERATIVE waterfilling replay; conservation " +
      "and cap-respect hold; both branches live") {
    val rows = Selection.uniMaxAlloc(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("src_tokens"),
        r.getAs[Long]("cap_tokens"), r.getAs[Boolean]("capped"),
        r.getAs[Long]("alloc_tokens")))
    assert(rows.exists(_._4) && rows.exists(!_._4),
      s"both capped and uncapped sources must exist: ${rows.toSeq}")
    val total = rows.map(_._2).sum
    val b = total * 19 / 10
    assert(rows.map(_._5).sum == math.min(b, rows.map(_._3).sum),
      "the allocation must spend the budget exactly (or hit every cap)")
    rows.foreach { case (src, _, cap, _, alloc) =>
      assert(alloc <= cap, s"$src allocated past its epoch cap") }
    // iterative waterfilling reference: repeatedly give every
    // unfinalized source the equal share; finalize those whose cap is
    // below it; stop when none caps
    var remaining = rows.sortBy(r => (r._3, r._1)).toList
    var budget = b
    val fin = scala.collection.mutable.Map.empty[String, Long]
    var changed = true
    while (changed && remaining.nonEmpty) {
      val share = budget / remaining.size
      val (capped, open) = remaining.partition(_._3 <= share)
      changed = capped.nonEmpty
      capped.foreach { r => fin(r._1) = r._3; budget -= r._3 }
      remaining = open
      if (!changed) {
        val q = budget / remaining.size
        val r0 = budget % remaining.size
        remaining.zipWithIndex.foreach { case (r, j) =>
          fin(r._1) = q + (if (j < r0) 1L else 0L) }
        remaining = Nil
      }
    }
    if (remaining.isEmpty && fin.size < rows.length)
      rows.foreach(r => fin.getOrElseUpdate(r._1, r._3))
    rows.foreach { case (src, _, _, _, alloc) =>
      assert(fin(src) == alloc,
        s"$src: query $alloc != iterative waterfilling ${fin(src)}") }
  }

  test("prefixDup matches a driver replay of corpus-wide head cohorts") {
    val heads = docs.map { case (id, src, text) =>
      (id, src, md5Hex(text.split(" ", -1).take(8).mkString(" "))) }
    val cohort = heads.groupBy(_._3).view.mapValues(_.size).toMap
    val expect = heads.groupBy(_._2).view.mapValues { g =>
      val dup = g.count(h => cohort(h._3) > 1).toLong
      (g.size.toLong, dup,
        g.filter(h => cohort(h._3) > 1).map(_._3).distinct.size.toLong,
        dup * 1000000L / g.size)
    }.toMap
    val got = Selection.prefixDup(spark, sfDir).collect().map { r =>
      r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("dup_head_docs"),
          r.getAs[Long]("dup_head_groups"), r.getAs[Long]("dup_head_ppm"))
    }.toMap
    assert(got == expect)
  }

  // ---------------- lengthQualityGrid ----------------

  test("lengthQualityGrid is a partition of the corpus consistent with qualityScore") {
    val grid = Selection.lengthQualityGrid(spark, sfDir).collect()
    val nDocs = docs.size.toLong
    val nToks = docs.map(_._3.split(" ", -1).length.toLong).sum
    assert(grid.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(grid.map(_.getAs[Long]("sum_tokens")).sum == nToks)
    grid.foreach { r =>
      val b = r.getAs[Long]("len_band"); val d = r.getAs[Long]("decile")
      assert(b >= 0 && b <= 7 && d >= 0 && d <= 9)
    }
    // marginal over len_band must equal the qualityScore histogram
    // (same decile predicate, different grouping)
    val byDecile = grid.groupBy(_.getAs[Long]("decile"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val hist = Text.qualityScore(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("decile"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(byDecile == hist)
  }

  // ---------------- crossSplitDups ----------------

  test("crossSplitDups partitions the shared pair table with canonical labels") {
    val m = Pipeline.crossSplitDups(spark, sfDir).collect()
    val rank = Map("train" -> 0, "val" -> 1, "test" -> 2)
    m.foreach { r =>
      assert(rank(r.getAs[String]("split_a")) <= rank(r.getAs[String]("split_b")))
    }
    val totalPairs = Dedup.nearDupPairTable(spark, sfDir).count()
    assert(m.map(_.getAs[Long]("n_pairs")).sum == totalPairs)
  }

  // ---------------- centroidSim ----------------

  test("centroidSim matches a replay from the rounded centroid table") {
    val cent = Similarity.labelCentroids(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("pos"),
        math.round(r.getAs[Double]("m") * 10000)))
    val byLabel = cent.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    def round4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
    val labels = byLabel.keys.toSeq.sorted
    val expect = (for {
      a <- labels; b <- labels if a < b
      va = byLabel(a); vb = byLabel(b)
      dot = va.zip(vb).map { case (x, y) => x * y }.sum
      na = va.map(x => x * x).sum; nb = vb.map(x => x * x).sum
    } yield (a, b) -> round4(dot / math.sqrt(na.toDouble * nb))).toMap
    val got = Similarity.centroidSim(spark, sfDir).collect().map { r =>
      (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) -> r.getAs[Double]("cos_sim")
    }.toMap
    assert(got.size == labels.size * (labels.size - 1) / 2)
    assert(got == expect)
    got.values.foreach(c => assert(c >= -1.0001 && c <= 1.0001))
  }

  // ---------------- hardNegatives ----------------

  test("hardNegatives two-phase top-k equals brute force, labels always differ") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def round4(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP)
        .doubleValue() + 0.0
    val expect = emb.filter(_._1 < 5).flatMap { case (qid, qlab, qv) =>
      emb.filter(_._2 != qlab)
        .map { case (vid, lab, v) => (vid, lab, round4(cos(v, qv))) }
        .filter(!_._3.isNaN)
        .sortBy { case (vid, _, c) => (-c, vid) }
        .take(3).zipWithIndex
        .map { case ((vid, lab, c), i) => (qid, vid, lab, c, i + 1L) }
    }.toSeq
    val got = Similarity.hardNegatives(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Double]("cos_sim"), r.getAs[Long]("rnk"))
    }.toSeq
    assert(got.sortBy(r => (r._1, r._5)) == expect.sortBy(r => (r._1, r._5)))
    val labels = emb.map(e => e._1 -> e._2).toMap
    got.foreach { case (qid, vid, lab, _, _) =>
      assert(lab != labels(qid) && vid != qid)
    }
  }
}
