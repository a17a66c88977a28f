package graft.ops

import graft.{SparkTestBase, Tables}
import java.math.{BigDecimal => JBD, RoundingMode}

/** Driver-side exact replays for the round-6 session-3 operators:
  * centroid silhouette and hybrid reciprocal-rank fusion. Each test
  * re-derives the full answer in plain Scala (HALF_UP rounding to
  * match Spark's `round`), independent of Spark SQL and DuckDB. */
class Round6Session3Spec extends SparkTestBase {

  private def r4(x: Double): Double =
    new JBD(x).setScale(4, RoundingMode.HALF_UP).doubleValue
  private def rl(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def embRows = Tables.embeddings(spark, sfDir).collect().map { r =>
    (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
      r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
  }.sortBy(_._1)

  test("silhouette == plain-Scala centroid-silhouette replay") {
    val rows = embRows
    val dim = rows.head._3.length
    // centroid component means in vec_id order, rounded 4 dp, e4-scaled
    val cent: Map[Int, Array[Long]] = rows.groupBy(_._2).map { case (label, rs) =>
      label -> Array.tabulate(dim) { p =>
        val mean = rs.map(_._3(p).toDouble).sum / rs.size
        rl(r4(mean) * 10000)
      }
    }
    val sils = rows.flatMap { case (_, label, emb) =>
      val iv = emb.map(v => rl(v.toDouble * 10000))
      val nv = iv.map(x => x * x).sum
      val cosines = cent.flatMap { case (lc, im) =>
        val nc = im.map(x => x * x).sum
        if (nv > 0 && nc > 0) {
          val dot = iv.zip(im).map { case (a, b) => a * b }.sum
          Some(lc -> r4(dot / math.sqrt(nv.toDouble * nc)))
        } else None
      }
      val own = cosines.get(label)
      val others = cosines.collect { case (lc, c) if lc != label => c }
      (own, if (others.isEmpty) None else Some(others.max)) match {
        case (Some(co), Some(ct)) =>
          val denom = math.max(1.0 - co, 1.0 - ct)
          val s = if (denom == 0.0) 0.0 else (co - ct) / denom
          Some(label -> rl(s * 10000))
        case _ => None
      }
    }
    val expected = sils.groupBy(_._1).map { case (label, ss) =>
      val vals = ss.map(_._2)
      label -> ((vals.length.toLong, vals.sum,
        rl(vals.sum.toDouble / vals.length), vals.count(_ < 0).toLong))
    }
    val got = Similarity.silhouette(spark, sfDir).collect().map { r =>
      r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("sum_s_e4"),
          r.getAs[Long]("mean_s_e4"), r.getAs[Long]("n_neg")))
    }.toMap
    assert(got == expected)
    assert(got.values.map(_._1).sum == rows.length.toLong,
      "every vector with a valid own+other cosine must be counted exactly once")
  }

  test("hybridRrf == plain-Scala RRF over the two shortlists") {
    val kRrf = 60; val shortlist = 50; val k = 20
    // lexical shortlist from the oracle-proven BM25 query
    val lex = Text.bm25(spark, sfDir, Text.Bm25Terms, shortlist).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bm25_e4")))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    // dense shortlist: sequential-fold cosine (the native expression's
    // exact loop), 4 dp, top-50 by (cos desc, vec_id)
    val rows = embRows
    val q = rows.find(_._1 == 0L).get._3
    val dense = rows.flatMap { case (id, _, emb) =>
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < emb.length) {
        val a = emb(i).toDouble; val b = q(i).toDouble
        dot += a * b; nx += a * a; ny += b * b; i += 1
      }
      val c = r4(dot / (math.sqrt(nx) * math.sqrt(ny)))
      if (c.isNaN) None else Some((id, c))
    }.sortBy { case (id, c) => (-c, id) }
      .take(shortlist)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val expected = (lex.keySet ++ dense.keySet).toSeq.map { id =>
      val rrf = lex.get(id).map(r => 1.0 / (kRrf + r)).getOrElse(0.0) +
        dense.get(id).map(r => 1.0 / (kRrf + r)).getOrElse(0.0)
      (id, lex.get(id), dense.get(id), rl(rrf * 1000000))
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(k)
    val got = Similarity.hybridRrf(spark, sfDir, kRrf, shortlist, k).collect().map { r =>
      (r.getAs[Long]("doc_id"),
        Option(r.getAs[java.lang.Long]("r_lex")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("r_dense")).map(_.toLong),
        r.getAs[Long]("rrf_e6"))
    }.toSeq
    assert(got == expected)
    // a doc present in both lists beats the same ranks in either alone
    assert(got.exists(g => g._2.isDefined && g._3.isDefined) ||
      lex.keySet.intersect(dense.keySet).isEmpty)
  }

  test("ndcg: probe-everything limit is EXACTLY 1.0; pruned probe stays in (0, 1]") {
    // nprobe >= centroid count => candidates == whole corpus => the
    // system ranking IS the exact ranking => nDCG must be exactly 1e6
    val all = Similarity.ndcg(spark, sfDir, nprobe = 1000).collect()
    assert(all.nonEmpty)
    all.foreach { r =>
      assert(r.getAs[Long]("ndcg_ppm") == 1000000L,
        s"probe-everything must be exact: $r")
      assert(r.getAs[Long]("n_hits") == r.getAs[Long]("n_ret"))
      assert(r.getAs[Long]("dcg_e6") == r.getAs[Long]("idcg_e6"))
    }
    // the real prune: DCG can only lose vs IDCG, never exceed it
    val pruned = Similarity.ndcg(spark, sfDir, nprobe = 2).collect()
    assert(pruned.length == all.length)
    pruned.foreach { r =>
      val (d, i, n) = (r.getAs[Long]("dcg_e6"), r.getAs[Long]("idcg_e6"),
        r.getAs[Long]("ndcg_ppm"))
      assert(d >= 0 && d <= i, s"DCG must be within [0, IDCG]: $r")
      assert(n >= 0 && n <= 1000000L, s"nDCG ppm out of range: $r")
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_ret"))
    }
  }

  test("joinCardEst == plain-Scala key-sample estimator; m=1 row IS the exact size") {
    val counts = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.col("user_id"))
      .count().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("count"))).toMap
    val exact = counts.values.map(c => c * c).sum
    val expected = Seq(1, 2, 5, 10).map { m =>
      val sampled = counts.filter { case (u, _) => u % m == 1 % m }
      val est = sampled.values.map(c => c * c).sum * m
      (m.toLong, sampled.size.toLong, est,
        rl((est - exact) * 1000000.0 / exact))
    }
    val got = Skew.joinCardEst(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("m"), r.getAs[Long]("n_keys_sampled"),
        r.getAs[Long]("est_rows"), r.getAs[Long]("err_ppm"))
    }.toSeq
    assert(got == expected)
    val m1 = got.find(_._1 == 1L).get
    assert(m1._3 == exact && m1._4 == 0L, "the m=1 row is the exact self-check")
  }

  test("cdcChunks: an inserted token disturbs O(1) chunks (the CDC shift property)") {
    val s = spark
    import s.implicits._
    val words = (0 until 400).map(i => s"w${i % 97}")
    val original = words.mkString(" ")
    // insert one token near the front — fixed-width blocks would shift
    // EVERY later block; content-defined boundaries must re-align
    val edited = (words.take(5) ++ Seq("INSERTED") ++ words.drop(5)).mkString(" ")
    val docs = Seq((1L, "s", original), (2L, "s", edited))
      .toDF("doc_id", "source", "text")
    val fps = Dedup.chunkFingerprintsOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("fp")))
    val f1 = fps.filter(_._1 == 1L).map(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val f2 = fps.filter(_._1 == 2L).map(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val shared = (f1.keySet intersect f2.keySet)
      .toSeq.map(k => math.min(f1(k), f2(k))).sum
    val total1 = f1.values.sum
    assert(total1 > 5, s"the doc must chunk into several pieces (got $total1)")
    assert(total1 - shared <= 2,
      s"at most the edited chunk (and a merge neighbor) may differ: " +
        s"$total1 chunks, $shared shared")
  }

  test("buildPairTable: committed artifact == direct derivation; idempotent; corpus-keyed") {
    val dir1 = Dedup.buildPairTable(spark, sfDir)
    assert(new java.io.File(s"$dir1/_SUCCESS").exists(), "artifact must be committed")
    val direct = Dedup.lshNearDupPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fromArtifact = spark.read.parquet(dir1).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(fromArtifact == direct)
    // idempotent: second build returns the same committed dir untouched
    val m1 = new java.io.File(s"$dir1/_SUCCESS").lastModified()
    assert(Dedup.buildPairTable(spark, sfDir) == dir1)
    assert(new java.io.File(s"$dir1/_SUCCESS").lastModified() == m1,
      "a warm artifact must not rebuild")
    // a different corpus keys a different artifact dir
    val dir2 = Dedup.buildPairTable(spark, "/root/testdata/sf0.01")
    assert(dir2 != dir1, "corpus fingerprint must separate corpora")
  }

  test("approxQuantileAcc: sketch stays inside the rank band; quantiles monotone") {
    val got = Aggregates.approxQuantileAcc(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      Seq("ok_p50", "ok_p90", "ok_p99").foreach(c =>
        assert(r.getAs[Boolean](c), s"sketch out of band: $r"))
      val (p50, p90, p99) = (r.getAs[Double]("p50"), r.getAs[Double]("p90"),
        r.getAs[Double]("p99"))
      assert(p50 <= p90 && p90 <= p99, s"quantiles must be monotone: $r")
    }
  }

  test("dedupMethodAgreement == set algebra over the two pair queries") {
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = pairsOf(Dedup.lshNearDupPairs(spark, sfDir))
    val sim = pairsOf(Dedup.simhashNearDup(spark, sfDir))
    val union = lsh ++ sim
    val r = Dedup.dedupMethodAgreement(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_lsh") == lsh.size.toLong)
    assert(r.getAs[Long]("n_simhash") == sim.size.toLong)
    assert(r.getAs[Long]("n_both") == (lsh intersect sim).size.toLong)
    assert(r.getAs[Long]("n_union") == union.size.toLong)
    if (union.nonEmpty)
      assert(r.getAs[Long]("agreement_ppm") ==
        rl((lsh intersect sim).size * 1000000.0 / union.size))
    assert(union.nonEmpty, "the corpus must exercise both detectors")
  }

  test("attribution == plain-Scala carry-forward replay") {
    val lookbackUs = 7L * 86400 * 1000000
    val raw = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("us"), r.getAs[String]("event_type"), r.getAs[Long]("cents")))
    val attributed = raw.groupBy(_._1).toSeq.flatMap { case (user, evs) =>
      var lastTouch: Option[(String, Long)] = None
      evs.sortBy(e => (e._3, e._2)).flatMap { case (_, _, us, tpe, cents) =>
        if (tpe != "purchase") { lastTouch = Some((tpe, us)); None }
        else {
          val ch = lastTouch match {
            case Some((t, tus)) if us - tus <= lookbackUs => t
            case _ => "direct"
          }
          Some((ch, user, cents))
        }
      }
    }
    val expected = attributed.groupBy(_._1).map { case (ch, rs) =>
      ch -> ((rs.size.toLong, rs.map(_._2).distinct.size.toLong, rs.map(_._3).sum))
    }
    val got = Behavior.attribution(spark, sfDir).collect().map { r =>
      r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_purchases"), r.getAs[Long]("n_users"),
          r.getAs[Long]("sum_cents")))
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("multiTouch == plain-Scala split replay; credits conserve cents exactly") {
    val lookbackUs = 7L * 86400 * 1000000
    val raw = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("us"), r.getAs[String]("event_type"), r.getAs[Long]("cents")))
    val byUser = raw.groupBy(_._1)
    val credits = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def add(ch: String, c: Long): Unit = {
      val (n, s) = credits.getOrElse(ch, (0L, 0L)); credits(ch) = (n + 1, s + c)
    }
    raw.filter(_._4 == "purchase").foreach { case (u, _, pus, _, cents) =>
      val touches = byUser(u)
        .filter(e => e._4 != "purchase" && e._3 < pus && pus - e._3 <= lookbackUs)
      if (touches.isEmpty) add("direct", cents * 1000000L)
      else {
        val n = touches.length
        val base = cents * 1000000L / n
        val rem = cents * 1000000L % n
        val latest = touches.maxBy(e => (e._3, e._2))
        touches.foreach { t =>
          add(t._4, base + (if (t eq latest) rem else 0L))
        }
      }
    }
    val got = Behavior.multiTouch(spark, sfDir).collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_credits"), r.getAs[Long]("sum_credit_e6")))).toMap
    assert(got == credits.toMap)
    // conservation: every purchase's cents land somewhere, exactly
    val totalPurchase = raw.filter(_._4 == "purchase").map(_._5).sum * 1000000L
    assert(got.values.map(_._2).sum == totalPurchase)
  }

  test("incrAggMerge: base+delta partial merge == flat recompute, and cutoff partitions rows") {
    import org.apache.spark.sql.functions._
    val merged = Aggregates.incrAggMerge(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("n_events"), r.getAs[Long]("sum_cents"),
        r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents"))).toSeq
    val flat = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), sum(round(col("value") * 100).cast("long")).as("s"),
        min(round(col("value") * 100).cast("long")).as("mn"),
        max(round(col("value") * 100).cast("long")).as("mx"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("n"), r.getAs[Long]("s"),
        r.getAs[Long]("mn"), r.getAs[Long]("mx"))).toSeq
    assert(merged.sorted == flat.sorted)
    // the cutoff genuinely splits the corpus (both partial legs non-empty)
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val ev = Tables.events(spark, sfDir)
    assert(ev.filter(col("ts") < cutoff).count() > 0)
    assert(ev.filter(col("ts") >= cutoff).count() > 0)
  }
}
