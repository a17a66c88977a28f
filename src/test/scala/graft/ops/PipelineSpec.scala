package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------- redactPii ----------------

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Pipeline.redactPii(col("t"))).as[String].head()

  test("redactPii scrubs emails, IPs, and phones with typed placeholders") {
    assert(redact("mail a.b+c@sub.example.org now") == "mail <EMAIL> now")
    assert(redact("host 192.168.0.1 up") == "host <IP> up")
    assert(redact("call 555-0199 today") == "call <PHONE> today")
  }

  test("redactPii handles adjacency, multiples, and ordering") {
    // email is eaten before the IP/phone patterns can chew its digits
    assert(redact("x1@9.9.9.9mail.com y") == "<EMAIL> y")
    assert(redact("a@b.co c@d.io") == "<EMAIL> <EMAIL>")
    assert(redact("10.0.0.1 555-1234") == "<IP> <PHONE>")
  }

  test("redactPii leaves clean and near-miss text untouched") {
    assert(redact("no pii here at all") == "no pii here at all")
    assert(redact("version 1.2.3 at 12-34") == "version 1.2.3 at 12-34")
    assert(redact("") == "")
    // digits embedded in longer runs do not phone-match (\b guards)
    assert(redact("id 1555-12345 x") == "id 1555-12345 x")
  }

  // ---------------- seqPack ----------------

  test("seqPack covers every doc exactly once with contiguous budget-aligned packs") {
    val packs = Pipeline.seqPack(spark, sfDir, budget = 512).collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(packs.map(_.getAs[Long]("n_docs")).sum == docs.length)
    assert(packs.map(_.getAs[Long]("pack_tokens")).sum == docs.map(_._3).sum)
    // within a source: pack ids increase with doc ranges, no overlap
    packs.groupBy(_.getAs[String]("source")).foreach { case (_, ps) =>
      val sorted = ps.sortBy(_.getAs[Long]("pack_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
        case _ =>
      }
      // every pack's START offset is below (pack_id+1)*budget by construction;
      // a pack past the first must have been pushed past pack_id*budget
      val starts = sorted.map(_.getAs[Long]("pack_id"))
      assert(starts.distinct.length == starts.length)
    }
  }

  test("seqPack pack token totals stay near budget except the tail pack") {
    // greedy-by-offset: a pack overshoots by at most one document, so
    // every non-tail pack holds >= 1 doc and starts within its slot
    val packs = Pipeline.seqPack(spark, sfDir, budget = 512).collect()
    assert(packs.forall(_.getAs[Long]("n_docs") >= 1))
  }

  // ---------------- substringOverlap ----------------

  test("seqPackSplit fills every non-tail window to exactly the budget") {
    val B = 512L
    val packs = Pipeline.seqPackSplit(spark, sfDir, budget = B.toInt).collect()
    val bySrc = packs.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("pack_id"))
      // contiguous window ids from 0
      assert(sorted.map(_.getAs[Long]("pack_id")).toSeq ==
        (0L until sorted.length).toSeq)
      // the dense-layout invariant: every window but the last is FULL
      sorted.init.foreach(r => assert(r.getAs[Long]("pack_tokens") == B))
      assert(sorted.last.getAs[Long]("pack_tokens") <= B)
      rows.foreach(r =>
        assert(r.getAs[Long]("n_whole_docs") <= r.getAs[Long]("n_fragments")))
    }
    // fragment accounting: token mass is conserved exactly (both
    // policies lay out the identical concatenation)
    val greedy = Pipeline.seqPack(spark, sfDir, budget = 512).collect()
    assert(packs.map(_.getAs[Long]("pack_tokens")).sum ==
      greedy.map(_.getAs[Long]("pack_tokens")).sum)
  }

  test("substringOverlap pairs genuinely share a verbatim run of the reported length") {
    val rows = Dedup.substringOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty, "synthetic near-dup clusters must surface shared runs")
    val texts = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    // JVM replay: longest common token run via the same diagonal walk
    def longestRun(a: Seq[String], b: Seq[String]): Int = {
      var best = 0
      val prev = scala.collection.mutable.Map[Int, Int]()
      val bPos = b.zipWithIndex.groupMap(_._1)(_._2)
      for (i <- a.indices; j <- bPos.getOrElse(a(i), Nil)) {
        val run = prev.getOrElse((i - 1) * 100000 + (j - 1), 0) + 1
        prev((i * 100000) + j) = run
        best = math.max(best, run)
      }
      best
    }
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val reported = r.getAs[Long]("max_run_tokens")
      val actual = longestRun(texts(a), texts(b))
      // df-capped windows can only SHORTEN a reported run, never inflate
      assert(reported <= actual,
        s"pair ($a,$b): reported $reported > actual longest run $actual")
      assert(reported >= 20)
    }
  }

  // ---------------- sourceMix ----------------

  test("sourceMix keeps everything for under-budget sources and subsamples over-budget ones") {
    val rows = Pipeline.sourceMix(spark, sfDir).collect()
    val budget = rows.head.getAs[Long]("budget")
    rows.foreach { r =>
      val (srcTok, keptDocs, nDocs, keptTok) =
        (r.getAs[Long]("src_tokens"), r.getAs[Long]("kept_docs"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("kept_tokens"))
      assert(keptDocs <= nDocs && keptTok <= srcTok)
      if (srcTok <= budget) assert(keptDocs == nDocs, s"under-budget source must keep all")
    }
    // the mix must actually drop something somewhere iff some source exceeds budget
    val over = rows.filter(r => r.getAs[Long]("src_tokens") > budget)
    if (over.nonEmpty)
      assert(over.map(r => r.getAs[Long]("n_docs") - r.getAs[Long]("kept_docs")).sum >= 0)
  }

  // ---------------- chunkWindows ----------------

  test("chunkWindows covers every token with the documented overlap") {
    val rows = Pipeline.chunkWindows(spark, sfDir, win = 128, stride = 96).collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length)
    // replay the closed form per doc
    val expChunks = docs.map { case (_, n) =>
      if (n <= 128) 1L else (n - 128 + 95) / 96 + 1
    }.sum
    assert(rows.map(_.getAs[Long]("total_chunks")).sum == expChunks)
    // chunk token sum >= corpus tokens (overlap re-counts, never drops)
    assert(rows.map(_.getAs[Long]("sum_chunk_tokens")).sum >= docs.map(_._2).sum)
  }

  // ---------------- gapFill ----------------

  test("gapFill emits a dense 60-minute grid per selected user with carried values") {
    val rows = EventOps.gapFill(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      assert(u % 97 == 3)
      assert(rs.length == 60, s"user $u grid must be 60 minutes")
      val sorted = rs.sortBy(_.getAs[Long]("minute_ms"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("minute_ms") - a.getAs[Long]("minute_ms") == 60000L)
        case _ =>
      }
      // first minute holds the user's first event; fill never goes null after it
      assert(sorted.head.getAs[Long]("n_events") >= 1)
      assert(sorted.forall(!_.isNullAt(3)))
      // empty minutes carry the previous filled value forward
      sorted.sliding(2).foreach {
        case Array(a, b) if b.getAs[Long]("n_events") == 0 =>
          assert(b.getAs[Double]("filled_value") == a.getAs[Double]("filled_value"))
        case _ =>
      }
    }
  }

  // ---------------- saltedEventStats ----------------

  test("saltedEventStats equals the plain single-phase aggregation") {
    val salted = Skew.saltedEventStats(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val plain = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000).cast("long")).as("s"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("sourceMix keep decision matches an independent per-doc replay") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val budget = bySrc.values.sum / bySrc.size
    def uPpm(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val expected = docs.groupBy(_._1).view.mapValues { ds =>
      ds.count(d => uPpm(d._2) * bySrc(d._1) < budget * 1000000L).toLong
    }.toMap
    val got = Pipeline.sourceMix(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("kept_docs")).toMap
    assert(got == expected)
  }

  test("packEfficiency buckets partition the corpus and account every pad token") {
    val rows = Pipeline.packEfficiency(spark, sfDir).collect()
    val caps = rows.map(_.getAs[Long]("bucket_cap"))
    assert(caps.toSet.subsetOf(Set(16L, 32L, 64L, 128L, 256L)))
    assert(caps.sorted.sameElements(caps), "buckets must come out ordered")
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val cap = r.getAs[Long]("bucket_cap"); val n = r.getAs[Long]("n_docs")
      val tok = r.getAs[Long]("sum_tokens"); val pad = r.getAs[Long]("pad_tokens")
      assert(tok + pad == cap * n, s"bucket $cap: padded stream must be cap*n")
      assert(r.getAs[Long]("waste_bp") == pad * 10000 / (cap * n))
      assert(pad >= 0 && tok >= n, s"bucket $cap: token bounds")
    }
  }

  test("curationFunnel: stage accounting is monotone and consistent with its components") {
    val rows = Pipeline.curationFunnel(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("raw", "quality", "exact_dedup", "near_dedup", "decontaminated"))
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a },
      s"doc counts must be non-increasing: ${docs.toSeq}")
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a },
      s"token counts must be non-increasing: ${toks.toSeq}")
    // stage 0 is the raw corpus
    assert(docs(0) == graft.Tables.documents(spark, sfDir).count())
    // the quality cut equals the number of docs under the decile bar
    val lowQ = graft.Tables.documents(spark, sfDir)
      .select(Text.qualityDecile.as("d")).filter(col("d") < 2).count()
    assert(docs(0) - docs(1) == lowQ)
    assert(docs.last > 0, "a functional pipeline must keep SOMETHING")
  }
}
