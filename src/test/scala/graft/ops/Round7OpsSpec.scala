package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-7 operators: byte-level FastCDC (gear hash, normalized
  * min/normal/max chunking) and the weighted multi-touch attribution
  * family (position-decay, U-shaped). */
class Round7OpsSpec extends SparkTestBase {

  private def synthText(words: Int): String = {
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash")
    val rnd = new scala.util.Random(7)
    Array.fill(words)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
  }

  test("cdcBytes: native expression == declarative HOF fold == JVM reference " +
      "on single-byte text; native is byte-defined on multibyte input") {
    val s = spark
    import s.implicits._
    val texts = Seq((1L, "src", synthText(120)), (2L, "src", synthText(40)),
      (3L, "src", "tiny"), (4L, "src", synthText(300)))
    val docs = texts.toDF("doc_id", "source", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("len"), r.getAs[Long]("fp")))
      .sorted.toSeq
    assert(rows(Dedup.byteChunksOf(docs)) == rows(Dedup.byteChunksDeclarative(docs)),
      "the native expression and the aggregate-lambda fold must chunk identically")
    // JVM reference fold agrees too (three representations, one definition)
    val ref = texts.flatMap { case (id, _, t) =>
      graft.functions.FastCdc.chunkBytes(t.getBytes("UTF-8")).map(c => (id, c._1, c._2))
    }.sorted
    assert(rows(Dedup.byteChunksOf(docs)) == ref)
    // multibyte input: native chunks the UTF-8 BYTES (total len = byte count)
    val multi = Seq((9L, "src", "héllo wörld " * 30)).toDF("doc_id", "source", "text")
    val total = Dedup.byteChunksOf(multi).agg(sum(col("len"))).collect().head.getLong(0)
    assert(total == ("héllo wörld " * 30).getBytes("UTF-8").length.toLong)
    // and the SQL registry exposes it
    graft.functions.GraftExtensions.register(spark)
    multi.createOrReplaceTempView("cdc_multi")
    assert(spark.sql("SELECT size(fastcdc_chunks(text)) FROM cdc_multi")
      .collect().head.getInt(0) > 0)
  }

  test("simhash: native one-loop fingerprint == declarative explode+agg, " +
      "field for field, on the real corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    Seq(1, 4, 6).foreach { nBands =>
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (0 until df.columns.length).map(r.getLong).toSeq).sortBy(_.head).toSeq
      assert(rows(Dedup.simhashFieldsOf(docs, nBands)) ==
        rows(Dedup.simhashFieldsDeclarative(docs, nBands)),
        s"nBands=$nBands: the native expression must reproduce the md5-slice " +
          "signed-bit-sum fingerprint exactly")
    }
  }

  test("winnowing: native one-loop selection == declarative window minimum, " +
      "key set for key set; density respects the 2/(w+1) regime") {
    val docs = graft.Tables.documents(spark, sfDir)
    val native = docs
      .select(col("doc_id"), explode(graft.functions.WinnowKeys.of(
        split(col("text"), " "), 4, 4)).as("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val decl = Text.winnowKeysDeclarative(docs, 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(native == decl,
      "the native selector must reproduce the window-min selection exactly")
    // selection density: winnowing guarantees >= 1/w and ~2/(w+1)
    val nGrams = docs.select(sum(greatest(size(split(col("text"), " ")) - 3, lit(0))))
      .collect().head.getLong(0)
    val density = native.size.toDouble / nGrams
    assert(density >= 1.0 / 4 - 0.05 && density <= 0.75,
      s"selected ${native.size} of $nGrams grams (density $density)")
  }

  test("cdcBytes: chunk lengths obey the min/normal/max normalization bounds") {
    val out = Dedup.cdcBytes(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("max_len") <= 256L,
        s"forced cut at maxLen must bound every chunk: $r")
      assert(r.getAs[Long]("n_chunks") >= r.getAs[Long]("n_distinct_chunks"))
      val ppm = r.getAs[Long]("shared_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
    }
    // chunk lengths reconstruct the byte count exactly (nothing dropped)
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "src", synthText(150))).toDF("doc_id", "source", "text")
    val chunks = Dedup.byteChunksOf(docs).collect()
    assert(chunks.map(_.getAs[Long]("len")).sum ==
      docs.head.getString(2).length.toLong)
  }

  test("cdcBytes: content-defined re-synchronization — a one-byte insert " +
      "shifts a bounded prefix of chunks, never the whole stream") {
    val s = spark
    import s.implicits._
    val t = synthText(200)
    val docs = Seq((1L, "src", t), (2L, "src", "Z" + t))
      .toDF("doc_id", "source", "text")
    val byDoc = Dedup.byteChunksOf(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("len"), r.getAs[Long]("fp"))).toSeq)
      .toMap
    val (a, b) = (byDoc(1L), byDoc(2L))
    // (fixed-width chunking would shift EVERY block after the insert)
    var k = 0
    while (k < math.min(a.length, b.length) && a(a.length - 1 - k) == b(b.length - 1 - k))
      k += 1
    assert(a.length >= 5, s"need several chunks to prove the property: ${a.length}")
    assert(k >= a.length - 3,
      s"cut points must re-synchronize after the edit: ${a.length} chunks, only $k shared")
    // determinism: identical text chunks identically
    val again = Dedup.byteChunksOf(Seq((3L, "src", t)).toDF("doc_id", "source", "text"))
      .collect().map(r => (r.getAs[Long]("len"), r.getAs[Long]("fp"))).toSeq
    assert(again == a)
  }

  test("weighted multi-touch: decay halves per day, U-shape is exactly 40/20/40, " +
      "and conservation holds for every rule") {
    import graft.streaming.StreamMultiTouch._
    val day = 86400000000L
    // touches at ages 3, 1, 0 days before a purchase at t = 3 days
    val touches = List(("view", 0L, 1L), ("click", 2L * day, 2L), ("cart", 3L * day - 1, 3L))
    assert(weightsFor(Decay, touches, 3L * day) == List(16L, 64L, 128L),
      "2^(7-age): age 3 -> 16, age 1 -> 64, age 0 -> 128")
    assert(weightsFor(Linear, touches, 3L * day) == List(1L, 1L, 1L))
    assert(weightsFor(UShaped, touches, 3L * day) == List(2L, 1L, 2L),
      "n=3: first/last 2*(n-2)=2, middle 1 -> 40/20/40")
    val five = List(("a", 1L, 1L), ("b", 2L, 2L), ("c", 3L, 3L), ("d", 4L, 4L),
      ("e", 5L, 5L))
    val w5 = weightsFor(UShaped, five, 10L)
    assert(w5 == List(6L, 1L, 1L, 1L, 6L))
    assert(w5.head.toDouble / w5.sum == 0.4, "first touch takes exactly 40%")
    // conservation through the fold for each rule (odd cents, odd weights)
    Seq(Linear, Decay, UShaped).foreach { rule =>
      val st = org.apache.spark.sql.streaming.TestGroupState.create[TouchWindow](
        org.apache.spark.api.java.Optional.empty[TouchWindow](),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
        0L, org.apache.spark.api.java.Optional.empty[Long](), false)
      val credits = onKey(7L * day, rule)(1L, Iterator(
        Ev(1L, 1L, "view", 0L, 0L), Ev(1L, 2L, "click", 2L * day, 0L),
        Ev(1L, 3L, "cart", 3L * day - 1, 0L),
        Ev(1L, 4L, "purchase", 3L * day, 101L)), st).toSeq
      assert(credits.map(_.creditE6).sum == 101000000L,
        s"$rule must conserve cents*1e6 exactly")
    }
  }

  test("SQL text surface: corpus and lake views answer spark.sql verbatim") {
    // the oracle-gated text itself
    val df = graft.Views.nationOrders(spark, sfDir)
    assert(df.columns.toSeq == Seq("nation", "n_orders", "sum_cents"))
    assert(df.count() == 25)
    // ad-hoc follow-up text over the registered views
    val n = spark.sql("SELECT count(*) AS n FROM documents WHERE n_chars > 100")
      .collect().head.getLong(0)
    assert(n > 0)
    // lake surfaces: ingest a batch, query catalog + committed
    // distribution through SQL
    val layout = graft.lake.Layout(tmpDir("views-lake"))
    val s = spark
    import s.implicits._
    val batch = Seq(("clicks", "k1", """{"v":1}"""), ("clicks", "k1", """{"v":2}"""))
      .toDF("source", "key", "json")
    graft.streaming.StreamIngest.processBatch(batch, layout, 1704067200000L, 1L)
    graft.Views.registerLake(spark, layout, Seq("clicks"))
    assert(spark.sql("SELECT count(*) AS n FROM dist_clicks").collect().head.getLong(0) == 2L)
    assert(spark.sql(
      "SELECT source, count(*) AS n FROM lake_catalog GROUP BY source ORDER BY source")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("clicks", 1L)))
  }

  test("blocklist filter: one explode per phrase LENGTH (never per phrase), " +
      "broadcast list join, exact token-aligned hits") {
    val df = Pipeline.blocklistFilter(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty, "the demonstration blocklist must hit this corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") >= r.getAs[Long]("n_docs"))
      val ppm = r.getAs[Long]("hit_docs_ppm")
      assert(ppm > 0L && ppm <= 1000000L)
    }
    // plan shape: one generator per distinct phrase length (2 and 3),
    // cost independent of phrase count
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Generate explode".r.findAllIn(p).length <= 2,
      s"per-phrase scans would show more generators:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the phrase list must broadcast:\n$p")
    // exact token alignment on crafted docs: fused tokens and broken
    // phrases never match; aligned ones do
    val s2 = spark
    import s2.implicits._
    val crafted = Seq(
      (1L, "s", "x key agg y"),        // "key agg" aligned -> hit
      (2L, "s", "x keyagg y"),         // fused token -> no hit
      (3L, "s", "big order scan end"), // 3-gram hit
      (4L, "s", "big order x scan"))   // broken 3-gram -> no hit
      .toDF("doc_id", "source", "text")
    val hitDocs = Pipeline.blocklistHitsOf(spark, crafted,
        Seq("key agg", "big order scan"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("phrase")))
      .sorted.toSeq
    assert(hitDocs == Seq((1L, "key agg"), (3L, "big order scan")), hitDocs.toString)
  }

  test("vocabCoverage: coverage is monotone in K, saturates at the full vocab, " +
      "and covered+oov partitions the corpus") {
    val rows = Text.vocabCoverage(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(rows.length == 5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2, s"coverage must be monotone in K: $a vs $b")
    }
    val nVocab = graft.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
      .select(countDistinct(col("t"))).collect().head.getLong(0)
    val total = graft.Tables.documents(spark, sfDir)
      .select(sum(size(split(col("text"), " ")))).collect().head.getLong(0)
    rows.filter(_._1 >= nVocab).foreach { r =>
      assert(r._2 == total, s"K >= |V| must cover every token: $r")
      assert(r._3 == 1000000L && r._4 == 0L)
    }
    rows.foreach { r =>
      assert(r._3 + r._4 <= 1000000L && r._3 + r._4 >= 999998L,
        s"covered+oov ppm must partition the corpus (truncation <= 2): $r")
    }
  }

  test("batch decay/U-shape credit totals conserve the full purchase volume") {
    val totalPurchaseE6 = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("long") * 1000000L))
      .collect().head.getLong(0)
    Seq(Behavior.multiTouchDecay(spark, sfDir), Behavior.multiTouchUShape(spark, sfDir),
        Behavior.multiTouch(spark, sfDir)).foreach { df =>
      val total = df.agg(sum(col("sum_credit_e6"))).collect().head.getLong(0)
      assert(total == totalPurchaseE6,
        "every purchase's value must be fully attributed, never created or lost")
    }
  }
}
