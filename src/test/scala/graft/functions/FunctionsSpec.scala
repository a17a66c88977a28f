package graft.functions

import graft.SparkTestBase
import graft.lake.Envelope
import org.apache.spark.sql.functions._

/** Tests for the function-extension layer: SQL registration of the
  * native expression, the MinHash Aggregator UDAF (vs the relational
  * formulation), and the O1 ingest-envelope codec. */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine_sim callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0f, 2.0f, 3.0f), array(3.0f, 2.0f, 1.0f)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 10.0 / 14.0) < 1e-12)
  }

  test("redact_pii callable from SQL and identical to the DataFrame column") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT redact_pii('mail a@b.co from 10.0.0.1 tel 555-0199 end') AS t")
      .collect()(0).getString(0)
    assert(r == "mail <EMAIL> from <IP> tel <PHONE> end", r)
    val viaColumn = Seq("mail a@b.co from 10.0.0.1 tel 555-0199 end").toDF("x")
      .select(graft.ops.Pipeline.redactPii(org.apache.spark.sql.functions.col("x")))
      .as[String].head()
    assert(r == viaColumn)
  }

  test("cosine_sim propagates a null ELEMENT as null, like the HOF reference") {
    GraftExtensions.register(spark)
    // interpreted and codegen paths both: array(... null ...) has
    // containsNull=true, so the null-element scan is emitted
    val df = spark.sql(
      """SELECT cosine_sim(array(1.0f, CAST(NULL AS FLOAT)), array(1.0f, 2.0f)) AS c,
        |       cosine_sim(array(1.0f, 2.0f), array(1.0f, 2.0f)) AS ok""".stripMargin)
    val r = df.collect()(0)
    assert(r.isNullAt(0))
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    // HOF reference agrees
    val hof = spark.range(1).select(graft.ops.Similarity.cosineHof(
      expr("array(1.0f, CAST(NULL AS FLOAT))"), expr("array(1.0f, 2.0f)")).as("c")).collect()(0)
    assert(hof.isNullAt(0))
  }

  test("MinHashAggregator: NULL shingles skipped, shingle-less group -> NULL signature") {
    val sigCol = udaf(new MinHashAggregator(4))
    val rows = Seq((1L, "a b c"), (1L, null), (2L, null))
      .toDF("doc_id", "shingle")
      .groupBy(col("doc_id")).agg(sigCol(col("shingle")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!rows(1L), "real shingles must produce a signature despite a NULL row")
    assert(rows(2L), "a group with only NULL shingles must sign as NULL (never joins)")
  }

  test("distinct_char_bigrams callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT distinct_char_bigrams('abab') AS b")
      .collect()(0).getSeq[String](0)
    assert(r == Seq("ab", "ba"))
  }

  test("cosine_sim SQL rejects wrong arity and type") {
    GraftExtensions.register(spark)
    intercept[Exception] { spark.sql("SELECT cosine_sim(array(1.0f))").collect() }
    intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0), array(2.0))").collect() // double, not float
    }
  }

  test("MinHashAggregator matches the relational minhash signatures") {
    // same MinHashScheme mixes: compare against Dedup's signatures on
    // a tiny synthetic documents table
    val docs = Seq((0L, "a b c d e"), (1L, "c d e f g")).toDF("doc_id", "text")
    val tmp = tmpDir("agg")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val relational = graft.ops.Dedup.minhashSignatures(spark, tmp).collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    // aggregator over explicitly-built shingles
    val shingled = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(" ")
        t.sliding(3).filter(_.length == 3).map(s => (id, s.mkString(" ")))
      }.toDF("doc_id", "shingle")
    val sigCol = udaf(new MinHashAggregator(4))
    val viaAgg = shingled.groupBy(col("doc_id"))
      .agg(sigCol(col("shingle")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    assert(viaAgg.keySet == relational.keySet)
    viaAgg.foreach { case (id, sig) => assert(sig == relational(id), s"doc $id") }
  }

  test("distinct_char_bigrams == HOF formulation, incl. degenerate inputs") {
    val samples = Seq("hello world", "aaaa", "ab", "a", "", "héllo wörld",
      "the quick brown fox", "ababab", "日本語テキスト")
    val df = samples.toDF("text")
    val hof = array_distinct(
      transform(sequence(lit(1), greatest(length(col("text")) - 1, lit(1))),
        i => col("text").substr(i, lit(2))))
    val rows = df.select(
      TextFunctions.distinct_char_bigrams(col("text")).as("native"),
      hof.as("ref")).collect()
    samples.zip(rows).foreach { case (s, r) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"mismatch for '$s'")
    }
    // null propagates
    val nr = Seq[Option[String]](None).toDF("text")
      .select(TextFunctions.distinct_char_bigrams(col("text"))).collect()(0)
    assert(nr.isNullAt(0))
  }

  test("bigram_profile_best == relational join+window formulation, incl. degenerate inputs") {
    import org.apache.spark.sql.expressions.Window
    // profile 1 shares "bc"/"cd" with profile 0 (>1-profile bigram
    // membership exercises the bitmask fan-out); profile 2 is multibyte
    val profiles = Seq(
      Seq("ab", "bc", "cd"),
      Seq("bc", "cd", "de"),
      Seq("日本", "本語"))
    val samples = Seq(
      "abcd",    // 0 scores 3, 1 scores 2 → 0
      "bcde",    // 0 scores 2, 1 scores 3 → 1
      "bccd",    // both score 2 (bc, cd) → tie to LOWEST index 0
      "日本語",  // multibyte → 2
      "zz",      // no hit → -1
      "z",       // 1-char degenerate → -1
      "",        // empty degenerate → -1
      "héllo")   // multibyte, no hit → -1
    val df = samples.zipWithIndex.map(_.swap).toDF("id", "text")
    val native = df.select(col("id"),
        TextFunctions.bigram_profile_best(col("text"), profiles).as("best"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap

    // relational reference: explode distinct bigrams → join the profile
    // table → count per (doc, profile) → rank-1 on (score DESC, idx ASC);
    // zero-hit docs drop out of the join = -1
    val profDf = profiles.zipWithIndex
      .flatMap { case (bgs, i) => bgs.map(bg => (i, bg)) }.toDF("pidx", "bigram")
    val scores = df
      .select(col("id"), explode(TextFunctions.distinct_char_bigrams(col("text"))).as("bigram"))
      .join(profDf, Seq("bigram"))
      .groupBy(col("id"), col("pidx")).agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col("id")).orderBy(col("score").desc, col("pidx").asc)
    val relational = scores
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap

    samples.indices.foreach { i =>
      assert(native(i) == relational.getOrElse(i, -1),
        s"mismatch for '${samples(i)}': native=${native(i)} relational=${relational.get(i)}")
    }
    // pin the interesting values directly too, so the reference
    // formulation itself can't silently drift
    assert(native(0) == 0 && native(1) == 1 && native(3) == 2)
    assert(native(2) == 0, "equal-score tie must break to the LOWEST profile index")
    assert(Seq(4, 5, 6, 7).forall(native(_) == -1), "zero-hit docs must score -1")
    // NULL text propagates as NULL (UnaryExpression null-safe contract)
    val nr = Seq[Option[String]](None).toDF("text")
      .select(TextFunctions.bigram_profile_best(col("text"), profiles)).collect()(0)
    assert(nr.isNullAt(0))
  }

  test("envelope wrap/unwrap round-trips payload and stream name") {
    val payloads = Seq(
      ("clicks", """{"click_id":1,"page":"/home"}"""),
      ("tweets", """{"tweet_id":2,"text":"héllo \"quoted\" }{ tricky"}"""))
      .toDF("stream", "body")
    val wrapped = payloads.select(col("stream"), col("body"),
      Envelope.wrap(col("body"), col("stream")).as("env"))
    // envelope shape matches the reference template: Record.Data is base64
    val shape = wrapped.select(
      get_json_object(col("env"), "$.DeliveryStreamName").as("s"),
      get_json_object(col("env"), "$.Record.Data").as("d")).collect()
    assert(shape.forall(r => r.getString(1) != null && !r.getString(1).contains("{")))

    val (src, body) = Envelope.unwrap(col("env"))
    val back = wrapped.select(col("stream"), col("body"), src.as("src2"), body.as("body2"))
      .collect()
    back.foreach { r =>
      assert(r.getString(0) == r.getString(2))
      assert(r.getString(1) == r.getString(3))
    }
  }
}
