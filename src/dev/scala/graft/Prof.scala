package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the library surface): run the
  * expensive queries' stages in isolation at sf0.1 to see where the
  * time goes before optimizing. */
object Prof {
  private def time[T](name: String)(f: => T): T = DevTiming.time("prof")(name)(f)
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    time("warmup")(spark.range(1000000).selectExpr("sum(id)").collect())
    val docs = spark.read.parquet(s"$d/documents.parquet")
    time("docs scan")(docs.count())

    // --- q_lang_id_ngram stages ---
    val bigramsExpr = explode(array_distinct(
      transform(sequence(lit(1), greatest(length(col("text")) - 1, lit(1))),
        i => col("text").substr(i, lit(2)))))
    val dbHof = docs.select(col("doc_id"), col("lang"), bigramsExpr.as("bigram"))
    time("bigrams explode HOF")(dbHof.count())
    val db = docs.select(col("doc_id"), col("lang"),
      explode(functions.TextFunctions.distinct_char_bigrams(col("text"))).as("bigram"))
    time("bigrams explode native")(db.count())
    val ck = time("bigrams localCheckpoint")(db.localCheckpoint())
    time("counts+profiles from ckpt") {
      import org.apache.spark.sql.expressions.Window
      val counts = ck.groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("lang")).orderBy(col("df").desc, col("bigram"))
      counts.withColumn("rk", row_number().over(w)).filter(col("rk") <= 20).count()
    }
    time("full q_lang_id_ngram")(ops.Text.langIdNgram(spark, d).count())

    // --- q_join_agg_topk ---
    time("q_join_agg_topk (AQE, no hint)")(ops.Relational.joinAggTopK(spark, d).count())

    // --- q_simhash_near_dup stages ---
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    time("simhash token explode")(toks.count())
    val hInline = toks.select(col("doc_id") +: (0 until 4).map(m =>
      conv(substring(md5(col("token")), 1 + 4 * m, 4), 16, 10).cast("long").as(s"h$m")): _*)
    time("h0..h3 inline md5 x4?")(hInline.agg(sum(col("h0") + col("h1") + col("h2") + col("h3"))).collect())
    val hShared = toks.withColumn("d", md5(col("token")))
      .select(col("doc_id") +: (0 until 4).map(m =>
        conv(substring(col("d"), 1 + 4 * m, 4), 16, 10).cast("long").as(s"h$m")): _*)
    time("h0..h3 shared md5 col")(hShared.agg(sum(col("h0") + col("h1") + col("h2") + col("h3"))).collect())
    time("full q_simhash_near_dup")(ops.Dedup.simhashNearDup(spark, d).count())

    // --- q_ivf_trained_topk stages ---
    val emb = Tables.embeddings(spark, d)
    time("emb scan")(emb.count())
    time("kmeans train k=8 iters=2")(
      ops.KMeansIvf.trainCentroids(spark, emb, 8, 2).collect())
    time("full q_ivf_trained_topk")(ops.Similarity.ivfTrainedTopK(spark, d).count())
    spark.stop()
  }
}
