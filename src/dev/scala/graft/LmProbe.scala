package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate which stage of the q_lm_score plan pays the cold
  * first-run cost (scan / explode / agg / join). Not library surface. */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    DevTiming.time("lmprobe")("warmup")(spark.range(1000000).selectExpr("sum(id)").collect())
    val docs = Tables.documents(spark, sfDir)
    DevTiming.time("lmprobe")("scan docs")(docs.count())
    val t = split(col("text"), " ")
    DevTiming.time("lmprobe")("explode tokens")(
      docs.select(explode(t).as("w1")).count())
    DevTiming.time("lmprobe")("uni agg")(
      docs.select(explode(t).as("w1")).groupBy("w1").count().count())
    val bigrams = docs.select(col("doc_id"),
      explode(zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (x, y) => concat(x, lit(" "), y))).as("bg"))
    DevTiming.time("lmprobe")("bigram explode")(bigrams.count())
    DevTiming.time("lmprobe")("bigram agg")(bigrams.groupBy("bg").count().count())
    DevTiming.time("lmprobe")("full lm_score")(
      SparkEntry.queries("q_lm_score")(spark, sfDir).count())
    DevTiming.time("lmprobe")("full lm_score rep2")(
      SparkEntry.queries("q_lm_score")(spark, sfDir).count())
    spark.stop()
  }
}
