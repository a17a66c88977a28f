package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name%-30s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    time("warmup")(spark.range(1000000).selectExpr("sum(id)").collect())
    val docs = spark.read.parquet(s"$d/documents.parquet")
    time("docs scan")(docs.count())
    val toks = docs.select(col("doc_id"), split(col("text")," ").as("t"))
    time("split only")(toks.select(explode(col("t"))).count())
    val sh = toks.select(col("doc_id"), transform(sequence(lit(1), greatest(size(col("t"))-2, lit(1))),
      i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i+1), element_at(col("t"), i+2))).as("sh"))
    time("shingles via element_at")(sh.select(explode(col("sh"))).count())
    val shRaw = docs.select(col("doc_id"), transform(sequence(lit(1), greatest(size(split(col("text")," "))-2, lit(1))),
      i => concat_ws(" ", element_at(split(col("text")," "), i), element_at(split(col("text")," "), i+1), element_at(split(col("text")," "), i+2))).as("sh"))
    time("shingles inline split")(shRaw.select(explode(col("sh"))).count())
    val ex = shRaw.select(col("doc_id"), explode(col("sh")).as("s"))
    time("explode+4 md5 min agg")(ex.groupBy("doc_id").agg(
      min(md5(concat(lit("0|"),col("s")))), min(md5(concat(lit("1|"),col("s")))),
      min(md5(concat(lit("2|"),col("s")))), min(md5(concat(lit("3|"),col("s"))))).count())
    time("full lsh")(graft.ops.Dedup.lshNearDupPairs(spark, d).count())
    time("event_pairs")(graft.ops.EventOps.eventPairs60s(spark, d).count())
    val ev = Events.events(spark, d)
    time("events scan")(ev.count())
    time("events unix_millis")(ev.select(unix_millis(col("ts"))).agg(sum("unix_millis(ts)")).collect())
    spark.stop()
  }
}
