package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: component timing for the incremental near-dup warm path. */
object IncrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    println(s"[incr] batch rows = ${batch.count()}")
    (1 to 3).foreach { i =>
      DevTiming.time("incr")(s"bandIndexOf(batch) rep$i")(
        graft.ops.Dedup.bandIndexOf(batch).count())
      DevTiming.time("incr")(s"full query rep$i")(
        graft.ops.Dedup.incrementalNearDupQuery(spark, sfDir).count())
      DevTiming.time("incr")(s"batch toks rep$i")(
        batch.select(col("doc_id"), array_distinct(split(col("text"), " "))).count())
    }
    spark.stop()
  }
}
