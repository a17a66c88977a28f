package graft
import org.apache.spark.sql.SparkSession

/** Dev-only per-query timer: run the named SparkEntry queries (all if
  * no names given) `SPARK_GRAFT_REPS` times each at
  * `SPARK_GRAFT_SF_DIR`, printing every rep — repetition separates
  * plan cost from first-touch scan noise, which the single-shot Bench
  * can't do. Not part of the library surface. */
object QProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    DevTiming.time("qprof")("warmup")(spark.range(1000000).selectExpr("sum(id)").collect())
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        DevTiming.time("qprof")(s"$name rep$i")(fn(spark, sfDir).count())
        ops.Truncate.release() // same between-query hygiene as Bench
      }
    }
    spark.stop()
  }
}
