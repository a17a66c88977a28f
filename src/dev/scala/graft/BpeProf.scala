package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: replace-chain vs native rank-greedy BPE application, at
  * the pinned 32-rule vocab and at a padded 10k-rule vocab (the
  * replace chain cannot express the latter — its expression tree
  * would be 10k string rewrites deep). Not part of the library
  * surface. */
object BpeProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val words = Tables.documents(spark, sfDir)
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("word"))
    words.cache().count()
    val padded = ops.Bpe.merges ++ (0 until 10000).map(i => (s"${i}#", s"#${i}"))
    (1 to 3).foreach { rep =>
      DevTiming.time("bpeprof")(s"chain32 rep$rep")(
        words.select(sum(ops.Bpe.tokenCountCol(col("word")))).collect())
      DevTiming.time("bpeprof")(s"native32 rep$rep")(
        words.select(sum(size(functions.TextFunctions.bpe_tokens(col("word"), ops.Bpe.merges))))
          .collect())
      DevTiming.time("bpeprof")(s"native10k rep$rep")(
        words.select(sum(size(functions.TextFunctions.bpe_tokens(col("word"), padded))))
          .collect())
    }
    spark.stop()
  }
}
