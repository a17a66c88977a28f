package graft

import org.apache.spark.sql.SparkSession

/** Dev-only stage timer for the IVF-PQ index build + probe. Not part
  * of the library surface. */
object PqProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = DevTiming.time("pqprof")(name)(f)
    t("warmup")(spark.range(1000000).selectExpr("sum(id)").collect())
    val emb = Tables.embeddings(spark, sfDir)
    t("corpus count")(println("n=" + emb.count()))
    t("coarse assign (ivfAssign)")(ops.Similarity.ivfAssign(spark, sfDir).count())
    t("ivfpq full build")(ops.Pq.buildIvfPqIndex(spark, sfDir))
    t("ivfpq probe (warm index)")(ops.Pq.ivfPqTopK(spark, sfDir).count())
    t("pq codebooks build")(ops.Pq.buildCodebooks(spark, sfDir))
    t("pq probe (warm)")(ops.Pq.pqTopK(spark, sfDir).count())
    spark.stop()
  }
}
