package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: measure the DSv2 SQL catalog's scan boundary — full-lake
  * aggregate through `spark.sql` over `« catalog ».lake` vs the same
  * aggregate on `Catalog.loadLakeSnapshot` directly. With the
  * `needConversion = false` V1Scan the two should be within noise;
  * the ratio is recorded in BASELINE.md. */
object SqlScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = graft.sql.SqlLake.lakeRoot(spark, sfDir)
    spark.conf.set("spark.sql.catalog.gprobe",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gprobe.root", root)
    val layout = graft.lake.Layout(root)
    DevTiming.time("sqlscan")("warmup")(
      spark.range(1000000).selectExpr("sum(id)").collect())
    // full-width group-by (every column crosses the boundary) + a
    // narrow aggregate (projection-pruned path), both ways
    (1 to reps).foreach { i =>
      DevTiming.time("sqlscan")(s"api-full rep$i")(
        graft.lake.Catalog.loadLakeSnapshot(spark, layout)
          .groupBy("source").agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.sum("cents"),
            org.apache.spark.sql.functions.max("event_id"),
            org.apache.spark.sql.functions.max("user_id")).collect())
      DevTiming.time("sqlscan")(s"sql-full rep$i")(
        spark.sql("SELECT source, count(1), sum(cents), max(event_id), " +
          "max(user_id) FROM gprobe.lake GROUP BY source").collect())
      DevTiming.time("sqlscan")(s"api-narrow rep$i")(
        graft.lake.Catalog.loadLakeSnapshot(spark, layout)
          .agg(org.apache.spark.sql.functions.sum("cents")).collect())
      DevTiming.time("sqlscan")(s"sql-narrow rep$i")(
        spark.sql("SELECT sum(cents) FROM gprobe.lake").collect())
    }
    spark.stop()
  }
}
