package graft

import org.apache.spark.sql.SparkSession

/** Dev-only broadcast-threshold × AQE sweep over the join-heavy
  * queries at SPARK_GRAFT_SF_DIR — records how the unhinted plans
  * respond to the two knobs that govern join strategy at scale
  * (results in BASELINE.md). Both are runtime-settable session confs,
  * so one JVM sweeps all configs; each block re-runs the same queries
  * twice and reports the second (warm) rep. Not part of the library
  * surface. */
object TuneSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val joinQueries = Seq(
      "q_local_supplier_volume", "q_join_agg_topk", "q_join_brand_revenue",
      "q_returned_item_ranking", "q_join_region_balance", "q_sql_subqueries",
      "q_asof_last_order", "q_session_overlap", "q_decontaminate")
    val configs = Seq(
      ("aqe=on bcast=10m", "true", "10485760"),
      ("aqe=on bcast=1m", "true", "1048576"),
      ("aqe=on bcast=off", "true", "-1"),
      ("aqe=off bcast=10m", "false", "10485760"),
      ("aqe=off bcast=off", "false", "-1"))
    configs.foreach { case (label, aqe, thresh) =>
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      var total = 0.0
      joinQueries.foreach { name =>
        val fn = SparkEntry.queries(name)
        fn(spark, sfDir).count() // warm rep
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        total += (System.nanoTime() - t0) / 1e9
      }
      println(f"[tune] $label%-20s total=$total%7.2f s (${joinQueries.length} queries, warm rep)")
    }
    spark.stop()
  }
}
