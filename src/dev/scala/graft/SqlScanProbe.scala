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

    // COMMIT-INTERLEAVED reads: the snapshot-plan memo's claimed win is
    // "footer-merge once per COMMIT, not per statement" — pin it under
    // the realistic pattern of reads interleaved with small appends.
    // Per round: read (memoized), tiny commit (digest moves), read
    // (one rebuild = one distributed footer-merge), read again
    // (memoized). At 100 TB the rebuild cost is the one that scales
    // with file count; the memoized statements must stay flat.
    {
      import org.apache.spark.sql.functions._
      val s2 = spark
      import s2.implicits._
      // a PRIVATE copy of the lake — the shared SqlLake fixture is
      // oracle-gated content and must never gain probe rows
      val iroot = s"/tmp/sqlscan-interleave-${System.nanoTime()}"
      val ilay = graft.lake.Layout(iroot)
      graft.lake.Catalog.commitLake(spark, ilay,
        graft.Events.events(spark, sfDir).select(
          col("event_type").as("source"), col("event_id"), col("user_id"),
          floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents")))
      spark.conf.set("spark.sql.catalog.gprobe2",
        classOf[graft.sql.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.gprobe2.root", iroot)
      (1 to reps).foreach { i =>
        DevTiming.time("sqlscan")(s"interleave warm-read rep$i")(
          spark.sql("SELECT sum(cents) FROM gprobe2.lake").collect())
        DevTiming.time("sqlscan")(s"interleave commit rep$i")(
          graft.lake.Catalog.commitLake(spark, ilay,
            Seq(("probe", 900000000L + i.toLong, 1L, 1L))
              .toDF("source", "event_id", "user_id", "cents")))
        DevTiming.time("sqlscan")(s"interleave rebuild-read rep$i")(
          spark.sql("SELECT sum(cents) FROM gprobe2.lake").collect())
        DevTiming.time("sqlscan")(s"interleave memo-read rep$i")(
          spark.sql("SELECT sum(cents) FROM gprobe2.lake").collect())
      }
    }
    spark.stop()
  }
}
