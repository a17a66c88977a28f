package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only (round 13): does the SQL read path's file skipping hold a
  * further ORDER OF MAGNITUDE of file count? File count is the
  * quantity that actually grows at 100 TB; the round-12 probes showed
  * the merge prune's win at 750 files — this probe rebuilds the same
  * clustered lake at 750 and 7,500 files (stats + bloom declared as
  * table facts) and measures, at each scale:
  *  - point query through bloom + min/max consults vs the unpruned
  *    full-snapshot filter;
  *  - a 1% range query through min/max vs unpruned;
  *  - a CDC-shaped MERGE (10 keys in one narrow range) whose ON
  *    equi-conjunct drives the dynamic file prune;
  * plus the files-kept counts, so BASELINE.md records pruned/unpruned
  * ratios at both scales. */
object FileCountScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s2 = spark
    import s2.implicits._

    val base = graft.Events.events(spark, sfDir).select(
      lit("ev").as("source"), col("event_id"), col("user_id"),
      floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))

    Seq(750, 7500).foreach { nFiles =>
      val tag = s"fcount-$nFiles"
      val root = s"/tmp/fcount-probe-$nFiles-${System.nanoTime()}"
      val layout = graft.lake.Layout(root)
      graft.lake.Catalog.commitLakeAlter(spark, layout, addCols = Seq(
        ("event_id", "BIGINT"), ("user_id", "BIGINT"), ("cents", "BIGINT")))
      graft.lake.Catalog.commitLakeAlter(spark, layout, setProps = Seq(
        graft.lake.Catalog.StatsColsProp -> "event_id",
        graft.lake.Catalog.BloomColsProp -> "user_id"))
      DevTiming.time(tag)(s"build $nFiles clustered files")(
        graft.lake.Catalog.commitLake(spark, layout,
          base.repartitionByRange(nFiles, col("event_id"))
            .sortWithinPartitions(col("event_id"))))
      val live = graft.lake.Catalog.lakeFilesAsOf(spark, layout)
      println(s"[$tag] live files: ${live.size}")

      val bounds = base.agg(min("event_id"), max("event_id")).head
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val pointKey = (lo + hi) / 2
      val rangeLo = lo + (hi - lo) / 2
      val rangeHi = rangeLo + math.max(1L, (hi - lo) / 100)

      // files kept by the skipping index (the ratio BASELINE records)
      val keptPoint = graft.lake.Catalog
        .lakeFilesOverlapping(spark, layout, "event_id", pointKey, pointKey)
      val keptRange = graft.lake.Catalog
        .lakeFilesOverlapping(spark, layout, "event_id", rangeLo, rangeHi)
      println(s"[$tag] point keeps ${keptPoint.size}/${live.size}; " +
        s"range keeps ${keptRange.size}/${live.size}")

      (1 to 3).foreach { i =>
        DevTiming.time(tag)(s"point pruned rep$i")(
          graft.lake.Catalog.loadLakePoint(spark, layout,
            "event_id", pointKey).count())
        DevTiming.time(tag)(s"point unpruned rep$i")(
          graft.lake.Catalog.loadLakeSnapshot(spark, layout)
            .filter(col("event_id") === pointKey).count())
        DevTiming.time(tag)(s"range pruned rep$i")(
          graft.lake.Catalog.loadLakeRange(spark, layout,
            "event_id", rangeLo, rangeHi).count())
        DevTiming.time(tag)(s"range unpruned rep$i")(
          graft.lake.Catalog.loadLakeSnapshot(spark, layout)
            .filter(col("event_id") >= rangeLo && col("event_id") <= rangeHi)
            .count())
      }

      // CDC-shaped merge: 10 keys inside one narrow range — the ON
      // equi-conjunct must bound the match scan to O(keys) files
      val cdc = base.filter(col("event_id").between(rangeLo, rangeLo + 9))
        .limit(10).select(col("source"), col("event_id"),
          col("user_id"), lit(-1L).as("cents"))
      DevTiming.time(tag)("merge CDC-10 (pruned ON)")(
        graft.lake.Merge.mergeIntoLake(spark, layout, cdc,
          on = col("t.event_id") === col("s.event_id") &&
            col("t.user_id") === col("s.user_id"),
          matched = Seq(graft.lake.Merge.Update(None,
            Map("cents" -> col("s.cents"))))))

      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
    }
    spark.stop()
  }
}
