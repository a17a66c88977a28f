package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: merge cost at 10× — a CDC-sized batch merged into a
  * 1M-event manifest-log lake, vs the equi-key upsert it generalizes.
  * The claims under test: the source broadcasts (no lake shuffle), the
  * commit is O(batch + matched rows), and repeated merges do not
  * degrade (DV accumulation is bounded by merged rows, not versions).
  */
object MergeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.lake.{Catalog, Layout, Merge}

    val root = s"/tmp/merge-scale-${System.nanoTime()}"
    val lay = Layout(root)
    val base = graft.Events.events(spark, sfDir).select(
      col("event_type").as("source"), col("event_id"), col("user_id"),
      floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))
    DevTiming.time("mscale")("seed commit (1M rows)")(
      Catalog.commitLake(spark, lay, base))

    // CDC batch: ~10k updates (event_id % 100 == 7) + 1k inserts
    val updates = base.filter(col("event_id") % 100 === 7)
      .withColumn("cents", col("cents") + 1)
    val inserts = base.filter(col("event_id") % 1000 === 3)
      .withColumn("event_id", col("event_id") + lit(2000000000L))
    val batch = updates.unionByName(inserts)
    println(s"[mscale] batch rows = ${batch.count()}")

    (1 to 3).foreach { i =>
      DevTiming.time("mscale")(s"mergeIntoLake rep$i")(
        Merge.mergeIntoLake(spark, lay,
          batch.withColumn("cents", col("cents") + i),
          on = col("t.event_id") === col("s.event_id"),
          matched = Seq(Merge.Update(None, Map("cents" -> col("s.cents")))),
          notMatched = Seq(Merge.Insert(None, Map(
            "source" -> col("s.source"), "event_id" -> col("s.event_id"),
            "user_id" -> col("s.user_id"), "cents" -> col("s.cents"))))))
    }
    (1 to 3).foreach { i =>
      DevTiming.time("mscale")(s"upsertLakeByKey rep$i")(
        Catalog.upsertLakeByKey(spark, lay,
          batch.withColumn("cents", col("cents") + 10 + i), Seq("event_id")))
    }
    DevTiming.time("mscale")("post-merge snapshot agg")(
      Catalog.loadLakeSnapshot(spark, lay)
        .agg(sum("cents"), count(lit(1))).collect())

    // ---- round 12: DYNAMIC FILE PRUNING before/after ----
    // The win case is a RANGE-LOCAL batch (the partition-correction
    // shape): a chunked lake with per-file event_id stats vs the same
    // chunks without stats, merged with an update-only batch touching
    // ONE chunk. (A mixed batch with far-out insert keys spans the
    // whole key range and prunes nothing — documented limit.)
    // disjoint ranges per chunk: re-key so chunk i owns its own band.
    // 50 chunks x sources = many hundreds of files, the shape a
    // streaming-ingested lake actually has, where the match scan pays
    // file listing + footer opens per file - exactly what the prune
    // removes. (At 10 big files the scan is 0.2 s of a 2.4 s verb and
    // prune == no-prune; measured, recorded in BASELINE.)
    val chunks = 50
    def chunkedSeedRanged(statsCols: Seq[String]): Layout = {
      val l = Layout(s"/tmp/merge-dfpr-${statsCols.size}-${System.nanoTime()}")
      (0 until chunks).foreach { i =>
        Catalog.commitLake(spark, l,
          base.filter(col("event_id") % chunks === i)
            .withColumn("event_id",
              col("event_id") + lit(i.toLong * 50000000L)),
          statsCols = statsCols)
      }
      l
    }
    val withStats = chunkedSeedRanged(Seq("event_id"))
    val noStats = chunkedSeedRanged(Seq.empty)
    println(s"[mscale] files per lake = " +
      s"${Catalog.lakeFilesAsOf(spark, withStats).size}, pruned to " +
      s"${Catalog.lakeFilesOverlapping(spark, withStats, "event_id",
        0L, 10000000L).size} by a chunk-0 range")
    // ids = 0 (mod chunks*10) are = 0 (mod chunks): all in chunk 0
    val localBatch = base.filter(col("event_id") % (chunks * 10) === 0)
      .withColumn("cents", col("cents") + 1)
    println(s"[mscale] range-local batch rows = ${localBatch.count()}")
    (1 to 3).foreach { i =>
      DevTiming.time("mscale")(s"merge PRUNED (stats lake) rep$i")(
        Merge.mergeIntoLake(spark, withStats,
          localBatch.withColumn("cents", col("cents") + i),
          on = col("t.event_id") === col("s.event_id"),
          matched = Seq(Merge.Update(None, Map("cents" -> col("s.cents"))))))
    }
    (1 to 3).foreach { i =>
      DevTiming.time("mscale")(s"merge UNPRUNED (stat-less lake) rep$i")(
        Merge.mergeIntoLake(spark, noStats,
          localBatch.withColumn("cents", col("cents") + i),
          on = col("t.event_id") === col("s.event_id"),
          matched = Seq(Merge.Update(None, Map("cents" -> col("s.cents"))))))
    }
    spark.stop()
  }
}
