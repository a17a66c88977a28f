package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: RESTORE and SQL data skipping at 10× — a 1M-event
  * manifest-log lake with per-file stats+blooms, churned by DV deletes,
  * upserts and an OPTIMIZE, then rewound. The claims under test:
  *  - restoreLake is METADATA-ONLY (wall time independent of data
  *    volume — set reconciliation + one log record, no data I/O);
  *  - the post-restore snapshot reads the re-added files at normal
  *    scan cost;
  *  - a pushed point predicate through the SQL catalog prunes the file
  *    list via min/max + blooms before parquet opens a footer (wall
  *    time ≪ the unbounded scan on a multi-file lake). */
object RestoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.lake.{Catalog, Layout}

    val root = s"/tmp/restore-scale-${System.nanoTime()}"
    val lay = Layout(root)
    val base = graft.Events.events(spark, sfDir).select(
      col("event_type").as("source"), col("event_id"), col("user_id"),
      floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))
    DevTiming.time("rscale")("seed commit (1M rows, stats+bloom on event_id)")(
      Catalog.commitLake(spark, lay, base,
        statsCols = Seq("event_id"), bloomCols = Seq("event_id")))
    val v1 = Catalog.headVersion(spark, lay)

    // churn: 3 rounds of DV delete + upsert, then an OPTIMIZE
    (1 to 3).foreach { i =>
      DevTiming.time("rscale")(s"churn delete rep$i")(
        Catalog.deleteLakeWhere(spark, lay, col("event_id") % 1000 === i))
      DevTiming.time("rscale")(s"churn upsert rep$i")(
        Catalog.upsertLakeByKey(spark, lay,
          base.filter(col("event_id") % 500 === i)
            .withColumn("cents", col("cents") + i),
          Seq("event_id")))
    }
    DevTiming.time("rscale")("optimize")(Catalog.optimizeLake(spark, lay))
    val preFiles = Catalog.lakeFilesAsOf(spark, lay).size
    val atV1 = Catalog.lakeFilesAsOf(spark, lay, v1).size

    var seq = -1L
    DevTiming.time("rscale")(
      s"RESTORE to v$v1 (metadata-only; live $preFiles files -> $atV1)")(
      { seq = Catalog.restoreLake(spark, lay, v1); seq })
    println(s"[rscale] restore committed seq=$seq")
    DevTiming.time("rscale")("post-restore snapshot agg")(
      println("  " + Catalog.loadLakeSnapshot(spark, lay)
        .agg(sum("cents"), count(lit(1))).collect().mkString))

    // un-restore (forward) — same metadata-only cost profile
    DevTiming.time("rscale")("un-restore to pre-rewind head")(
      Catalog.restoreLake(spark, lay, seq - 1))

    // RENAME at 10×: the commit is metadata-only; the claim to measure
    // is the READ cost of the mapped path (old files' physical name
    // coalesced onto the new logical one) vs the unmapped baseline
    DevTiming.time("rscale")("pre-rename snapshot agg (baseline)")(
      println("  " + Catalog.loadLakeSnapshot(spark, lay)
        .agg(sum("cents"), count(lit(1))).collect().mkString))
    DevTiming.time("rscale")("RENAME COLUMN cents -> amount_c (metadata-only)")(
      Catalog.commitLakeRenameColumn(spark, lay, "cents", "amount_c"))
    // a post-rename batch: the lake now spans two name epochs
    Catalog.commitLake(spark, lay,
      base.filter(col("event_id") % 1000 === 7)
        .withColumnRenamed("cents", "amount_c"))
    (1 to 2).foreach { i =>
      DevTiming.time("rscale")(s"mapped snapshot agg over 2 name epochs rep$i")(
        println("  " + Catalog.loadLakeSnapshot(spark, lay)
          .agg(sum("amount_c"), count(lit(1))).collect().mkString))
    }

    // SQL data skipping at 10×, both index shapes:
    //  - BLOOM lake: commits by event_id MODULO, so every file's
    //    min/max spans the whole key space (min/max can never prune a
    //    point) and only the committed blooms separate files;
    //  - RANGE lake: commits by event_id STRIDE, so min/max alone
    //    prunes range and point predicates.
    val bounds = base.agg(min("event_id"), max("event_id")).head
    val (loId, hiId) = (bounds.getLong(0), bounds.getLong(1))
    val stride = (hiId - loId) / 10 + 1
    def buildSkipLake(name: String, assign: Int => org.apache.spark.sql.Column):
        String = {
      val r = s"/tmp/$name-${System.nanoTime()}"
      val l = Layout(r)
      (0 until 10).foreach { b =>
        Catalog.commitLake(spark, l, base.filter(assign(b)).repartition(1),
          statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
      }
      val cat = name
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sql.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", r)
      // warm the snapshot plan memo (schema derivation reads footers
      // once — the precondition a live planner meets)
      spark.sql(s"SELECT count(*) FROM $cat.lake").collect()
      cat
    }
    val bloomCat = DevTiming.time("rscale")(
      "bloom lake: 10 modulo stats+bloom commits")(
      buildSkipLake("skipbloom", b => col("event_id") % 10 === b))
    val rangeCat = DevTiming.time("rscale")(
      "range lake: 10 strided stats commits")(
      buildSkipLake("skiprange",
        b => col("event_id") >= loId + b * stride &&
          col("event_id") < loId + (b + 1) * stride))

    DevTiming.time("rscale")("SQL unbounded agg (reads all 10 files)")(
      println("  " + spark.sql(
        s"SELECT count(*) AS n, sum(cents) AS s FROM $bloomCat.lake")
        .collect().mkString))
    val probeId = loId + (hiId - loId) / 3
    (1 to 3).foreach { i =>
      DevTiming.time("rscale")(
        s"SQL point query, BLOOM prune (overlapping min/max) rep$i")(
        println("  " + spark.sql(
          s"SELECT count(*) AS n FROM $bloomCat.lake WHERE event_id = $probeId")
          .collect().mkString))
    }
    (1 to 3).foreach { i =>
      DevTiming.time("rscale")(s"SQL point query, MIN/MAX prune rep$i")(
        println("  " + spark.sql(
          s"SELECT count(*) AS n FROM $rangeCat.lake WHERE event_id = $probeId")
          .collect().mkString))
    }
    DevTiming.time("rscale")("SQL range query, MIN/MAX prune (1 stride)")(
      println("  " + spark.sql(
        s"SELECT count(*) AS n FROM $rangeCat.lake WHERE event_id >= $loId " +
          s"AND event_id < ${loId + stride}").collect().mkString))
    spark.stop()
  }
}
