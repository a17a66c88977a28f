package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only (round 14): the DRIVER-side cost of the manifest-log
  * parse at 100-TB file counts. 100 TB / 128 MB files ≈ 8·10⁵ live
  * files; a fold carries one `L` line and one `FS` (stats) line per
  * file, so the checkpoint is the dominant driver-side object — this
  * probe synthesizes folds at 10⁵ and 10⁶ file facts (realistic line
  * shapes, real `#end` terminator, 32-commit live tail) and measures
  * what every cold reader pays:
  *
  *  - cold `readLog` (checkpoint parse + tail) wall time,
  *  - warm re-read (the digest-keyed memo hit),
  *  - re-fold (`checkpoint` reads the old fold + tail, writes the
  *    superseding one) + prune,
  *  - approximate retained heap of the parsed state.
  *
  * Numbers land in BASELINE.md round-14; the honest bound they
  * document: the log layer is O(live files) driver memory and parse
  * time per COLD read (amortized by the memo for warm readers), the
  * same contract as Delta's driver-side snapshot state. */
object LogScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def build(n: Int): graft.lake.Layout = {
      val root = Files.createTempDirectory(s"logscale-$n").toString
      val log = Paths.get(s"$root/catalog/_log")
      Files.createDirectories(log)
      val cp = log.resolve(f"$n%020d.checkpoint")
      val w = Files.newBufferedWriter(cp)
      var lines = 0L
      try {
        var i = 1
        while (i <= n) {
          // one live file per committed seq — the steady-state shape
          w.write(f"L $i%d source=ev/c$i%020d-part-00000-$i%08x.parquet\n")
          lines += 1
          i += 1
        }
        i = 1
        while (i <= n) {
          // one declared-stats fact per file (~the event_id/user_id
          // min-max + nulls JSON a TBLPROPERTIES table records)
          w.write(f"FS $i%d source=ev/c$i%020d-part-00000-$i%08x.parquet " +
            s"""{"event_id":{"min":${i * 100},"max":${i * 100 + 99},""" +
            s""""nulls":0},"user_id":{"min":1,"max":60000,"nulls":3}}""" + "\n")
          lines += 1
          i += 1
        }
        w.write(s"#end $lines\n")
      } finally w.close()
      (n + 1 to n + 32).foreach { s =>
        Files.write(log.resolve(f"$s%020d.commit"),
          (s"v2 -1 ${1700000000000L + s}\nlake u$s\n" +
            f"source=ev/c$s%020d-part-00000-live.parquet").getBytes("UTF-8"))
        Files.write(log.resolve(f"$s%020d.done"), Array.emptyByteArray)
      }
      graft.lake.Layout(root)
    }

    def heapMb(): Double = {
      System.gc(); Thread.sleep(100); System.gc()
      (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1e6
    }

    args.headOption.map(_.split(',').map(_.toInt).toSeq)
      .getOrElse(Seq(100000, 1000000)).foreach { n =>
      val layout = build(n)
      val h0 = heapMb()
      val t0 = System.nanoTime()
      val head = graft.lake.Catalog.headVersion(spark, layout)
      val cold = (System.nanoTime() - t0) / 1e6
      val h1 = heapMb()
      val t1 = System.nanoTime()
      graft.lake.Catalog.headVersion(spark, layout)
      val warm = (System.nanoTime() - t1) / 1e6
      val files = {
        val t = System.nanoTime()
        val k = graft.lake.Catalog.lakeFilesAsOf(spark, layout).size
        (k, (System.nanoTime() - t) / 1e6)
      }
      val t2 = System.nanoTime()
      val folded = graft.lake.Catalog.checkpoint(spark, layout)
      val fold = (System.nanoTime() - t2) / 1e6
      val t3 = System.nanoTime()
      val pruned = graft.lake.Catalog.pruneLog(spark, layout)
      val prune = (System.nanoTime() - t3) / 1e6
      val cpBytes = Files.size(Paths.get(
        s"${layout.catalogDir}/_log/" + f"${head}%020d.checkpoint"))
      println(f"[logscale] n=$n%d head=$head%d coldReadMs=$cold%.0f " +
        f"warmReadMs=$warm%.2f liveFiles=${files._1}%d " +
        f"liveListMs=${files._2}%.0f refoldMs=$fold%.0f " +
        f"pruneMs=$prune%.0f (folded=$folded pruned=$pruned) " +
        f"cpMb=${cpBytes / 1e6}%.1f heapDeltaMb=${h1 - h0}%.0f")
    }
    spark.stop()
  }
}
