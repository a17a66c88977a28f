package graft

import org.apache.spark.sql.SparkSession

/** Dev-only (round 14): what does the auto-checkpoint policy COST the
  * writer? 200 one-row appends per table (the sustained SQL-INSERT /
  * streaming-sink shape), one table with `checkpoint.every`=10, one
  * without — per-commit latency distribution, final un-folded tail,
  * and the log-dir entry count a cold reader pays. The policy's price
  * is the inline fold+prune on every ~10th commit; the control's
  * price is a log tail that grows one record per commit forever (the
  * 10⁴-commit cold read `ListCostProbe` scenario A quantifies). */
object AutoCheckpointProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s2 = spark
    import s2.implicits._

    val n = 200
    def run(policy: Boolean): (Seq[Double], Int, Int) = {
      val layout = graft.lake.Layout(
        s"/tmp/auto-cp-probe-$policy-${System.nanoTime()}")
      graft.lake.Catalog.commitLake(spark, layout,
        Seq(("ev", 0L, 0L)).toDF("source", "k", "v"))
      if (policy) graft.lake.Catalog.commitLakeAlter(spark, layout,
        setProps = Seq(graft.lake.Catalog.CheckpointEveryProp -> "10"))
      val times = (1 until n).map { k =>
        val t0 = System.nanoTime()
        graft.lake.Catalog.commitLake(spark, layout,
          Seq(("ev", k.toLong, k * 10L)).toDF("source", "k", "v"))
        (System.nanoTime() - t0) / 1e9
      }
      val d = new java.io.File(s"${layout.catalogDir}/_log")
      val names = d.listFiles().map(_.getName)
      val cp = names.filter(_.endsWith(".checkpoint"))
        .map(_.stripSuffix(".checkpoint").toLong).foldLeft(0L)(math.max)
      val tail = names.count(m => m.endsWith(".commit") &&
        m.stripSuffix(".commit").toLong > cp)
      (times, tail, names.length)
    }

    Seq(false, true).foreach { policy =>
      val (times, tail, entries) = run(policy)
      val sorted = times.sorted
      def pct(p: Double) = sorted((sorted.size * p).toInt.min(sorted.size - 1))
      println(f"[auto-cp] policy=$policy%-5s commits=${times.size} " +
        f"total=${times.sum}%6.1f s p50=${pct(0.5)}%5.3f " +
        f"p90=${pct(0.9)}%5.3f p99=${pct(0.99)}%5.3f " +
        f"max=${sorted.last}%5.3f unFoldedTail=$tail logEntries=$entries")
    }
    spark.stop()
  }
}
