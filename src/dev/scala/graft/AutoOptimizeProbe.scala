package graft

import org.apache.spark.sql.SparkSession

/** Dev-only (round 13): what does the auto-compaction policy COST the
  * writer? 120 one-row appends per table (the sustained streaming-sink
  * shape), one table with `autoOptimize.target` set (minFiles=16), one
  * without — per-commit latency distribution and final live file
  * counts. The policy's price is the inline bin-pack on every ~16th
  * commit; the control's price is the unbounded file growth every
  * reader pays instead. */
object AutoOptimizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s2 = spark
    import s2.implicits._

    val n = 120
    def run(policy: Boolean): (Seq[Double], Int) = {
      val layout = graft.lake.Layout(
        s"/tmp/auto-opt-probe-$policy-${System.nanoTime()}")
      graft.lake.Catalog.commitLake(spark, layout,
        Seq(("ev", 0L, 0L)).toDF("source", "k", "v"))
      if (policy) graft.lake.Catalog.commitLakeAlter(spark, layout,
        setProps = Seq(
          graft.lake.Catalog.AutoOptimizeTargetProp -> (64L << 20).toString,
          graft.lake.Catalog.AutoOptimizeMinFilesProp -> "16"))
      val times = (1 until n).map { k =>
        val t0 = System.nanoTime()
        graft.lake.Catalog.commitLake(spark, layout,
          Seq(("ev", k.toLong, k * 10L)).toDF("source", "k", "v"))
        (System.nanoTime() - t0) / 1e9
      }
      (times, graft.lake.Catalog.lakeFilesAsOf(spark, layout).size)
    }

    Seq(false, true).foreach { policy =>
      val (times, files) = run(policy)
      val sorted = times.sorted
      def pct(p: Double) = sorted((sorted.size * p).toInt.min(sorted.size - 1))
      println(f"[auto-opt] policy=$policy%-5s commits=${times.size} " +
        f"total=${times.sum}%6.1f s p50=${pct(0.5)}%5.3f " +
        f"p90=${pct(0.9)}%5.3f p99=${pct(0.99)}%5.3f " +
        f"max=${sorted.last}%5.3f liveFiles=$files")
    }
    spark.stop()
  }
}
